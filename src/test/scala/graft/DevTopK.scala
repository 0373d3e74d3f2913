package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch timing for top-k-per-group variants (dev aid). */
object DevTopK {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, sfDir, "lineitem")
    li.count() // warm scan

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[topk] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }

    val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
      col("l_linenumber").asc)

    println(s"[topk] input partitions: ${li.rdd.getNumPartitions}")
    time("plain window") {
      val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
      li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3).count()
    }
    time("prune+window") {
      graft.ops.TopK.topKPerGroup(li, Seq("l_returnflag"), order, 3).count()
    }
    val li32 = li.repartition(32).cache()
    li32.count()
    time("plain window (32-part input)") {
      val w = Window.partitionBy("l_returnflag").orderBy(order: _*)
      li32.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3).count()
    }
    time("prune+window (32-part input)") {
      graft.ops.TopK.topKPerGroup(li32, Seq("l_returnflag"), order, 3).count()
    }
    spark.stop()
  }
}
