package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B profiler for [[graft.ext.Dedup.nearDupClusters]] init variants
  * (dev aid, not part of the driver contract).
  * `runMain graft.DevClusters <sfDir>`.
  */
object DevClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    Tables(spark, sfDir, "lineitem").count() // warmup
    val docs = Tables(spark, sfDir, "documents")
    def run(initMin: Boolean): Long = {
      val n = graft.ext.Dedup.nearDupClusters(
        docs.select(col("doc_id").as("id")),
        graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text")
          .select("id_a", "id_b"),
        64, initMin, localEdgeCap = 0).count()
      spark.sharedState.cacheManager.clearCache()
      n
    }
    time("pairs only") {
      graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
    }
    (1 to 3).foreach { i =>
      time(s"clusters initMin=true  run$i")(run(initMin = true))
      time(s"clusters initMin=false run$i")(run(initMin = false))
    }
    spark.stop()
  }
}
