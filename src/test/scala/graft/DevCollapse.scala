package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the exact-collapse front of the
  * pairwise dedup ops (dev aid). `runMain graft.DevCollapse <sfDir>`.
  */
object DevCollapse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    (1 to 3).foreach { i =>
      // stage 1: the collapse window alone (rep selection + member map)
      time(s"collapse-window run$i") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__dg").orderBy("id")
        docs.select(col("doc_id").as("id"), md5(col("text")).as("__dg"),
            graft.functions.TextHashFunctions.shingle_hashes(col("text"), graft.ext.HashDefs.ShingleN).as("hs"))
          .select(col("id"), col("hs"),
            row_number().over(w).as("__rn"), min("id").over(w).as("rep"))
          .filter(col("__rn") === 1).count()
      }
      // stage 2: the old-style index+pair stage alone, no collapse
      time(s"pairs-only      run$i") {
        val sets = graft.ext.Dedup.docShingleSets(docs, "doc_id", "text")
        val sh = sets.select(col("id"), explode(col("hs")).as("h"))
        sh.as("a").join(sh.as("b"),
            col("a.h") === col("b.h") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("shared")).count()
      }
      // stage 3: the full collapsed ops
      time(s"full-ngram      run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
      }
      time(s"full-containmnt run$i") {
        graft.ext.Dedup.containmentPairs(docs, "doc_id", "text",
          minContainment = 0.6).count()
      }
    }
    spark.stop()
  }
}
