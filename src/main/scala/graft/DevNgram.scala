package graft

import org.apache.spark.sql.SparkSession

/** Scratch A/B profiler for the n-gram Jaccard DF-1 prune (dev aid,
  * not part of the driver contract). `runMain graft.DevNgram <sfDir>`.
  */
object DevNgram {
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
    docs.count() // scan warm
    // alternate so neither variant benefits from running last
    (1 to 3).foreach { i =>
      time(s"ngram prune=false run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text", pruneDf1 = false).count()
      }
      time(s"ngram prune=true  run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text", pruneDf1 = true).count()
      }
      time(s"minhash full run$i") {
        graft.ext.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
