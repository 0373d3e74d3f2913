package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler for the MinHash pipeline (dev aid).
  * `runMain graft.DevMinhash <sfDir>`.
  */
object DevMinhash {
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

    import graft.ext.Dedup
    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    // uncached variant of minhashDedupPairs for A/B
    def minhashNoCache(df: DataFrame): DataFrame = {
      val sets = Dedup.docShingleSets(df, "doc_id", "text")
      val sig = Dedup.minhashSignature(sets)
      val candidates = Dedup.lshCandidatePairs(Dedup.lshBands(sig))
      candidates
    }

    (1 to 3).foreach { i =>
      time(s"stage sets+sig only run$i") {
        Dedup.minhashSignature(Dedup.docShingleSets(docs, "doc_id", "text")).count()
      }
      time(s"stage bands run$i") {
        Dedup.lshBands(Dedup.minhashSignature(
          Dedup.docShingleSets(docs, "doc_id", "text"))).count()
      }
      time(s"stage candidates run$i") {
        minhashNoCache(docs).count()
      }
      time(s"full (cached sets) run$i") {
        Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
