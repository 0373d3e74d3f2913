package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B profiler for the n-gram Jaccard hot-shingle triangle
  * split (dev aid, not part of the driver contract).
  * `runMain graft.DevNgram <sfDir>` — times the plain self-join
  * (hotDf = MaxValue disables the split) against the triangle path on
  * both the natural corpus and a 20%-hot-text skewed twin.
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
    val hotText =
      "the quick brown fox jumps over the lazy dog again and again in every duplicated document body"
    val skewed = docs.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0, lit(hotText)).otherwise(col("text")))
    docs.count(); skewed.count() // scan warm
    // alternate so neither variant benefits from running last
    (1 to 3).foreach { i =>
      time(s"base  probe    run$i") {
        docs.select(md5(col("text")).as("__dg"))
          .groupBy("__dg").agg(count(lit(1)).as("k"))
          .agg(count(lit(1)), sum("k"), max("k")).count()
      }
      time(s"base  never    run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          mode = graft.ext.Dedup.CollapseMode.Never).count()
      }
      time(s"base  plain    run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          hotDf = Int.MaxValue).count()
      }
      time(s"base  triangle run$i") {
        graft.ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count()
      }
      time(s"skew  plain    run$i") {
        graft.ext.Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
          hotDf = Int.MaxValue).count()
      }
      time(s"skew  triangle run$i") {
        graft.ext.Dedup.ngramJaccardPairs(skewed, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
