package graft

import org.apache.spark.sql.functions._

/** Dev aid (r19 skew re-measure): output sizes of the ngram skew pair. */
object DevSkewCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(16, "skewcheck")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val hotText = "the quick brown fox jumps over the lazy dog again and " +
      "again in every duplicated document body"
    val base = Tables(spark, dir, "documents")
    val skew = base.withColumn("text",
      when(pmod(col("doc_id"), lit(5)) === 0, lit(hotText))
        .otherwise(col("text")))
    println("BASE_PAIRS=" +
      graft.ext.Dedup.ngramJaccardPairs(base, "doc_id", "text").count())
    println("SKEW_PAIRS=" +
      graft.ext.Dedup.ngramJaccardPairs(skew, "doc_id", "text").count())
    spark.stop()
  }
}
