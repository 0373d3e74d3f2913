package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the NB quality model + winnow index stages
  * (dev aid). `Test/runMain graft.DevNb <sfDir>`.
  */
object DevNb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
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

    Tables(spark, sfDir, "lineitem").count() // warm session

    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    import graft.ext.{Dedup, QualityModel, TextAnalysis}

    (1 to 2).foreach { k =>
      time(s"toks explode+count #$k") {
        docs.select(explode(TextAnalysis.tokens(col("text")))).count()
      }
      time(s"teacherLabel scan #$k") {
        docs.select(QualityModel.teacherLabel(col("text"))).count()
      }
      time(s"nbTermWeights #$k") {
        QualityModel.nbTermWeights(docs, "doc_id", "text").count()
      }
      time(s"nbWeightsMicro collect #$k") {
        QualityModel.nbWeightsMicro(docs, "doc_id", "text").size
      }
      time(s"nbQualityScores #$k") {
        QualityModel.nbQualityScores(docs, "doc_id", "text").count()
      }
      time(s"span_hashes scan #$k") {
        Dedup.spanHashIndex(docs, "doc_id", "text", 8).count()
      }
      time(s"winnow index #$k") {
        Dedup.winnowedSpanHashIndex(docs, "doc_id", "text", 8, 4).count()
      }
    }
    spark.stop()
  }
}
