package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevNb3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    Tables(spark, sfDir, "lineitem").count()
    val docs = Tables(spark, sfDir, "documents")
    docs.count()
    import graft.ext.{QualityModel, TextAnalysis}
    val toks = docs.select(QualityModel.teacherLabel(col("text")).as("y"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val tstats = toks.groupBy("term").agg(
      sum(col("y")).as("c1"), sum(lit(1) - col("y")).as("c0"))
    val stats = tstats.agg(sum("c1").as("t1"), sum("c0").as("t0"), count(lit(1)).as("v"))
    val w = tstats.crossJoin(broadcast(stats)).select(col("term"),
      round((log10((col("c1") + 1).cast("double") / (col("t1") + col("v")).cast("double")) -
        log10((col("c0") + 1).cast("double") / (col("t0") + col("v")).cast("double"))) * lit(1000000.0), 0)
        .cast("long").as("llr_micro"))
    (1 to 3).foreach { k =>
      time(s"w.count #$k") { w.count() }
      time(s"w.collect #$k") { w.collect().length }
      time(s"nbWeightsMicro #$k") { QualityModel.nbWeightsMicro(docs, "doc_id", "text").size }
    }
    spark.stop()
  }
}
