package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevNb6 {
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
    val toks = docs.select(col("doc_id").as("id"),
      QualityModel.teacherLabel(col("text")).as("y"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    val toksNoY = docs.select(col("doc_id").as("id"),
      explode(TextAnalysis.tokens(col("text"))).as("term"))
    (1 to 2).foreach { k =>
      time(s"gb(id) with y in proj #$k") { toks.groupBy("id").agg(count(lit(1))).count() }
      time(s"gb(id,y) #$k") { toks.groupBy("id", "y").agg(count(lit(1))).count() }
      time(s"gb(y) #$k") { toks.groupBy("y").agg(count(lit(1))).count() }
      time(s"gb(id) no y #$k") { toksNoY.groupBy("id").agg(count(lit(1))).count() }
      time(s"select y per-token count #$k") { toks.select("y").count() }
      time(s"sum(y) global #$k") { toks.agg(sum("y")).count() }
    }
    spark.stop()
  }
}
