package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DevNb5 {
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
    def fresh() = docs.select(QualityModel.teacherLabel(col("text")).as("y"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(sum(col("y")).as("c1"))
    def freshLen() = docs.select((length(col("text")) >= 200).cast("int").as("y"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(sum(col("y")).as("c1"))
    (1 to 3).foreach { k =>
      time(s"plan only #$k") { fresh().queryExecution.executedPlan.toString.length }
      time(s"exec after plan #$k") { fresh().collect().length }
      time(s"no-lambda label collect #$k") { freshLen().collect().length }
    }
    spark.stop()
  }
}
