package graft.ext

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch profiler for qualityScore's components (dev aid).
  * `Test/runMain graft.ext.DevQuality <sfDir> <cpus>`
  */
object DevQuality {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-scale/f10")
    val cpus = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(cpus, "graft-dev-quality")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 3).foreach { i =>
      t(s"len            run$i") { docs.select(least(length(col("text")).cast("double") / 500.0, lit(1.0)).as("x")).agg(avg("x")).head() }
      t(s"punct-regex    run$i") { docs.select(TextAnalysis.punctRatio(col("text")).as("x")).agg(avg("x")).head() }
      t(s"stopword       run$i") { docs.select(TextAnalysis.stopwordRatio(col("text")).as("x")).agg(avg("x")).head() }
      t(s"quality-full   run$i") { docs.select(TextAnalysis.qualityScore(col("text")).as("x")).agg(avg("x")).head() }
    }
    spark.stop()
  }
}
