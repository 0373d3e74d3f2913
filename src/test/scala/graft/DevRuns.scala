package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B profiler for [[graft.ext.Dedup.crossDocSpanRuns]] (dev aid):
  * single-groupBy row-local islands walk (current) vs the original
  * window-function islands pass, interleaved reps under the bench's
  * CPU profile. `runMain graft.DevRuns <sfDir> [cpus]`.
  */
object DevRuns {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local(cpus, "dev-runs")
    spark.sparkContext.setLogLevel("ERROR")

    def med(xs: List[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = Tables(spark, sfDir, "documents")
    docs.count()

    // original formulation: distinct -> window islands -> two groupBys
    def runsWindowed(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val idx = graft.ext.Dedup.spanHashIndex(df, "doc_id", "text", 8)
      val co = graft.ext.Dedup.coOccurringPairsForDev(idx)
        .select("id_a", "id_b", "pos_a", "pos_b").distinct()
      val diff = col("pos_b") - col("pos_a")
      val w = Window.partitionBy(col("id_a"), col("id_b"), diff)
        .orderBy(col("pos_a"))
      co.withColumn("__island", col("pos_a") - row_number().over(w))
        .groupBy(col("id_a"), col("id_b"), diff.as("__diff"), col("__island"))
        .agg(count(lit(1)).as("__len"))
        .groupBy("id_a", "id_b")
        .agg((max(col("__len")) + lit(7)).as("max_run_words"))
        .filter(col("max_run_words") >= 10)
    }
    def runsNew(df: DataFrame): DataFrame =
      graft.ext.Dedup.crossDocSpanRuns(df, "doc_id", "text", 8, 10)

    // warm both
    runsWindowed(docs).count(); runsNew(docs).count()
    val (a, b) = (collection.mutable.ListBuffer[Double](),
      collection.mutable.ListBuffer[Double]())
    (1 to 5).foreach { _ =>
      a += time(runsWindowed(docs).count())
      b += time(runsNew(docs).count())
    }
    println(f"[runs] windowed: med=${med(a.toList)}%.2f  ${a.map(x => f"$x%.2f").mkString(" ")}")
    println(f"[runs] grouped : med=${med(b.toList)}%.2f  ${b.map(x => f"$x%.2f").mkString(" ")}")
    spark.stop()
  }
}
