package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Single-pass data-quality report semantics. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("report: one row per rule, measured values and verdicts correct") {
    val df = Seq(
      (1, Option("a"), 5.0),
      (2, Option("a"), 50.0),
      (3, Option.empty[String], 500.0)).toDF("id", "s", "v")
    val out = Quality.report(df, Seq(
      Quality.Rule("id_unique", Quality.uniqueness(col("id")), _ >= 1.0),
      Quality.Rule("s_complete", Quality.completeness(col("s")), _ >= 1.0),
      Quality.Rule("v_in_0_100", Quality.inRangeRatio(col("v"), 0.0, 100.0), _ >= 1.0),
      Quality.Rule("s_in_set", Quality.inSetRatio(col("s"), Seq("a")), _ >= 0.5)))
    rowList(out.orderBy("rule")) shouldBe Seq(
      Seq("id_unique", 1.0, true),
      Seq("s_complete", 0.666667, false),
      Seq("s_in_set", 0.666667, true),
      Seq("v_in_0_100", 0.666667, false))
  }

  test("report runs as ONE aggregation (single scan, no per-rule jobs)") {
    val df = Seq((1, 2.0), (2, 3.0)).toDF("id", "v")
    val out = Quality.report(df, Seq(
      Quality.Rule("a", Quality.uniqueness(col("id")), _ >= 1.0),
      Quality.Rule("b", Quality.inRangeRatio(col("v"), 0.0, 10.0), _ >= 1.0)))
    val scans = out.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    scans shouldBe 1 // one source scan feeding every rule
  }
}
