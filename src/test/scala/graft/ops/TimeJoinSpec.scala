package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of and bucketed range joins on hand-built data. */
class TimeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfBackward: latest preceding right value, inclusive ties, null before first") {
    val left = Seq(
      ("u1", ts("2022-01-01 09:00:00"), 1L),  // before any quote → null
      ("u1", ts("2022-01-01 10:00:00"), 2L),  // == quote ts → inclusive match
      ("u1", ts("2022-01-01 11:30:00"), 3L),  // after 2nd quote
      ("u2", ts("2022-01-01 12:00:00"), 4L)   // other key, no quotes → null
    ).toDF("k", "t", "event_id")
    val right = Seq(
      ("u1", ts("2022-01-01 10:00:00"), 100.0),
      ("u1", ts("2022-01-01 11:00:00"), 200.0)
    ).toDF("k", "t", "quote")
    val out = AsOfJoin.asOfBackward(left, right,
      keyCols = Seq("k"), leftTs = "t", rightTs = "t", rightCols = Seq("quote"))
    rowSet(out.select("k", "event_id", "quote")) shouldBe Set(
      Seq("u1", 1L, null),
      Seq("u1", 2L, 100.0),
      Seq("u1", 3L, 200.0),
      Seq("u2", 4L, null))
  }

  test("asOfBackward: carries multiple right columns") {
    val left = Seq(("k", 10L, "evt")).toDF("k", "t", "tag")
    val right = Seq(("k", 5L, 1.5, "r1")).toDF("k", "t", "price", "src")
    val out = AsOfJoin.asOfBackward(left, right,
      Seq("k"), "t", "t", Seq("price", "src"))
    rowList(out.select("k", "tag", "price", "src")) shouldBe
      Seq(Seq("k", "evt", 1.5, "r1"))
  }

  test("rangeJoin ≡ naive between-join, intervals spanning buckets") {
    val points = (0L to 100L).map(v => (v, s"p$v")).toDF("v", "pid")
    val intervals = Seq(
      (0L, 4L, "tiny"),       // inside one bucket
      (10L, 39L, "wide"),     // spans 3 buckets (width 10)
      (95L, 200L, "tail"),    // extends past the data
      (50L, 50L, "point")     // single-value interval
    ).toDF("lo", "hi", "name")
    val got = RangeJoin.rangeJoin(points, intervals,
      keyCols = Seq.empty, pointCol = "v", startCol = "lo", endCol = "hi",
      bucketWidth = 10L)
    val want = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
    rowSet(got.select("v", "name")) shouldBe rowSet(want.select("v", "name"))
    got.count() shouldBe (5L + 30L + 6L + 1L)
  }

  test("rangeJoin with keys: only same-key intervals match") {
    val points = Seq(("a", 5L), ("b", 5L)).toDF("k", "v")
    val intervals = Seq(("a", 0L, 10L, "ia")).toDF("k", "lo", "hi", "name")
    val out = RangeJoin.rangeJoin(points, intervals,
      keyCols = Seq("k"), pointCol = "v", startCol = "lo", endCol = "hi",
      bucketWidth = 4L)
    rowList(out.select("k", "v", "name")) shouldBe Seq(Seq("a", 5L, "ia"))
  }
}
