package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("movingAgg: trailing time-range frame, boundary inclusive, peers share frames") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), 4.0),  // 10:00 still in frame (inclusive)
      (1L, ts("2024-01-01 12:30:00"), 8.0),  // everything else aged out
      // equal-ts peers: both see both (RANGE, not ROWS)
      (2L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.movingAgg(ev, col("user_id"), col("ts"), col("value"), 3600L)
      .select("user_id", "ts", "moving_sum", "moving_n")
      .orderBy("user_id", "ts", "moving_sum")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toList
    out shouldBe List(
      (1L, 1.0, 1L), (1L, 3.0, 2L), (1L, 7.0, 3L), (1L, 8.0, 1L),
      (2L, 3.0, 2L), (2L, 3.0, 2L))
  }

  test("debounce: gap to previous raw event, chain of bursts collapses to the first") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:01:00"), 2L), // 60s after #1 → dropped
      (1L, ts("2024-01-01 10:02:00"), 3L), // 60s after #2 (raw) → dropped too
      (1L, ts("2024-01-01 10:10:00"), 4L), // 8 min after #3 → kept
      (2L, ts("2024-01-01 10:00:00"), 5L)
    ).toDF("user_id", "ts", "event_id")
    val kept = TimeSeries.debounce(ev, col("user_id"), col("ts"), col("event_id"), 300L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 4L, 5L)
    // exact boundary: gap == minGap is kept
    val edge = Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:05:00"), 2L)).toDF("user_id", "ts", "event_id")
    TimeSeries.debounce(edge, col("user_id"), col("ts"), col("event_id"), 300L)
      .count() shouldBe 2L
  }
}
