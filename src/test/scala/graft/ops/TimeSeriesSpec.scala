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

  test("gapFill: densifies per-key day span, carries last observed value, flags fills") {
    val ev = Seq(
      // key "a": days 1, 4 observed -> 2,3 filled with day-1's sum
      ("a", ts("2024-01-01 09:00:00"), 1.0),
      ("a", ts("2024-01-01 15:00:00"), 2.0), // same day, sums to 3.0
      ("a", ts("2024-01-04 10:00:00"), 8.0),
      // key "b": single day -> no fills
      ("b", ts("2024-02-10 10:00:00"), 5.0)
    ).toDF("k", "ts", "value")
    val out = TimeSeries.gapFill(ev, "k", col("ts"), col("value"))
      .orderBy("k", "day")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getBoolean(3))).toList
    out shouldBe List(
      ("a", "2024-01-01", 3.0, false),
      ("a", "2024-01-02", 3.0, true),
      ("a", "2024-01-03", 3.0, true),
      ("a", "2024-01-04", 8.0, false),
      ("b", "2024-02-10", 5.0, false))
  }

  test("volumeAnomaly: trailing-7 z-score; null until full baseline and on zero variance") {
    // key "a": 7 baseline days with counts 7,13,10,10,10,10,10 then a
    // 20-count spike; key "b": constant 5s → zero variance → z null
    val counts = Map(1 -> 7, 2 -> 13, 3 -> 10, 4 -> 10, 5 -> 10, 6 -> 10,
      7 -> 10, 8 -> 20)
    val rows =
      counts.toSeq.flatMap { case (d, c) =>
        Seq.fill(c)(("a", ts(f"2024-01-$d%02d 10:00:00"))) } ++
      (1 to 8).flatMap(d => Seq.fill(5)(("b", ts(f"2024-01-$d%02d 10:00:00"))))
    val out = TimeSeries.volumeAnomaly(rows.toDF("event_type", "ts"),
      "event_type", col("ts"), trailing = 7)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // days 1..7 have no full baseline → null
    (1 to 7).foreach(d => out(("a", f"2024-01-$d%02d")) shouldBe None)
    val (sx, sxx) = (70.0, 49.0 + 169.0 + 5 * 100.0)
    val expect = (20.0 - sx / 7.0) / (math.sqrt(7.0 * sxx - sx * sx) / 7.0)
    out(("a", "2024-01-08")).get shouldBe (expect +- 1e-6)
    out(("b", "2024-01-08")) shouldBe None // zero-variance baseline
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
