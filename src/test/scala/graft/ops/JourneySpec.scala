package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JourneySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: strict ordering — out-of-order and equal-ts events don't chain") {
    val ev = Seq(
      // u1 completes all three, with a decoy earlier view BEFORE signup
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: purchase before view → stops at view
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 10:30:00"), "purchase"),
      (2L, ts("2024-01-02 11:00:00"), "view"),
      // u3: view at EXACTLY signup's ts → strict > blocks step 2
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:00:00"), "view"),
      // u4: never signs up → counts nowhere
      (4L, ts("2024-01-04 10:00:00"), "view"),
      (4L, ts("2024-01-04 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val out = Journey.funnel(ev, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "view", "purchase")).collect()
    out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      Seq((0, "signup", 3L), (1, "view", 2L), (2, "purchase", 1L))
    // delays: step0 total 0; view = u1 1h + u2 1h = 7200s; purchase = u1 1h
    out.map(_.getLong(3)).toSeq shouldBe Seq(0L, 7200L * 1000000, 3600L * 1000000)
  }

  test("funnel: greedy earliest chain matches sequential-min semantics") {
    // two signups: chain must hang off the FIRST one; the view between
    // them converts (it is after signup #1)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:30:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "signup")
    ).toDF("user_id", "ts", "event_type")
    val out = Journey.funnel(ev, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "view")).collect()
    out.map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq shouldBe
      Seq((0, 1L, 0L), (1, 1L, 1800L * 1000000))
  }

  test("funnel: maxStepGapSec bounds each step; boundary inclusive; late events don't consume slots") {
    val ev = Seq(
      // u1: view in window (2h), purchase out of window (7h after view)
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 12:00:00"), "view"),
      (1L, ts("2024-01-01 19:00:00"), "purchase"),
      // u2: first view out of window; the second too → no conversion,
      // and the early out-of-window view must not block the re-test
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-01 16:30:00"), "view"),
      (2L, ts("2024-01-01 17:30:00"), "view"),
      // u3: view at EXACTLY +6h → inclusive bound keeps it
      (3L, ts("2024-01-01 10:00:00"), "signup"),
      (3L, ts("2024-01-01 16:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Journey.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("signup", "view", "purchase"), maxStepGapSec = Some(21600L))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toList
    out shouldBe List((0, 3L), (1, 2L), (2, 0L))
  }

  test("funnel: layout-independent") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    val a = Journey.funnel(ev, col("user_id"), col("ts"), col("event_type"),
      Seq("signup", "view", "purchase"))
    val b = Journey.funnel(ev.repartition(7), col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view", "purchase"))
    rowSet(a) shouldBe rowSet(b)
  }

  test("transitionMatrix: consecutive pairs per user, shares per source") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 11:00:00"), "b", 2L),
      (1L, ts("2024-01-01 12:00:00"), "a", 3L),
      (2L, ts("2024-01-01 10:00:00"), "a", 4L),
      (2L, ts("2024-01-01 11:00:00"), "a", 5L)
      // last event per user has no successor → no row
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Journey.transitionMatrix(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toList
    // from a: a→b (u1), a→a (u2) → shares 0.5/0.5; from b: b→a (u1) → 1.0
    out shouldBe List(("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "a", 1L, 1.0))
  }

  test("cohortRetention: cohorts by first week, offsets and shares") {
    val ev = Seq(
      // cohort 2024-01-01 (Mon): u1 active wk0+wk1, u2 only wk0
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-10 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      // cohort 2024-01-08: u3 active wk0 and wk2 (skips wk1)
      (3L, ts("2024-01-08 10:00:00")), (3L, ts("2024-01-22 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Journey.cohortRetention(ev, col("user_id"), col("ts"))
      .select("cohort", "week_offset", "n_active", "cohort_size", "retention")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    out shouldBe Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 1, 1L, 2L, 0.5),
      ("2024-01-08", 0, 1L, 1L, 1.0),
      ("2024-01-08", 2, 1L, 1L, 1.0))
  }

  test("topPaths: gap break splits sessions, maxLen truncates, ties break by path") {
    val ev = Seq(
      // u1 session 1: view > click; then a 31-min gap starts session 2: view
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:36:00"), 3L, "view"),
      // u2 one session: view > click (29-min gap does NOT break)
      (2L, ts("2024-01-02 10:00:00"), 4L, "view"),
      (2L, ts("2024-01-02 10:29:00"), 5L, "click"),
      // u3: equal-ts events ordered by event_id
      (3L, ts("2024-01-03 10:00:00"), 7L, "b"),
      (3L, ts("2024-01-03 10:00:00"), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Journey.topPaths(ev, col("user_id"), col("ts"),
        col("event_type"), col("event_id"), maxLen = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    out shouldBe List(("view>click", 2L), ("a>b", 1L), ("view", 1L))

    // maxLen truncation: 3-event session keeps its first 2 types
    val long = Seq(
      (9L, ts("2024-01-01 10:00:00"), 1L, "x"),
      (9L, ts("2024-01-01 10:01:00"), 2L, "y"),
      (9L, ts("2024-01-01 10:02:00"), 3L, "z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    Journey.topPaths(long, col("user_id"), col("ts"), col("event_type"),
        col("event_id"), maxLen = 2, topK = 10)
      .collect().map(_.getString(0)).toList shouldBe List("x>y")
  }
}
