package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Snapshot diff (incremental-ingest bookkeeping) and distribution
  * drift (PSI) — the between-snapshots monitors.
  */
class SnapshotDriftSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) =
    rows.toDF("id", "text")

  test("diff: added/removed/changed/unchanged classification") {
    val prev = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val cur = snap(2L -> "b", 3L -> "c2", 4L -> "d")
    rowSet(Snapshot.diff(prev, cur, "id", Seq("text"))) shouldBe Set(
      Seq(1L, "removed"), Seq(2L, "unchanged"),
      Seq(3L, "changed"), Seq(4L, "added"))
  }

  test("diff: null payload is distinct from empty string and from absence") {
    val prev = Seq((1L, Some("x")), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("id", "text")
    val cur = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "text")
    rowSet(Snapshot.diff(prev, cur, "id", Seq("text"))) shouldBe Set(
      Seq(1L, "changed"),   // value → NULL
      Seq(2L, "changed"),   // empty string → NULL: still a change
      Seq(3L, "unchanged")) // NULL → NULL
  }

  test("diff: multi-column payload — column boundary shifts are changes") {
    // ("ab","c") vs ("a","bc") must NOT collide (separator guards it)
    val prev = Seq((1L, "ab", "c")).toDF("id", "t1", "t2")
    val cur = Seq((1L, "a", "bc")).toDF("id", "t1", "t2")
    rowSet(Snapshot.diff(prev, cur, "id", Seq("t1", "t2"))) shouldBe Set(
      Seq(1L, "changed"))
  }

  test("changedOrAdded: exactly the added ∪ changed slice, payload intact") {
    val prev = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val cur = snap(2L -> "b", 3L -> "c2", 4L -> "d")
    rowSet(Snapshot.changedOrAdded(prev, cur, "id", Seq("text"))) shouldBe Set(
      Seq(3L, "c2"), Seq(4L, "d"))
    // consistency with diff's classification
    val fromDiff = rowSet(Snapshot.diff(prev, cur, "id", Seq("text"))
      .filter(col("status").isin("added", "changed")).select("id"))
    rowSet(Snapshot.changedOrAdded(prev, cur, "id", Seq("text"))
      .select("id")) shouldBe fromDiff
  }

  test("psiNumeric: identical slices → all psi terms zero") {
    val d = (1L to 200L).map(i => (i, i % 40 * 10)).toDF("id", "v")
    val out = Drift.psiNumeric(d, d, "v", width = 100, nBuckets = 4)
    out.filter(col("psi_term") =!= 0.0).count() shouldBe 0L
    out.filter(col("p_ref") =!= col("p_cur")).count() shouldBe 0L
  }

  test("psiNumeric: planted shift shows up in the shifted buckets, PSI positive") {
    val ref = (1L to 1000L).map(i => (i, (i % 10) * 10)).toDF("id", "v")   // uniform 0-90
    val cur = (1L to 1000L).map(i => (i, (i % 5) * 10)).toDF("id", "v")    // mass at 0-40
    val out = Drift.psiNumeric(ref, cur, "v", width = 50, nBuckets = 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    // bucket 1 (50-90) emptied out in cur, bucket 0 doubled: both terms positive
    out(0) should be > 0.0
    out(1) should be > 0.0
    // bucket 1 went 0.5 → ~0: its term dominates
    out(1) should be > out(0)
  }

  test("psiNumeric: bucket empty on one side stays finite (eps floor)") {
    val ref = Seq((1L, 10L), (2L, 210L)).toDF("id", "v")
    val cur = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    val out = Drift.psiNumeric(ref, cur, "v", width = 100, nBuckets = 4)
    out.filter(col("psi_term").isNull || isnan(col("psi_term")))
      .count() shouldBe 0L
    // the vanished bucket contributes the largest term
    val terms = out.orderBy(desc("psi_term")).collect()
    terms.head.getInt(0) shouldBe 2 // bucket 200-299: present in ref only
  }

  test("psiCategorical: new category on the current side is captured") {
    val ref = Seq((1L, "en"), (2L, "en"), (3L, "de")).toDF("id", "lang")
    val cur = Seq((1L, "en"), (2L, "fr"), (3L, "de")).toDF("id", "lang")
    val out = Drift.psiCategorical(ref, cur, "lang")
    rowSet(out.select("category")) shouldBe Set(Seq("en"), Seq("de"), Seq("fr"))
    out.filter(col("category") === "fr" && col("cnt_ref") === 0)
      .count() shouldBe 1L
    out.filter(col("category") === "de").select("psi_term")
      .collect().head.getDouble(0) shouldBe 0.0
  }

  test("drift report plans: corpus scanned once per side, histogram-sized shuffle") {
    val d = (1L to 500L).map(i => (i, i)).toDF("id", "v")
    val plan = Drift.psiNumeric(d, d, "v", width = 100, nBuckets = 8)
      .queryExecution.executedPlan.toString
    // partial aggregation before the exchange: the shuffle carries
    // bucket counts, not rows
    plan should include("partial_count")
  }
}
