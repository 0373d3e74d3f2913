package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-stage semantics (SURVEY.md §2.3 J4, §3.3). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("zipJoinDeterministic: pairs rows by sort-key rank") {
    val left = Seq((3, "c"), (1, "a"), (2, "b")).toDF("lk", "lv")
    val right = Seq((30, "z"), (10, "x"), (20, "y")).toDF("rk", "rv")
    val out = Merge.zipJoinDeterministic(
      left, Seq(col("lk")), right, Seq(col("rk")),
      limit = Some(2), dropCols = Seq.empty)
    rowSet(out) shouldBe Set(
      Seq(1, "a", 10, "x"),
      Seq(2, "b", 20, "y"))
  }

  test("zipJoinDeterministic: drops requested columns") {
    val left = Seq((1, "u1")).toDF("k", "user_id")
    val right = Seq((10, "v")).toDF("rk", "rv")
    val out = Merge.zipJoinDeterministic(
      left, Seq(col("k")), right, Seq(col("rk")), limit = None)
    out.columns.toSeq shouldBe Seq("k", "rk", "rv")
  }

  test("zipJoinFaithful: row count = min(left, right, limit); index dropped") {
    val left = (1 to 10).map(i => (i, s"l$i")).toDF("k", "user_id")
    val right = (1 to 7).map(i => (i * 10, s"r$i")).toDF("rk", "rv")
    val out = Merge.zipJoinFaithful(left, right, limit = 5)
    out.count() shouldBe 5L
    out.columns.toSeq shouldBe Seq("k", "rk", "rv")
  }

  test("upsertByKey: matched rows replace, unmatched updates insert, rest persist") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val updates = Seq((2, "B"), (4, "D")).toDF("k", "v")
    rowSet(Merge.upsertByKey(base, updates, Seq("k"))) shouldBe
      Set(Seq(1, "a"), Seq(2, "B"), Seq(3, "c"), Seq(4, "D"))
  }

  test("upsertByKey: tieBreak picks the winning update row within a key") {
    val base = Seq((1, "old", 0)).toDF("k", "v", "ts")
    val updates = Seq((1, "early", 5), (1, "late", 9)).toDF("k", "v", "ts")
    rowSet(Merge.upsertByKey(base, updates, Seq("k"),
      tieBreak = Seq(col("ts").desc))) shouldBe Set(Seq(1, "late", 9))
  }

  test("scd2Apply: open rows close at the update, closed periods immutable, newest stays open") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val hist = Seq(
      (1, "old", d("2023-01-01"), Option(d("2024-01-01"))), // closed period
      (1, "cur", d("2024-01-01"), Option.empty[java.sql.Date]), // open
      (2, "cur", d("2024-01-01"), Option.empty[java.sql.Date])) // open, no update
      .toDF("k", "v", "valid_from", "valid_to")
    val upd = Seq((1, "new", d("2024-06-01"))).toDF("k", "v", "eff")
    rowSet(Merge.scd2Apply(hist, upd, Seq("k"), "eff")) shouldBe Set(
      Seq(1, "old", d("2023-01-01"), d("2024-01-01")), // untouched
      Seq(1, "cur", d("2024-01-01"), d("2024-06-01")), // closed by update
      Seq(1, "new", d("2024-06-01"), null),            // new open version
      Seq(2, "cur", d("2024-01-01"), null))            // still open
  }

  test("scd2Apply: multiple updates per key chain in one call") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val hist = Seq((1, "a", d("2024-01-01"), Option.empty[java.sql.Date]))
      .toDF("k", "v", "valid_from", "valid_to")
    val upd = Seq((1, "b", d("2024-02-01")), (1, "c", d("2024-03-01")))
      .toDF("k", "v", "eff")
    rowSet(Merge.scd2Apply(hist, upd, Seq("k"), "eff")) shouldBe Set(
      Seq(1, "a", d("2024-01-01"), d("2024-02-01")),
      Seq(1, "b", d("2024-02-01"), d("2024-03-01")),
      Seq(1, "c", d("2024-03-01"), null))
  }

  test("renameWithPrefix: renames listed columns only, preserves order") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val out = Merge.renameWithPrefix(df, Seq("a", "c"), "Total_")
    out.columns.toSeq shouldBe Seq("Total_a", "b", "Total_c")
    rowList(out) shouldBe Seq(Seq(1, 2, 3))
  }
}
