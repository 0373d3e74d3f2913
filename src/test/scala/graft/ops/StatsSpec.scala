package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("corrBy: perfect and inverse correlation exact; agrees with built-in corr") {
    val df = Seq(
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),     // y = 2x → 1
      ("b", 1.0, 3.0), ("b", 2.0, 2.0), ("b", 3.0, 1.0),     // y = -x → -1
      ("c", 1.0, 1.3), ("c", 2.0, 0.9), ("c", 3.0, 2.7), ("c", 4.0, 1.1)
    ).toDF("g", "x", "y")
    val out = Stats.corrBy(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    out("a") shouldBe 1.0
    out("b") shouldBe -1.0
    val builtin = df.filter($"g" === "c").agg(corr("x", "y")).head().getDouble(0)
    out("c") shouldBe (builtin +- 1e-6)
  }

  test("corrBy: zero variance → null; layout-independent") {
    val df = Seq(("a", 5.0, 1.0), ("a", 5.0, 2.0), ("a", 5.0, 3.0))
      .toDF("g", "x", "y")
    Stats.corrBy(df, Seq("g"), col("x"), col("y"))
      .head().isNullAt(2) shouldBe true
    val big = (1 to 500).map(i => ("g", i * 0.37, math.sin(i))).toDF("g", "x", "y")
    val a = Stats.corrBy(big, Seq("g"), col("x"), col("y")).head().getDouble(2)
    val b = Stats.corrBy(big.repartition(13), Seq("g"), col("x"), col("y"))
      .head().getDouble(2)
    a shouldBe b // bit-identical, not just close: exact moments
  }

  test("linearFitBy: exact fit on a perfect line, residual case vs closed form") {
    val df = Seq(("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0))
      .toDF("g", "x", "y") // y = 2x + 1
    val r = Stats.linearFitBy(df, Seq("g"), col("x"), col("y")).head()
    r.getDouble(2) shouldBe 2.0
    r.getDouble(3) shouldBe 1.0
  }

  test("minMaxNormalizeBy: per-group scaling, degenerate group → null") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 15.0),
      ("b", 4L, 7.0), ("b", 5L, 7.0)).toDF("g", "id", "x")
    val out = Stats.minMaxNormalizeBy(df, Seq("g"), col("x"), "x")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    out(1L) shouldBe Some(0.0)
    out(2L) shouldBe Some(1.0)
    out(3L) shouldBe Some(0.5)
    out(4L) shouldBe None // constant group has no scale
    out(5L) shouldBe None
  }

  test("moments: a half-null row contributes to nothing (no biased n)") {
    // (x, null) rows must not inflate n: corr over the 3 complete
    // rows of a perfect line is exactly 1, and stddev over {2,4}
    // with a null mixed in is exactly 1
    val df = Seq(("a", Some(1.0), Some(2.0)), ("a", Some(2.0), Some(4.0)),
      ("a", Some(3.0), Some(6.0)), ("a", Some(9.0), None), ("a", None, Some(9.0)))
      .toDF("g", "x", "y")
    val r = Stats.corrBy(df, Seq("g"), col("x"), col("y")).head()
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe 1.0
    val s = Stats.stddevPopBy(
      Seq(("a", Some(2.0)), ("a", Some(4.0)), ("a", None)).toDF("g", "x"),
      Seq("g"), col("x")).head()
    s.getLong(1) shouldBe 2L
    s.getDouble(2) shouldBe 1.0
  }

  test("minMaxNormalizeBy: null group key rows survive with their own stats") {
    val df = Seq((Some("a"), 1L, 10.0), (Some("a"), 2L, 20.0),
      (None, 3L, 5.0), (None, 4L, 15.0)).toDF("g", "id", "x")
    val out = Stats.minMaxNormalizeBy(df, Seq("g"), col("x"), "x")
    out.count() shouldBe 4 // the null-key rows are not dropped
    val byId = out.collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    byId(3L) shouldBe 0.0
    byId(4L) shouldBe 1.0
  }

  test("stddevPopBy agrees with built-in stddev_pop") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 4.0), ("a", 4.0),
      ("a", 5.0), ("a", 5.0), ("a", 7.0), ("a", 9.0)).toDF("g", "x")
    val exact = Stats.stddevPopBy(df, Seq("g"), col("x")).head().getDouble(2)
    exact shouldBe 2.0 // the classic example: σ = 2
    val builtin = df.agg(stddev_pop("x")).head().getDouble(0)
    exact shouldBe (builtin +- 1e-6)
  }
}
