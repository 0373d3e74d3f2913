package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interaction-branch operator semantics (SURVEY.md §2.2-§2.4, §5 #2):
  * bucket boundaries, junk filters, pivot fill, missing-otherwise
  * argmax, null-skipping taste string, quirky segmentation boundaries.
  */
class InteractionSpec extends SparkSpec {
  import spark.implicits._

  test("activenessBucket: boundary values land in the reference buckets") {
    val df = Seq(0, 1, 7, 8, 14, 15, 21, 22, 28, 29, 31, 32, 100)
      .toDF("d")
      .select(col("d"), Interaction.activenessBucket(col("d")).as("b"))
    rowSet(df) shouldBe Set(
      Seq(0, "error"), Seq(1, "very low"), Seq(7, "very low"),
      Seq(8, "low"), Seq(14, "low"), Seq(15, "moderate"),
      Seq(21, "moderate"), Seq(22, "high"), Seq(28, "high"),
      Seq(29, "very high"), Seq(31, "very high"), Seq(32, "error"),
      Seq(100, "error"))
  }

  test("totalDevices: distinct devices per contract") {
    val df = Seq(
      ("c1", "m1"), ("c1", "m1"), ("c1", "m2"),
      ("c2", "m1")).toDF("Contract", "Mac")
    rowSet(Interaction.totalDevices(df)) shouldBe
      Set(Seq("c1", 2L), Seq("c2", 1L))
  }

  test("totalDevicesApprox: HLL++ matches exact at low cardinality") {
    val df = (1 to 20).flatMap(d => Seq(("c1", s"m$d"), ("c2", s"m${d % 3}")))
      .toDF("Contract", "Mac")
    rowSet(Interaction.totalDevicesApprox(df)) shouldBe
      rowSet(Interaction.totalDevices(df))
  }

  test("deviceSketches + mergeDeviceSketches: mergeable sketches match exact") {
    val df = Seq(
      ("c1", "m1", "d1"), ("c1", "m2", "d1"), ("c1", "m1", "d2"),
      ("c1", "m3", "d2"), ("c2", "m1", "d1"), ("c2", "m1", "d2")
    ).toDF("Contract", "Mac", "day")
    val sketches = Interaction.deviceSketches(df, grain = col("day"))
    sketches.count() shouldBe 4 // one sketch per (contract, day)
    val merged = Interaction.mergeDeviceSketches(sketches)
    rowSet(merged) shouldBe Set(Seq("c1", 3L), Seq("c2", 1L))
  }

  test("activeness: >31 distinct days filtered as error") {
    val manyDays = (1 to 40).map(d => ("c_err", f"2022-02-$d%02d")) // fake distinct strings
    val ok = Seq(("c_ok", "2022-04-01"), ("c_ok", "2022-04-02"), ("c_ok", "2022-04-01"))
    val df = (manyDays ++ ok).toDF("Contract", "Date")
    rowSet(Interaction.activeness(df)) shouldBe Set(Seq("c_ok", "very low"))
  }

  test("transformCategory: recode, junk contract and unknown app dropped") {
    val df = Seq(
      ("0", "CHANNEL", 10L),   // junk contract sentinel → dropped
      ("c1", "CHANNEL", 10L),  // → Truyen_hinh
      ("c1", "KPLUS", 5L),     // → Truyen_hinh (N:1 recode)
      ("c1", "BOGUS", 7L),     // unknown app → error → dropped
      ("c2", "RELAX", 3L)      // → Giai_tri
    ).toDF("Contract", "AppName", "TotalDuration")
    rowSet(Interaction.transformCategory(df)) shouldBe Set(
      Seq("c1", "Truyen_hinh", 10L),
      Seq("c1", "Truyen_hinh", 5L),
      Seq("c2", "Giai_tri", 3L))
  }

  test("statistics: pivot sums per category, missing cells filled 0") {
    val df = Seq(
      ("c1", "A", 10L), ("c1", "A", 5L), ("c1", "B", 2L),
      ("c2", "B", 7L)).toDF("Contract", "Type", "TotalDuration")
    val out = Interaction.statistics(df, Seq("A", "B", "C"))
    rowSet(out) shouldBe Set(
      Seq("c1", 15L, 2L, 0L),
      Seq("c2", 0L, 7L, 0L))
  }

  test("statistics: pivot row sums equal pre-pivot group sums") {
    val df = Seq(
      ("c1", "A", 1L), ("c1", "B", 2L), ("c1", "C", 3L),
      ("c2", "A", 4L), ("c3", "C", 9L)).toDF("Contract", "Type", "TotalDuration")
    val out = Interaction.statistics(df, Seq("A", "B", "C"))
      .withColumn("rowSum", col("A") + col("B") + col("C"))
      .select("Contract", "rowSum")
    val expect = df.groupBy("Contract").agg(sum("TotalDuration").as("s"))
    rowSet(out) shouldBe rowSet(expect)
  }

  test("mostWatch: argmax, first category wins ties (incl. all-zero rows)") {
    val df = Seq(
      ("c1", 5L, 9L, 1L),  // b is max
      ("c2", 4L, 4L, 4L),  // all tied → first listed category
      ("c3", 0L, 0L, 0L)   // all zero → still first (greatest=0 matches a)
    ).toDF("Contract", "a", "b", "c")
    val out = Interaction.mostWatch(df, Seq("a", "b", "c"))
      .select("Contract", "MostWatch")
    rowSet(out) shouldBe Set(
      Seq("c1", "b"), Seq("c2", "a"), Seq("c3", "a"))
  }

  test("mostWatch: null greatest → null MostWatch (missing .otherwise kept)") {
    val df = Seq(("c1", Option.empty[Long], Option.empty[Long]))
      .toDF("Contract", "a", "b")
    val out = Interaction.mostWatch(df, Seq("a", "b")).select("MostWatch")
    rowList(out) shouldBe Seq(Seq(null))
  }

  test("customerTaste: zero categories omitted via concat_ws null-skipping") {
    val df = Seq(
      ("c1", 5L, 0L, 2L),  // a-c
      ("c2", 0L, 0L, 0L),  // empty string (concat_ws over all nulls)
      ("c3", 1L, 1L, 1L)   // a-b-c
    ).toDF("Contract", "a", "b", "c")
    val out = Interaction.customerTaste(df, Seq("a", "b", "c"))
      .select("Contract", "CustomerTaste")
    rowSet(out) shouldBe Set(
      Seq("c1", "a-c"), Seq("c2", ""), Seq("c3", "a-b-c"))
  }

  test("customerTypeColumn: all six segments plus the anomaly gaps") {
    val cases = Seq(
      // (activeness, duration, expected) with q1=10, median=20
      ("very low", 5.0, "leaving"),        // < q1
      ("very low", 10.0, "anomaly"),       // ≥ q1 falls through (the spec's gap)
      ("low", 19.0, "need attention"),
      ("low", 20.0, "anomaly"),            // ≥ median gap
      ("moderate", 19.0, "normal"),
      ("moderate", 20.0, "potential"),     // median boundary → potential
      ("high", 11.0, "loyal"),
      ("high", 10.0, "anomaly"),           // == q1 not > q1
      ("very high", 11.0, "VIP"),
      ("very high", 9.0, "anomaly"))
    val df = cases.map { case (a, d, _) => (a, d) }
      .toDF("Activeness", "TotalDuration")
      .withColumn("CustomerType", Interaction.customerTypeColumn(10.0, 20.0))
    rowSet(df) shouldBe
      cases.map { case (a, d, t) => Seq[Any](a, d, t) }.toSet
  }

  test("durationQuantiles exact: interpolated quartiles of 1..5") {
    val df = (1 to 5).map(_.toDouble).toDF("dur")
    val (q1, med, q3) = Interaction.durationQuantiles(df, "dur", exact = true)
    q1 shouldBe 2.0
    med shouldBe 3.0
    q3 shouldBe 4.0
  }

  test("customerType end-to-end: column order and segmentation") {
    val df = Seq(
      // Contract, a, b  (TotalDuration = a+b), Activeness, devices etc.
      ("c1", 1.0, 1.0, "very low", 1L, "a", "a"),
      ("c2", 10.0, 10.0, "moderate", 2L, "a", "a-b"),
      ("c3", 100.0, 100.0, "very high", 3L, "b", "a-b")
    ).toDF("Contract", "a", "b", "Activeness", "TotalDevices",
      "MostWatch", "CustomerTaste")
    val out = Interaction.customerType(df, Seq("a", "b"), exactQuantiles = true)
    out.columns.toSeq shouldBe Seq("Contract", "a", "b", "TotalDevices",
      "MostWatch", "CustomerTaste", "Activeness", "CustomerType")
    // totals: 2, 20, 200 → q1 = 11, median = 20
    val types = out.select("Contract", "CustomerType")
    rowSet(types) shouldBe Set(
      Seq("c1", "leaving"),      // very low, 2 < 11
      Seq("c2", "potential"),    // moderate, 20 >= 20
      Seq("c3", "VIP"))          // very high, 200 > 11
  }
}
