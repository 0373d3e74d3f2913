package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interaction branch operators (SURVEY.md §2.2-§2.4, §3.1): daily
  * viewing logs → per-contract Customer-360 profile.
  *
  * All operators are column-name-parameterized so the same code serves
  * the reference-shaped schema (Contract/Mac/Date/AppName/
  * TotalDuration) and the re-targeted testdata schema
  * (user_id/props/ts/event_type/value). Everything composes Spark
  * built-ins — per SURVEY.md §2.10 no custom Expression is needed for
  * parity — so every op stays inside whole-stage codegen.
  */
object Interaction {

  /** A1 — devices per contract: `groupBy(contract).countDistinct(device)`
    * (ETL_pipeline.py:41-44).
    *
    * Exact distinct expands each row then runs a two-phase hash agg —
    * fine when device-per-contract cardinality is modest. At 100 TB
    * prefer [[totalDevicesApprox]] (HLL++, single pass, no expand).
    */
  def totalDevices(df: DataFrame, contract: String = "Contract",
      device: String = "Mac"): DataFrame =
    df.select(contract, device)
      .groupBy(contract)
      .agg(countDistinct(device).as("TotalDevices"))

  /** A1 at scale — approx_count_distinct (HLL++), default rsd 1%. */
  def totalDevicesApprox(df: DataFrame, contract: String = "Contract",
      device: String = "Mac", rsd: Double = 0.01): DataFrame =
    df.select(contract, device)
      .groupBy(contract)
      .agg(approx_count_distinct(device, rsd).as("TotalDevices"))

  /** Error-bound verification face of [[totalDevicesApprox]]: exact and
    * HLL++ distinct in ONE aggregation pass, emitting the exact count
    * plus a `WithinBound` boolean — |est − exact| ≤ max(1, tol·rsd·exact).
    * The boolean (not the estimate, which is engine-specific) is what a
    * cross-engine oracle can hash-pin: HLL++'s rsd is a documented
    * parameter, so "the estimate honors its own error contract" is a
    * deterministic, checkable claim even though the estimate isn't.
    * tol = 4 standard deviations keeps false alarms ~1e-4 per group
    * while still catching any real sketch regression.
    */
  def totalDevicesApproxCheck(df: DataFrame, contract: String = "Contract",
      device: String = "Mac", rsd: Double = 0.01,
      tol: Double = 4.0): DataFrame =
    df.select(contract, device)
      .groupBy(contract)
      .agg(countDistinct(device).as("TotalDevicesExact"),
        approx_count_distinct(device, rsd).as("est"))
      .select(col(contract), col("TotalDevicesExact"),
        (abs(col("est") - col("TotalDevicesExact")).cast("double") <=
          greatest(lit(1.0), lit(tol * rsd) * col("TotalDevicesExact")))
          .as("WithinBound"))

  /** A1 incremental — MERGEABLE distinct sketches (Apache DataSketches
    * HLL via Spark's `hll_sketch_agg`): one sketch per (contract,
    * grain) partition, e.g. per day. Daily jobs persist sketches;
    * any date range's distinct count is then a cheap
    * `hll_union_agg` + estimate over the pre-aggregated sketches —
    * no rescan of raw events. THE pattern for incremental distinct at
    * 100 TB (plain countDistinct/HLL++ results cannot be merged
    * across runs).
    */
  def deviceSketches(df: DataFrame, contract: String = "Contract",
      device: String = "Mac", grain: Column): DataFrame =
    df.groupBy(col(contract), grain.as("grain"))
      .agg(hll_sketch_agg(col(device)).as("device_sketch"))

  /** Union pre-aggregated sketches back to a distinct estimate. */
  def mergeDeviceSketches(sketches: DataFrame,
      contract: String = "Contract"): DataFrame =
    sketches.groupBy(col(contract))
      .agg(hll_sketch_estimate(
        hll_union_agg(col("device_sketch"))).as("TotalDevices"))

  /** Error-bound verification face of the sketch→merge path: the merged
    * estimate joined against the exact distinct count, emitting exact +
    * `WithinBound` (same contract as [[totalDevicesApproxCheck]]).
    * DataSketches HLL at the default lgConfigK=12 has rsd ≈
    * 1.04/√4096 ≈ 1.63%; tol = 4σ → 6.5% relative (min 1 absolute).
    * This pins the MERGE property — union of per-grain sketches must
    * estimate the range-wide distinct within the sketch's own bound —
    * which is the whole point of the incremental pattern.
    */
  def mergeDeviceSketchesCheck(df: DataFrame, contract: String = "Contract",
      device: String = "Mac", grain: Column,
      relBound: Double = 0.065): DataFrame = {
    val est = mergeDeviceSketches(
      deviceSketches(df, contract, device, grain), contract)
      .withColumnRenamed("TotalDevices", "est")
    val exact = totalDevices(df, contract, device)
      .withColumnRenamed("TotalDevices", "TotalDevicesExact")
    est.join(exact, Seq(contract))
      .select(col(contract), col("TotalDevicesExact"),
        (abs(col("est") - col("TotalDevicesExact")) <=
          greatest(lit(1.0), lit(relBound) * col("TotalDevicesExact")))
          .as("WithinBound"))
  }

  /** Activeness bucket edges (ETL_pipeline.py:52-57): Days_Active →
    * label; out-of-range (0 or >31) → "error".
    */
  def activenessBucket(daysActive: Column): Column =
    when(daysActive.between(1, 7), "very low")
      .when(daysActive.between(8, 14), "low")
      .when(daysActive.between(15, 21), "moderate")
      .when(daysActive.between(22, 28), "high")
      .when(daysActive.between(29, 31), "very high")
      .otherwise("error")

  /** A2+F1 — active-day count per contract, bucketed, errors dropped
    * (ETL_pipeline.py:46-60). `date` must already be a date-grain
    * column; distinct-date cardinality is bounded (≤31) so the exact
    * distinct is cheap at any scale.
    */
  def activeness(df: DataFrame, contract: String = "Contract",
      date: String = "Date"): DataFrame =
    df.select(contract, date)
      .groupBy(contract)
      .agg(countDistinct(date).as("Days_Active"))
      .withColumn("Activeness", activenessBucket(col("Days_Active")))
      .filter(col("Activeness") =!= "error")
      .select(contract, "Activeness")

  /** The reference's AppName→category recode (ETL_pipeline.py:64-72). */
  val referenceCategoryMap: Map[String, String] = Map(
    "CHANNEL" -> "Truyen_hinh", "DSHD" -> "Truyen_hinh",
    "KPLUS" -> "Truyen_hinh", "VOD" -> "Phim_truyen",
    "FIMS" -> "Phim_truyen", "SPORT" -> "The_thao",
    "RELAX" -> "Giai_tri", "CHILD" -> "Thieu_nhi")

  /** F1+P8 — N:1 app→category recode via a CaseWhen chain, junk
    * contract and unknown-app rows dropped (ETL_pipeline.py:63-76).
    * The chain is a closed-world literal map: pure codegen, no join, no
    * shuffle.
    */
  def transformCategory(df: DataFrame,
      categoryMap: Map[String, String] = referenceCategoryMap,
      contract: String = "Contract", app: String = "AppName",
      duration: String = "TotalDuration",
      junkContract: String = "0"): DataFrame = {
    val recode = categoryMap.foldLeft(null.asInstanceOf[Column]) {
      case (null, (k, v)) => when(col(app) === k, v)
      case (chain, (k, v)) => chain.when(col(app) === k, v)
    }.otherwise("error")
    df.withColumn("Type", recode)
      .filter(col(contract) =!= junkContract)
      .filter(col("Type") =!= "error")
      .select(col(contract).as("Contract"), col("Type"),
        col(duration).as("TotalDuration"))
  }

  /** A3+A4 — watch time per (contract, category), pivoted to one row
    * per contract with one column per category, missing cells → 0
    * (ETL_pipeline.py:79-86).
    *
    * `categories` is passed explicitly: the reference's value-less
    * `.pivot("Type")` launches an extra distinct-values job before the
    * real agg (SURVEY.md §4) — at 100 TB that is a full second scan.
    * The category domain is closed-world (the recode above defines it),
    * so we skip the job. The pre-agg groupBy(contract, type) is kept:
    * partial (map-side) aggregation collapses the data before the one
    * shuffle, and the pivot then aggregates (contract) without a second
    * shuffle thanks to AQE-preserved partitioning on the prefix key.
    */
  def statistics(df: DataFrame, categories: Seq[String],
      sumExpr: String => Column = c => sum(col(c))): DataFrame = {
    val agged = df
      .groupBy("Contract", "Type")
      .agg(sumExpr("TotalDuration").as("TotalDuration"))
    agged
      .groupBy("Contract")
      .pivot("Type", categories)
      .sum("TotalDuration")
      .na.fill(0, categories)
  }

  /** Scale path for the §3.1 profile: the composed pipeline scans the
    * input three times (pivot, activeness, device count) and joins the
    * three aggregates back together — three shuffles plus two join
    * exchanges. This fuses them into ONE scan and ONE groupBy(Contract):
    * the pivot becomes conditional sums (the category domain is
    * closed-world, same reason [[statistics]] passes explicit pivot
    * values), and both distinct counts ride the same aggregation.
    *
    * Semantics are identical to
    * `taste(mostWatch(pivot)) ⋈ activeness ⋈ totalDevices` — the inner
    * joins' row-dropping is reproduced by the `has a category event`
    * filter (a contract absent from the pivot side) and the activeness
    * error filter; the DuckDB oracle for q_customer360 (written against
    * the composed form) stays green against this plan.
    *
    * `sumExpr` aggregates `when(app ∈ category, duration)` per
    * category; `zero` fills contracts with no events of a category.
    */
  def fusedProfile(df: DataFrame,
      categoryMap: Map[String, String],
      categories: Seq[String],
      sumExpr: Column => Column = sum,
      zero: Column = lit(0),
      contract: String = "Contract", device: String = "Mac",
      date: String = "Date", app: String = "AppName",
      duration: String = "TotalDuration",
      junkContract: String = "0"): DataFrame = {
    val appsOf: Map[String, Seq[String]] =
      categoryMap.toSeq.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val catSums = categories.map { c =>
      val cond = col(app).isin(appsOf.getOrElse(c, Seq.empty): _*)
      coalesce(sumExpr(when(cond, col(duration))), zero).as(c)
    }
    val allApps = categoryMap.keys.toSeq
    val aggs =
      countDistinct(col(device)).as("TotalDevices") +:
        countDistinct(col(date)).as("Days_Active") +:
        catSums :+
        count(when(col(app).isin(allApps: _*), lit(1))).as("__n_cat")
    df.filter(col(contract) =!= junkContract)
      .groupBy(col(contract).as("Contract"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("__n_cat") > 0) // ≡ inner join against the pivot side
      .withColumn("Activeness", activenessBucket(col("Days_Active")))
      .filter(col("Activeness") =!= "error")
      .drop("__n_cat", "Days_Active")
  }

  /** F1+F2 — argmax over the pivoted category columns
    * (ETL_pipeline.py:88-96). Faithful quirk: **no `.otherwise`** — a
    * contract whose five categories are all equal-and-greatest still
    * matches the first branch, but the reference's chain can only yield
    * null if greatest() itself is null; we preserve the missing
    * otherwise so behavior is bit-identical.
    */
  def mostWatch(df: DataFrame, categories: Seq[String]): DataFrame = {
    val g = greatest(categories.map(col): _*)
    val chain = categories.foldLeft(null.asInstanceOf[Column]) {
      case (null, c) => when(col(c) === g, c)
      case (acc, c) => acc.when(col(c) === g, c)
    }
    df.withColumn("MostWatch", chain)
  }

  /** F1+F3 — taste string: "-"-joined names of every category with
    * nonzero watch time (ETL_pipeline.py:98-107). `concat_ws` skips
    * nulls, which is the whole semantic: a zero-duration category
    * contributes null and is omitted.
    */
  def customerTaste(df: DataFrame, categories: Seq[String]): DataFrame =
    df.withColumn("CustomerTaste",
      concat_ws("-", categories.map(c => when(col(c) =!= 0, c)): _*))

  /** Quantile thresholds for segmentation. The reference collects
    * percentile_approx(accuracy=100) to the driver and re-embeds the
    * scalars as literals (ETL_pipeline.py:113-123) — a deliberate
    * two-job shape (SURVEY.md §4 "constant folding"). We keep that
    * shape; `exact = true` swaps in the exact interpolated percentile
    * for oracle-comparable results (approx differs per engine).
    * At 100 TB, approx (t-digest-style, fixed memory) is the right
    * default — exact percentile sorts the whole column.
    */
  def durationQuantiles(df: DataFrame, duration: String,
      exact: Boolean = false): (Double, Double, Double) = {
    val pcts = Array(0.25, 0.5, 0.75)
    val vals: Seq[Double] =
      if (exact)
        df.select(expr(s"percentile($duration, array(0.25, 0.5, 0.75))"))
          .head().getSeq[Double](0)
      else
        df.stat.approxQuantile(duration, pcts, 0.01).toSeq
    (vals(0), vals(1), vals(2))
  }

  /** F1+P13 — the six-way customer segmentation
    * (ETL_pipeline.py:135-143), faithful to the reference's quirky
    * boundaries ("moderate" split at median, "very low" with duration
    * ≥ Q1 → anomaly — that's the spec, per its comments :126-132).
    */
  def customerTypeColumn(q1: Double, median: Double): Column =
    when(col("Activeness") === "very low" && col("TotalDuration") < q1, "leaving")
      .when(col("Activeness") === "low" && col("TotalDuration") < median, "need attention")
      .when(col("Activeness") === "moderate" && col("TotalDuration") < median, "normal")
      .when(col("Activeness") === "moderate" && col("TotalDuration") >= median, "potential")
      .when(col("Activeness") === "high" && col("TotalDuration") > q1, "loyal")
      .when(col("Activeness") === "very high" && col("TotalDuration") > q1, "VIP")
      .otherwise("anomaly")

  /** A6 + segmentation (ETL_pipeline.py:110-145): total duration =
    * row-wise sum of the category columns, IQR thresholds collected to
    * the driver, CaseWhen segmentation, final column order.
    */
  def customerType(df: DataFrame, categories: Seq[String],
      exactQuantiles: Boolean = false): DataFrame = {
    // Two consumers (the quantile job, then the segmentation plan):
    // persist so the profile aggregation runs once, not once per job —
    // the reference's cache() at :260 serves the same fan-out (M1).
    val withTotal = df.withColumn("TotalDuration",
      categories.map(col).reduce(_ + _))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (q1, median, _) = durationQuantiles(withTotal, "TotalDuration", exactQuantiles)
    // Final column order per ETL_pipeline.py:145 — contract, categories
    // (alphabetical), then the derived profile columns.
    val outCols = ("Contract" +: categories.sorted) ++
      Seq("TotalDevices", "MostWatch", "CustomerTaste", "Activeness", "CustomerType")
    withTotal
      .withColumn("CustomerType", customerTypeColumn(q1, median))
      .select(outCols.map(col): _*)
  }
}
