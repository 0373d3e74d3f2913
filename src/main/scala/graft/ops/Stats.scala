package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group statistical profiling — correlation, simple linear
  * regression, and dispersion — built on EXACT integer-scaled moment
  * sums instead of Spark's built-in `corr`/`stddev`/`covar`
  * aggregates.
  *
  * Why not the built-ins: they accumulate running co-moments in
  * DOUBLE, so the result depends on partitioning and merge order —
  * fine for exploration, wrong for an engine whose results must be
  * reproducible run-to-run (and impossible to oracle-check). Here
  * each value is first scaled to an exact BIGINT (`round(x·10^s)`),
  * the six moment sums (n, Σx, Σy, Σx², Σy², Σxy) run in
  * DECIMAL(38,0) — exact, commutative, map-side-combinable, ONE
  * shuffle for any number of statistics — and only the final O(1)
  * formula per group runs in double. Layout-independent by
  * construction.
  *
  * Scale: this is the same shape as any groupBy-sum — partial
  * aggregation on the map side, 6 numbers per (group) in flight.
  * The scaled products x²·10^2s must stay inside DECIMAL(38,0) over
  * the group count: s = 6 supports |x| ≤ ~10⁵ over ~10¹⁴ rows.
  */
object Stats {

  /** Exact scaled moments per group: n, sx, sy, sxx, syy, sxy.
    *
    * A row contributes only when BOTH x and y are non-null — a
    * half-null row in `n` but not in `sxy` would bias every derived
    * statistic. Groups whose rows are all null survive with n = 0
    * and null sums (the finishers emit null for them).
    */
  def moments(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
      scaleDigits: Int = 6): DataFrame = {
    val m = math.pow(10, scaleDigits)
    val valid = x.isNotNull && y.isNotNull
    val xi = when(valid, round(x * m)).cast("decimal(38,0)")
    val yi = when(valid, round(y * m)).cast("decimal(38,0)")
    df.groupBy(groupCols.map(col): _*).agg(
      count(xi).as("n"),
      sum(xi).as("sx"), sum(yi).as("sy"),
      sum((xi * xi).cast("decimal(38,0)")).as("sxx"),
      sum((yi * yi).cast("decimal(38,0)")).as("syy"),
      sum((xi * yi).cast("decimal(38,0)")).as("sxy"))
  }

  /** Pearson correlation per group from exact moments (scale factors
    * cancel). Groups with zero variance on either side → null.
    */
  def corrBy(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
      scaleDigits: Int = 6): DataFrame = {
    val mo = moments(df, groupCols, x, y, scaleDigits)
    val n = col("n").cast("double")
    val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxx").cast("double"),
      col("syy").cast("double"), col("sxy").cast("double"))
    val covn = n * sxy - sx * sy
    val vxn = n * sxx - sx * sx
    val vyn = n * syy - sy * sy
    mo.select(groupCols.map(col) :+ col("n") :+
      when(vxn > 0 && vyn > 0,
        round(covn / sqrt(vxn) / sqrt(vyn), 6)).as("corr"): _*)
  }

  /** Least-squares slope and intercept of y on x per group (groups
    * with zero x-variance → nulls). The 10^s scale cancels in the
    * slope; the intercept divides it back out.
    */
  def linearFitBy(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
      scaleDigits: Int = 6): DataFrame = {
    val m = math.pow(10, scaleDigits)
    val mo = moments(df, groupCols, x, y, scaleDigits)
    val n = col("n").cast("double")
    val (sx, sy, sxx, sxy) = (col("sx").cast("double"), col("sy").cast("double"),
      col("sxx").cast("double"), col("sxy").cast("double"))
    val vxn = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / vxn
    val intercept = (sy - slope * sx) / n / lit(m)
    mo.select(groupCols.map(col) :+ col("n") :+
      when(vxn > 0, round(slope, 6)).as("slope") :+
      when(vxn > 0, round(intercept, 6)).as("intercept"): _*)
  }

  /** Per-group min-max feature scaling: (x − min)/(max − min) as
    * `<xName>_norm`, null for a degenerate (constant) group. Group
    * stats are one tiny agg broadcast back — the corpus itself is
    * never shuffled (same ship-the-stats pattern as the samplers);
    * min/max are exact, the single division is engine-stable.
    */
  def minMaxNormalizeBy(df: DataFrame, groupCols: Seq[String], x: Column,
      xName: String): DataFrame = {
    // null-safe (<=>) join: a null group key still gets its stats row
    // (groupBy emits one for the null group; a plain equi-join would
    // silently drop those input rows)
    val stats = groupCols.foldLeft(
        df.groupBy(groupCols.map(col): _*)
          .agg(min(x).as("__mn"), max(x).as("__mx"))) {
      (d, c) => d.withColumnRenamed(c, s"__g_$c")
    }
    val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
    df.join(broadcast(stats), cond)
      .withColumn(s"${xName}_norm",
        when(col("__mx") > col("__mn"),
          round((x - col("__mn")) / (col("__mx") - col("__mn")), 6)))
      .drop(groupCols.map(c => s"__g_$c") :+ "__mn" :+ "__mx": _*)
  }

  /** Population standard deviation per group from exact moments. */
  def stddevPopBy(df: DataFrame, groupCols: Seq[String], x: Column,
      scaleDigits: Int = 6): DataFrame = {
    val m = math.pow(10, scaleDigits)
    val mo = moments(df, groupCols, x, x, scaleDigits)
    val n = col("n").cast("double")
    val (sx, sxx) = (col("sx").cast("double"), col("sxx").cast("double"))
    mo.select(groupCols.map(col) :+ col("n") :+
      round(sqrt((n * sxx - sx * sx)) / n / lit(m), 6).as("stddev_pop"): _*)
  }
}
