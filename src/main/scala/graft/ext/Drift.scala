package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift report between two corpus slices — the monitor a
  * continuously-ingesting training-data pipeline runs between crawl
  * snapshots (or between the corpus and a new source) before letting
  * the mix shift silently: per-bucket Population Stability Index terms
  * over a numeric feature (document length, token count, quality
  * score) or a categorical one (language, source).
  *
  * PSI = Σ_b (p_b − q_b) · ln(p_b / q_b), reported per bucket so the
  * report says WHERE the shift is, not just how big. Conventional
  * read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Scale shape: each side is ONE scan reduced map-side to ≤ `nBuckets`
  * (cnt) rows — the shuffle after partial aggregation is bucket-count
  * sized, independent of corpus size; the totals ride a 1-row
  * broadcast (the ship-the-stats pattern, same as BM25), and the
  * histogram-vs-histogram join is bucket-count × bucket-count tiny.
  * Nothing about this changes at 100 TB: drift over a petabyte corpus
  * costs two scans and a kilobyte of shuffle.
  *
  * No reference counterpart (pure C360 ETL); north-star extension
  * surface alongside the quality/corpus-stats family.
  */
object Drift {

  /** Smoothing floor for the log ratio: a bucket empty on one side
    * contributes a large-but-finite term instead of ±∞.
    */
  val Eps = 1e-6

  private def psiTail(ref: DataFrame, cur: DataFrame,
      keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-side totals as window sums over the JOINED histogram (≤
    // bucket-count rows on one partition — integer sums, exact): the
    // corpus is scanned exactly once per side; an agg-based total
    // would re-execute each histogram's scan a second time.
    val w = Window.partitionBy(lit(1))
    val joined = ref
      .join(cur, Seq(keyCol), "full_outer")
      .na.fill(0L, Seq("cnt_ref", "cnt_cur"))
      .withColumn("t_ref", sum(col("cnt_ref")).over(w))
      .withColumn("t_cur", sum(col("cnt_cur")).over(w))
    // zero-total guard: an EMPTY side (e.g. an empty fresh batch fed
    // to the ANN drift monitor) has no defined shares — null, not an
    // ANSI DIVIDE_BY_ZERO that kills the planner; with any rows on
    // the side the expression is the plain division the SQL oracles
    // replay, bit-identical
    val pRef = when(col("t_ref") > 0,
      col("cnt_ref").cast("double") / col("t_ref"))
    val pCur = when(col("t_cur") > 0,
      col("cnt_cur").cast("double") / col("t_cur"))
    val term = (pRef - pCur) *
      log(greatest(pRef, lit(Eps)) / greatest(pCur, lit(Eps)))
    joined.select(col(keyCol), col("cnt_ref"), col("cnt_cur"),
      round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
      round(term, 6).as("psi_term"))
  }

  /** Fixed-width-bucket histogram: (bucket, cnt), bucket =
    * min(nBuckets−1, ⌊value / width⌋), nulls dropped. Fixed widths —
    * not quantile edges — so the SAME bucketing applies to both sides
    * and to every future snapshot without a training pass (quantile
    * edges drift with the data they're meant to monitor).
    */
  def histogram(df: DataFrame, valueCol: String, width: Long,
      nBuckets: Int, cntAlias: String = "cnt"): DataFrame = {
    require(width > 0 && nBuckets > 0, "width and nBuckets must be positive")
    df.filter(col(valueCol).isNotNull)
      .select(least(lit(nBuckets - 1),
        floor(col(valueCol) / width)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(cntAlias))
  }

  /** PSI report from two PRE-AGGREGATED histograms — the face the
    * streaming drift monitor needs: its current-side counts arrive as
    * upserted micro-batch state, not raw rows. `refHist` must carry
    * (keyCol, cnt_ref), `curHist` (keyCol, cnt_cur); output is
    * [[psiNumeric]]'s exactly.
    */
  def psiFromHistograms(refHist: DataFrame, curHist: DataFrame,
      keyCol: String = "bucket"): DataFrame =
    psiTail(refHist, curHist, keyCol)

  /** Numeric drift: per-bucket PSI terms of `valueCol` between `ref`
    * and `cur`. Output (bucket, cnt_ref, cnt_cur, p_ref, p_cur,
    * psi_term), one row per bucket observed on either side.
    */
  def psiNumeric(ref: DataFrame, cur: DataFrame, valueCol: String,
      width: Long, nBuckets: Int): DataFrame =
    psiTail(
      histogram(ref, valueCol, width, nBuckets, "cnt_ref"),
      histogram(cur, valueCol, width, nBuckets, "cnt_cur"),
      "bucket")

  /** Categorical drift: per-category PSI terms of `catCol` (language,
    * source, license…). Same shape as [[psiNumeric]] keyed by the
    * category value; cardinality is the category domain, so the
    * histogram shuffle stays tiny as long as the column is genuinely
    * categorical (cap upstream with approx_top_k if it might not be).
    */
  def psiCategorical(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    val hist = (df: DataFrame, as: String) =>
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(as))
    psiTail(hist(ref, "cnt_ref"), hist(cur, "cnt_cur"), "category")
  }
}
