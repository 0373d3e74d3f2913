package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time series operators: range-frame moving aggregates and
  * burst debouncing — the per-key temporal hygiene passes an event
  * pipeline runs between ingestion and sessionization.
  */
object TimeSeries {

  /** Per-key moving aggregate over a TIME-range frame: for every
    * event, the sum/count of the key's events in the trailing
    * `windowSec` seconds (inclusive frame, so equal-timestamp peers
    * are in each other's frames — SQL-standard RANGE semantics on
    * both engines).
    *
    * ONE shuffle on the key; Spark's sliding frame processor
    * evaluates the range frame with add/remove passes, linear per
    * partition, never re-scanning the frame per row. The sum runs in
    * DECIMAL(18,2) (exact, order-insensitive) and is cast back to
    * double at the edge. A hot key serializes into one partition —
    * pre-aggregate to coarser time grain or salt upstream if one key
    * exceeds a partition.
    */
  def movingAgg(df: DataFrame, keyCol: Column, tsCol: Column,
      valCol: Column, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(tsCol))
      .rangeBetween(-windowSec * 1000000L, 0L)
    df.withColumn("moving_sum", sum(valCol.cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("moving_n", count(lit(1)).over(w))
  }

  /** Daily-volume anomaly scores: roll the log up to per-(key, day)
    * counts, then z-score each day against the key's TRAILING
    * `trailing` observed days (ROWS frame excluding the current day
    * — observed days, so a silent gap day simply isn't in the
    * baseline). z is null until a full baseline exists or when the
    * baseline has zero variance.
    *
    * Scale: the daily rollup is the only pass over the log (one
    * map-side-combinable shuffle); the window runs on keys×days rows.
    * Baseline sums are exact integers (Σn as long, Σn² in
    * DECIMAL(38,0) — a 10¹²-events/day key squares past int64); only
    * the final z formula runs in double, identically ordered on both
    * engines.
    */
  def volumeAnomaly(df: DataFrame, keyCol: String, tsCol: Column,
      trailing: Int = 7): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(tsCol).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-trailing, -1)
    val cnt = count(lit(1)).over(w)
    val sx = sum(col("n")).over(w)
    val sxx = sum((col("n") * col("n")).cast("decimal(38,0)")).over(w)
    val (cntD, sxD, sxxD) = (cnt.cast("double"), sx.cast("double"),
      sxx.cast("double"))
    val nD = col("n").cast("double")
    val vn = cntD * sxxD - sxD * sxD
    daily.withColumn("z",
      when(cnt === trailing && vn > 0,
        round((nD - sxD / cntD) / (sqrt(vn) / cntD), 6)))
  }

  /** Burst debounce: drop an event when the key's PREVIOUS event (in
    * (ts, tieCol) order) is less than `minGapSec` seconds earlier —
    * the lag-based collapse of duplicate-click/retry bursts. This is
    * the deterministic one-pass variant (gap to the previous RAW
    * event); gap-to-previous-KEPT-event needs sequential state and
    * lives in the streaming gate instead. One shuffle on the key.
    */
  def debounce(df: DataFrame, keyCol: Column, tsCol: Column,
      tieCol: Column, minGapSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    df.withColumn("__prev", lag(tsCol, 1).over(w))
      .filter(col("__prev").isNull ||
        unix_micros(tsCol) - unix_micros(col("__prev")) >= minGapSec * 1000000L)
      .drop("__prev")
  }

  /** Daily gap-fill with forward-fill: roll the log up to per-(key,
    * day) sums, then densify each key's [first, last] day range,
    * carrying the last OBSERVED day's value across the gap and
    * flagging carried rows with `filled = true`.
    *
    * The spine is generated from each observed row's gap to its NEXT
    * observed day (`lead` + `sequence`/`explode`) — no date-dimension
    * join and no second pass: the forward-filled value for every
    * synthetic day between two observations IS the left observation's
    * value, so the fill rides the explode for free.
    *
    * Scale: one map-side-combinable shuffle for the daily rollup, one
    * key-partitioned sort for `lead`; spine rows are generated where
    * they are consumed (no shuffle of filled rows). Row growth is
    * bounded by keys × calendar-days, independent of event volume. A
    * key silent for years would explode a long spine — cap spans
    * upstream if the calendar can outgrow a partition.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: Column,
      valCol: Column): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(tsCol).as("__obs"))
      .agg(sum(valCol.cast("decimal(18,2)")).cast("double").as("value"))
    val w = Window.partitionBy(keyCol).orderBy("__obs")
    daily
      .withColumn("__next", lead(col("__obs"), 1).over(w))
      .withColumn("day", explode(expr(
        "sequence(__obs, coalesce(date_sub(__next, 1), __obs), interval 1 day)")))
      .withColumn("filled", col("day") =!= col("__obs"))
      .select(col(keyCol), col("day"), col("value"), col("filled"))
  }
}
