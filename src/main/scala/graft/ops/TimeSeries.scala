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
}
