package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order data layout: multi-dimensional clustering for scan
  * pruning. Sorting 100 TB by one column buys data-skipping on that
  * column only; interleaving the bits of two (or more) columns puts
  * rows close on EVERY interleaved dimension, so per-file min/max
  * statistics prune box predicates on any of them — the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY` , done here with plain
  * Spark expressions.
  *
  * Everything is row-local integer arithmetic (normalize → interleave
  * → cell = top bits), so the layout assignment itself needs ZERO
  * shuffles beyond the one 1-row min/max stats broadcast — at write
  * time a repartitionByRange(zval) + sortWithinPartitions(zval) turns
  * the cells into files, and the cell stats here are exactly the
  * footer min/max a reader would prune on.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative longs:
    * x occupies odd bit positions, y even — the Morton/Z curve.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xi = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val yi = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Min-max normalize a non-negative column into [0, 2^bits):
    * floor((c − min) · 2^bits / (max − min + 1)). Exact for
    * |c·2^bits| < 2^53 (double floor division — the SQL twin uses the
    * identical expression).
    */
  def normalize(c: Column, min: Column, max: Column, bits: Int): Column =
    floor((c - min) * lit(1L << bits) / (max - min + lit(1L))).cast("long")

  /** Per-cell layout statistics for a two-dimensional Z-order layout:
    * normalize both columns to `bits` bits off a 1-row min/max stats
    * broadcast, interleave, cut the curve into 2^cellBits cells by
    * z-value prefix, and report each cell's row count and min/max of
    * both ORIGINAL columns — the parquet-footer statistics a reader
    * prunes on. Output: (cell, n, min_x, max_x, min_y, max_y).
    */
  def zorderCellStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, cellBits: Int = 6): DataFrame = {
    val stats = df.agg(
      min(col(xCol)).cast("long").as("__minx"),
      max(col(xCol)).cast("long").as("__maxx"),
      min(col(yCol)).cast("long").as("__miny"),
      max(col(yCol)).cast("long").as("__maxy"))
    val z = df.crossJoin(broadcast(stats)) // 1-row scalar join
      .withColumn("__zx", normalize(col(xCol), col("__minx"), col("__maxx"), bits))
      .withColumn("__zy", normalize(col(yCol), col("__miny"), col("__maxy"), bits))
      .withColumn("__cell", shiftright(zValue(col("__zx"), col("__zy"), bits),
        2 * bits - cellBits))
    z.groupBy(col("__cell").as("cell"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).cast("long").as("min_x"),
        max(col(xCol)).cast("long").as("max_x"),
        min(col(yCol)).cast("long").as("min_y"),
        max(col(yCol)).cast("long").as("max_y"))
  }

  /** Data-skipping comparison for a box predicate
    * `x ∈ [xLo,xHi] ∧ y ∈ [yLo,yHi]`: how many of the 2^cellBits
    * cells must be scanned (their min/max box overlaps the query box)
    * under (a) the Z-order layout vs (b) a single-column range layout
    * on `naturalCol` (the "sorted by insertion key" baseline). One
    * row: (cells_total, z_cells_scanned, z_rows_scanned,
    * nat_cells_scanned, nat_rows_scanned, rows_matching).
    */
  def pruneComparison(df: DataFrame, xCol: String, yCol: String,
      naturalCol: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      bits: Int = 10, cellBits: Int = 6): DataFrame = {
    val nCells = 1L << cellBits
    val overlap =
      col("min_x") <= xHi && col("max_x") >= xLo &&
        col("min_y") <= yHi && col("max_y") >= yLo
    val zStats = zorderCellStats(df, xCol, yCol, bits, cellBits)
      .agg(count(lit(1)).as("cells_total"),
        sum(when(overlap, 1L).otherwise(0L)).as("z_cells_scanned"),
        sum(when(overlap, col("n")).otherwise(0L)).as("z_rows_scanned"))
    // range layout on the natural key: cell = floor-normalized key
    val natStats = {
      val s = df.agg(min(col(naturalCol)).cast("long").as("__minn"),
        max(col(naturalCol)).cast("long").as("__maxn"))
      df.crossJoin(broadcast(s))
        .withColumn("__cell",
          normalize(col(naturalCol), col("__minn"), col("__maxn"), cellBits))
        .groupBy("__cell")
        .agg(count(lit(1)).as("n"),
          min(col(xCol)).cast("long").as("min_x"),
          max(col(xCol)).cast("long").as("max_x"),
          min(col(yCol)).cast("long").as("min_y"),
          max(col(yCol)).cast("long").as("max_y"))
        .agg(sum(when(overlap, 1L).otherwise(0L)).as("nat_cells_scanned"),
          sum(when(overlap, col("n")).otherwise(0L)).as("nat_rows_scanned"))
    }
    val matching = df.filter(col(xCol) >= xLo && col(xCol) <= xHi &&
        col(yCol) >= yLo && col(yCol) <= yHi)
      .agg(count(lit(1)).as("rows_matching"))
    zStats.crossJoin(natStats).crossJoin(matching) // three 1-row frames
      .select(col("cells_total"), col("z_cells_scanned"),
        col("z_rows_scanned"), col("nat_cells_scanned"),
        col("nat_rows_scanned"), col("rows_matching"),
        lit(nCells).as("cells_nominal"))
  }
}
