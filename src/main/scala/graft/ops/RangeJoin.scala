package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: `left.ts ∈ [right.start, right.end]` with an
  * equi-join component, without the nested-loop Spark plans for a
  * bare range predicate.
  *
  * Each right interval is exploded to the sequence of fixed-width
  * buckets it overlaps; the left point maps to exactly one bucket; the
  * join becomes an equi-join on (keys…, bucket) with the precise range
  * predicate re-checked after. Cost scales with interval span /
  * `bucketWidth` — pick a width near the median interval length so
  * intervals replicate a small constant factor. This is the standard
  * bin/bucketed interval-join construction; all operators are stock
  * Spark (explode + equi-join), so AQE/broadcast still apply.
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], pointCol: String,
      startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket",
      floor(col(pointCol).cast("long") / bucketWidth))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol).cast("long") / bucketWidth),
        floor(col(endCol).cast("long") / bucketWidth))))
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
