package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no native operator for, built from
  * compositions of existing operators (SURVEY.md §7.4 preference (a) —
  * no custom physical operator needed).
  */
object AsOfJoin {

  /** As-of (backward) join: for every left row, attach the value of
    * the latest right row with the same key and `rightTs <= leftTs`
    * (inclusive — DuckDB `ASOF JOIN` semantics). Left outer: no
    * earlier right row → null.
    *
    * Implementation is the union + running-`last` trick, not a join:
    * both sides union into one stream, sorted within each key by
    * (ts, side) with right rows first at equal timestamps; a window
    * `last(value, ignoreNulls = true)` over the unbounded-preceding
    * frame carries the most recent right value forward onto each left
    * row. ONE shuffle of each side (by key), no range predicate, no
    * cross product — the shape survives any timestamp density. Skewed
    * keys behave like any window partition (salt upstream if one key
    * dominates).
    *
    * `rightCols` must be unambiguous value column names on `right`;
    * they arrive null-filled on left rows that precede every right
    * row. Right rows with identical (key, ts) resolve to the one
    * later in the window order (nondeterministic among exact ties —
    * pre-aggregate the right side if that matters).
    */
  def asOfBackward(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTs: String, rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideL = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val sideR = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right (side 0) sorts before left (side 1) at equal ts → inclusive
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(sideL.unionByName(sideR)) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(keyCols.map(col) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightCols.map(c => col(s"__last_$c").as(c)): _*)
  }
}
