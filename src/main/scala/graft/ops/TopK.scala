package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale path for L3 (top-k per group, SURVEY.md §2.6): the plain
  * `row_number over (partition by g order by o)` window shuffles the
  * whole table, then sorts every group in one task — with few, huge
  * groups (return-flags, countries, status codes) that is a handful of
  * tasks sorting everything.
  *
  * [[topKPerGroup]] prunes before that shuffle, at zero extra
  * exchanges: each input partition is sorted locally
  * (`sortWithinPartitions` — no data movement) and reduced to its
  * first k rows per group in one pass; only the ≤ partitions·k
  * survivors per group reach the real window. Selection is closed
  * under unioning per-partition winners (a group's global top-k is
  * contained in the union of its per-partition top-ks), so the result
  * is identical to the one-phase window.
  *
  * (A salted two-phase window was measured first: its phase-1
  * exchange of the full table cost more than the parallelism it
  * bought — pruning must not shuffle.)
  */
object TopK {

  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int,
      rankCol: String = "rnk"): DataFrame = {
    val sorted = df.sortWithinPartitions(groupCols.map(col) ++ order: _*)
    val keyIdx = groupCols.map(df.schema.fieldIndex)
    val pruned = sorted.mapPartitions { rows =>
      var curKey: Seq[Any] = null
      var seen = 0
      rows.filter { r =>
        val key = keyIdx.map(r.get)
        if (key != curKey) { curKey = key; seen = 1 } else seen += 1
        seen <= k
      }
    }(Encoders.row(df.schema))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    pruned
      .withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
