package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale path for L3 (top-k per group, SURVEY.md §2.6): the plain
  * `row_number over (partition by g order by o)` window sorts every
  * group in one task — with few, huge groups (the common case:
  * return-flags, countries, status codes) that is a handful of tasks
  * sorting the whole table.
  *
  * [[topKPerGroup]] runs two phases: a local rank within
  * (group, salt) — `salts`× the parallelism, each sub-window sorting
  * 1/salts of the group — then the real rank over the ≤ salts·k
  * survivors per group. Selection is closed under unioning per-salt
  * winners (the global top-k of a group is contained in the union of
  * its per-salt top-ks), so the result is identical to the one-phase
  * window for any salt assignment.
  */
object TopK {

  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], k: Int, salts: Int = 32,
      rankCol: String = "rnk"): DataFrame = {
    val local = Window
      .partitionBy((groupCols.map(col) :+ col("__salt")): _*)
      .orderBy(order: _*)
    val global = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__salt", spark_partition_id() % salts)
      .withColumn("__lrnk", row_number().over(local))
      .filter(col("__lrnk") <= k)
      .drop("__salt", "__lrnk")
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
  }
}
