package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge stage (SURVEY.md §2.3 J4, §3.3): pair the two branch outputs
  * row-wise and drop the synthetic key.
  */
object Merge {

  /** J4 faithful — the reference's zip-join
    * (ETL_pipeline.py:356-362): `limit(250)` each side, index via
    * `monotonically_increasing_id()`, inner join on index.
    *
    * Semantics are **arbitrary row pairing**: the ids are
    * partition-encoded, need not be dense, and need not line up across
    * frames (README.md:49 claims a user_id/contract join; the code
    * joins synthetic ids). Kept for fidelity; use [[zipJoinDeterministic]]
    * anywhere the output is compared.
    */
  def zipJoinFaithful(left: DataFrame, right: DataFrame,
      limit: Int = 250, dropCols: Seq[String] = Seq("user_id")): DataFrame = {
    val l = left.limit(limit).withColumn("index", monotonically_increasing_id())
    val r = right.limit(limit).withColumn("index", monotonically_increasing_id())
    l.join(r, Seq("index")).drop("index" +: dropCols: _*)
  }

  /** J4 deterministic — row_number over an explicit sort key on each
    * side, then an index equi-join. Testable, oracle-expressible, and
    * the only sane semantic at scale (monotonically_increasing_id is
    * partition-layout-dependent, so the faithful variant changes
    * output when the cluster size changes).
    *
    * Scale note: a global row_number over an unpartitioned window is a
    * single-task sort — acceptable only because the reference caps both
    * sides at 250 rows first. For unbounded zips use
    * `zipWithIndex`-style two-pass numbering instead.
    */
  def zipJoinDeterministic(left: DataFrame, leftKey: Seq[Column],
      right: DataFrame, rightKey: Seq[Column],
      limit: Option[Int] = Some(250),
      dropCols: Seq[String] = Seq("user_id")): DataFrame = {
    def index(df: DataFrame, key: Seq[Column]) = {
      val capped = limit.fold(df)(n => df.orderBy(key: _*).limit(n))
      capped.withColumn("index", row_number().over(Window.orderBy(key: _*)))
    }
    index(left, leftKey)
      .join(index(right, rightKey), Seq("index"))
      .drop("index" +: dropCols: _*)
  }

  /** Batch upsert — the MERGE INTO shape of the load stage
    * (ETL_pipeline.py:198-211 overwrites the whole table per run; this
    * is the keyed refresh a production load does instead): rows in
    * `updates` replace `base` rows with the same key, unmatched update
    * rows insert, unmatched base rows persist. One unionByName + one
    * keyed window = a single shuffle on the key, the minimum any
    * hash-based MERGE pays; at 100 TB route recurring upserts through
    * bucketed layouts (io.Sinks.BucketedTableSink) so even that
    * shuffle amortizes to zero. `tieBreak` orders within `updates`
    * when it carries several rows per key (e.g. latest-timestamp
    * wins); ties beyond it keep an arbitrary update row, so pass a
    * total order anywhere the output is compared.
    */
  def upsertByKey(base: DataFrame, updates: DataFrame, keys: Seq[String],
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc +: tieBreak: _*)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** SCD Type-2 apply — the history-tracking upsert: `updates` rows
    * (carrying `effective` as their change timestamp) become new open
    * versions; the previously-open version of each key closes at the
    * next version's start; already-closed periods are immutable
    * (their `valid_to` is non-null and `coalesce` preserves it); the
    * latest version per key stays open (`valid_to` null). One
    * unionByName + one keyed window — same single-shuffle shape as
    * [[upsertByKey]], with the window computing `lead(valid_from)`
    * instead of picking a winner. Multiple updates per key chain
    * correctly in one call (each closes at the next's start).
    */
  def scd2Apply(history: DataFrame, updates: DataFrame, keys: Seq[String],
      effective: String): DataFrame = {
    val toType = history.schema("valid_to").dataType
    val newRows = updates.withColumnRenamed(effective, "valid_from")
      .withColumn("valid_to", lit(null).cast(toType))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("valid_from"))
    history.unionByName(newRows)
      .withColumn("__next", lead(col("valid_from"), 1).over(w))
      .withColumn("valid_to", coalesce(col("valid_to"), col("__next")))
      .drop("__next")
  }

  /** P6 — the reference's Total_ rename loop (ETL_pipeline.py:292-294)
    * as a single select (one projection, not five plan rewrites).
    */
  def renameWithPrefix(df: DataFrame, cols: Seq[String], prefix: String): DataFrame = {
    val renamed = df.columns.map { c =>
      if (cols.contains(c)) col(c).as(prefix + c) else col(c)
    }
    df.select(renamed.toIndexedSeq: _*)
  }
}
