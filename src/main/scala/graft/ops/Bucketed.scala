package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables — the "reuse a partitioning
  * across stages" face of the join surface. A table written with
  * `bucketBy(n, key)` is hash-split into n files per partition ON
  * DISK; a join of two tables bucketed on the join key with the same
  * bucket count needs NO Exchange at all (and with `sortBy` + one
  * file per bucket — see [[writeBucketed]] — no
  * per-task Sort either): each task reads bucket i of both sides and
  * merges. At 100 TB that converts the fact-fact join's dominant
  * full-corpus shuffle into a pure co-located read — the write-side
  * cost is one extra sort paid ONCE, amortized over every downstream
  * join/aggregation on the same key (aggregations on the bucket key
  * also skip their Exchange).
  *
  * This is the static twin of AQE's runtime re-plan: AQE can coalesce
  * and skew-split a shuffle it still has to RUN; bucketing removes
  * the shuffle from the plan. The no-Exchange/no-Sort plan shape is
  * pinned in BucketedSpec; result equivalence with the plain join is
  * the q_bucketed_join oracle.
  */
object Bucketed {

  /** Write `df` into the session catalog as a parquet table bucketed
    * (and bucket-sorted) on `keys` — the layout contract downstream
    * co-located joins rely on. Managed table: `DROP TABLE` reclaims
    * the files.
    *
    * The pre-write `repartition(buckets, keys)` matters: Spark only
    * reports a bucketed scan's SORT order downstream when each bucket
    * holds EXACTLY ONE file, and hash-repartitioning on the bucket
    * keys (the same Murmur3-pmod function bucket ids use) gives each
    * write task exactly one bucket's rows — one file per bucket. That
    * one extra write-side shuffle is what converts the downstream
    * sort-merge join to zero-Exchange AND zero-Sort; without it the
    * join still skips its Exchanges but re-sorts both sides per task.
    */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
      keys: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketBy needs at least one key")
    val keyCols = keys.map(org.apache.spark.sql.functions.col)
    val w = df.repartition(buckets, keyCols: _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sk = if (sortKeys.nonEmpty) sortKeys else keys
    w.sortBy(sk.head, sk.tail: _*).saveAsTable(name)
  }

  /** Equi-join two already-bucketed catalog tables on `leftKey ===
    * rightKey`, forcing the sort-merge strategy (`hint("merge")`) so
    * the bucket layout — not a broadcast — carries the join: with
    * matching bucket counts the planner emits SortMergeJoin with
    * zero Exchange and zero Sort.
    *
    * Zero SORT additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
    * 3.0 Spark's bucketed scan does not report its sortBy order to
    * the planner without it; the planner then re-sorts each bucket
    * per task, paying O(rows log rows) per join that the write-side
    * sort already paid). That conf is a SESSION decision, pinned in
    * [[graft.GraftSession.tuningConfigs]] with the other profile
    * pins — this builder does NOT mutate the caller's conf (planning
    * is lazy, so a scoped set-and-restore here would be read back
    * AFTER restore anyway). On a session without the pin the join is
    * still correct and still zero-Exchange; it merely re-sorts. The
    * conf is safe session-wide: the scan only claims an ordering when
    * a bucket has at most one file — the layout [[writeBucketed]]
    * guarantees — and multi-file buckets fall back to the re-sort.
    */
  def coLocatedJoin(s: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    s.table(leftTable).hint("merge")
      .join(s.table(rightTable).hint("merge"),
        org.apache.spark.sql.functions.col(leftKey) ===
          org.apache.spark.sql.functions.col(rightKey))
  }
}
