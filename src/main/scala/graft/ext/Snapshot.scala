package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-ingest bookkeeping operator:
  * given two snapshots of the same keyed corpus (yesterday's crawl and
  * today's), classify every key as added / removed / changed /
  * unchanged by comparing a content digest.
  *
  * Scale shape (the whole point of the digest): the payload — at
  * 100 TB that's the document text — is hashed to 16 bytes BEFORE the
  * join, so the full-outer shuffle carries (key, digest) rows of a few
  * dozen bytes, never the text. With both snapshots bucketed on the
  * key (the natural layout for a corpus that diffs daily —
  * [[graft.ops.Bucketed]]) the join needs no Exchange at all; the diff
  * becomes a pure co-located merge. Downstream, `added ∪ changed` is
  * exactly the slice the admission ladder (README §ingest) has to
  * process — everything else skips the pipeline entirely, which is how
  * a daily 100 TB re-crawl costs only its delta.
  *
  * No reference counterpart (the reference's C360 ETL recomputes from
  * scratch each run, ETL_pipeline.py:26-47 re-reads the full month);
  * this is north-star extension surface.
  */
object Snapshot {

  /** 128-bit content digest over `payloadCols` in order, null-safe:
    * columns are joined with the U+0001 separator (cannot appear in
    * the text domain) and NULL coalesces to the U+0000 sentinel, so a
    * text-to-NULL transition is CHANGED, not silently unchanged (bare
    * concat_ws SKIPS nulls, which would make ("a", null) collide with
    * ("a") one column over).
    */
  def contentDigest(payloadCols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      payloadCols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Per-key diff: (key, status) with status in added | removed |
    * changed | unchanged. `prev`/`cur` must be unique on `keyCol`
    * (snapshots are — enforce upstream with [[Dedup.exactDups]] if the
    * source may repeat keys; a duplicated key here would fan out the
    * full-outer join).
    */
  def diff(prev: DataFrame, cur: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "diff needs at least one payload column")
    val dig = (df: DataFrame, as: String) =>
      df.select(col(keyCol).as("key"),
        contentDigest(payloadCols.map(col)).as(as))
    dig(prev, "dig_prev")
      .join(dig(cur, "dig_cur"), Seq("key"), "full_outer")
      .select(col("key").as(keyCol),
        when(col("dig_prev").isNull, lit("added"))
          .when(col("dig_cur").isNull, lit("removed"))
          .when(col("dig_prev") === col("dig_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The delta a downstream incremental pipeline must process: current
    * rows whose key is new or whose content changed. Same digest join
    * as [[diff]], but the payload survives on the CURRENT side only
    * (the previous side still ships digests, not text).
    */
  def changedOrAdded(prev: DataFrame, cur: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val prevDigests = prev.select(col(keyCol).as(keyCol),
      contentDigest(payloadCols.map(col)).as("__dig_prev"))
    cur.withColumn("__dig", contentDigest(payloadCols.map(col)))
      .join(prevDigests, Seq(keyCol), "left_outer")
      .filter(col("__dig_prev").isNull || col("__dig_prev") =!= col("__dig"))
      .drop("__dig_prev", "__dig")
  }
}
