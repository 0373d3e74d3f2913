package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sinks (SURVEY.md §2.1 S6-S8).
  *
  * The JDBC sink goes behind a trait so the pipeline can run against a
  * test double (parquet) where no SQL Server exists; option assembly is
  * unit-testable without a connection. Mirrors
  * ETL_pipeline.py:198-211 (`write_to_azureSQLdb`), minus the
  * reference's bug of only catching `ValueError` (real SQLExceptions
  * propagate there anyway; here every failure propagates).
  */
trait Sink {
  def write(df: DataFrame): Unit
}

/** S6 — JDBC overwrite sink.
  *
  * At scale each output partition opens one connection; callers should
  * `coalesce` to a connection count the database tolerates and set
  * `batchsize`. The reference writes ≤250 rows so none of this matters
  * there, but the sink is sized for real use.
  */
final case class JdbcSink(
    url: String,
    table: String,
    driver: String,
    user: String,
    password: String,
    batchSize: Int = 10000,
    numPartitions: Int = 8)
    extends Sink {

  /** The full option map (unit-testable without a database). */
  def options: Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "driver" -> driver,
    "user" -> user,
    "password" -> password,
    "batchsize" -> batchSize.toString,
    "numPartitions" -> numPartitions.toString
  )

  override def write(df: DataFrame): Unit =
    df.write.format("jdbc").mode(SaveMode.Overwrite).options(options).save()
}

object JdbcSink {
  /** URL assembly as the reference builds it (ETL_pipeline.py:199). */
  def sqlServerUrl(host: String, port: String, database: String): String =
    s"jdbc:sqlserver://$host:$port;databaseName=$database"
}

/** Parquet test double for the JDBC sink. */
final case class ParquetSink(path: String) extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}

/** Hive-style date-partitioned parquet sink — the production layout
  * SURVEY.md §1.4 prescribes in place of the reference's flat
  * `YYYYMMDD`-named files: writing `date=.../` directories makes the
  * date a partition column, so a reader's date-range predicate prunes
  * at the file index (Catalyst PartitionPruning) instead of the
  * driver-side filename filtering of ETL_pipeline.py:22-29.
  */
final case class PartitionedParquetSink(path: String,
    partitionCols: Seq[String] = Seq("date")) extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}

/** Bucketed managed-table sink — the co-located-join layout
  * (SURVEY.md §4 / SCALE.md): rows are hash-bucketed (and sorted)
  * on the join key at WRITE time, so two tables bucketed the same way
  * join with NO shuffle exchange on either side — at 100 TB that turns
  * the recurring fact⋈fact join from the most expensive stage into a
  * local merge. Write once, save every downstream join's exchange.
  */
final case class BucketedTableSink(table: String, bucketCols: Seq[String],
    nBuckets: Int) extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.drop(1): _*)
      .sortBy(bucketCols.head, bucketCols.drop(1): _*)
      .format("parquet")
      .saveAsTable(table)
}

/** ORC sink — zstd-compressed, the same codec profile as the parquet
  * output path (GraftSession pins zstd); pairs with
  * [[graft.io.Sources.readOrc]] for the ORC half of the columnar-lake
  * surface.
  */
final case class OrcSink(path: String) extends Sink {
  override def write(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "zstd").orc(path)
}

/** Per-epoch parquet sink for `foreachBatch` ingest loops: the frame
  * must carry a `batch_id` column, which becomes a partition directory
  * written in DYNAMIC partition-overwrite mode — a replayed epoch
  * (foreachBatch is at-least-once after a failure) overwrites ONLY its
  * own `batch_id=k/` partition, leaving every other epoch's output
  * intact. That makes the sink effectively-once when the epoch's
  * content is DETERMINISTIC in its input (the common stateless
  * transform); when the computation also reads mutable state the
  * epoch itself advances (an ingest loop appending to a store), a
  * replay recomputes AGAINST THE ADVANCED STATE and the rewrite would
  * be wrong — such callers must gate the write on [[committed]] and
  * keep the first durable attempt (the cumulative paragraph gate's
  * pattern). Append mode would duplicate the replayed epoch;
  * whole-path overwrite would erase every earlier one.
  *
  * Epoch durability is recorded by an explicit `_committed_<k>` marker
  * at the sink root, created only AFTER the parquet write returns —
  * not inferred from part files: a crash during the committer's move
  * phase can leave a partially-populated partition whose part files
  * read as "durable" and would freeze incomplete content. The
  * leading-underscore name keeps the marker invisible to Spark's file
  * index. Crash windows (the state-advancing-loop case, enumerated in
  * SCALE.md): before the marker lands the epoch reads as uncommitted
  * and the replay's dynamic overwrite REPLACES any half-written
  * partition against the still-unadvanced state; after the marker the
  * replay skips the write entirely — no window freezes partial data.
  * All paths go through the Hadoop FileSystem API, so the guard works
  * on any production filesystem (HDFS/ABFS/S3A), not just local disk.
  */
final case class EpochParquetSink(path: String) extends Sink {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def fs: FileSystem = new HPath(path).getFileSystem(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  private def marker(batchId: Long): HPath =
    new HPath(path, s"_committed_$batchId")

  /** Write one epoch: stamp the partition column, write its partition,
    * then drop the commit marker. The primary API for ingest loops —
    * unlike [[write]] it never re-evaluates the frame to discover
    * which epochs it carries.
    */
  def writeEpoch(df: DataFrame, batchId: Long): Unit = {
    writeData(df.withColumn("batch_id",
      org.apache.spark.sql.functions.lit(batchId)))
    markCommitted(batchId)
  }

  /** [[Sink]]-contract write: the frame must already carry `batch_id`.
    * Costs one extra narrow distinct job over the input to learn which
    * epochs to mark — callers with a single known epoch should prefer
    * [[writeEpoch]].
    *
    * The ids collect and the parquet write read ONE materialization
    * (the frame is persisted across both, then released): evaluating
    * the input twice would let a non-deterministic frame mark an
    * epoch that got no data or write one that never gets marked —
    * silently breaking the marker-is-durability invariant.
    */
  override def write(df: DataFrame): Unit = {
    require(df.columns.contains("batch_id"),
      "EpochParquetSink needs a batch_id column to key the epoch partition")
    val mat = df.persist()
    try {
      val ids = mat.select(org.apache.spark.sql.functions
          .col("batch_id").cast("long"))
        .distinct().collect().map(_.getLong(0))
      writeData(mat)
      ids.foreach(markCommitted)
    } finally mat.unpersist()
  }

  private def writeData(df: DataFrame): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  private def markCommitted(batchId: Long): Unit =
    fs.create(marker(batchId), true).close()

  /** True when epoch `batchId`'s marker exists — the replay guard:
    * false means "recompute and write" (a crashed attempt, even one
    * that half-moved part files, never marks), true means "this
    * epoch's output is already durable, keep it".
    */
  def committed(batchId: Long): Boolean = fs.exists(marker(batchId))

  /** Ascending ids of all committed epochs. Unparsable sink-root
    * debris is ignored, never thrown on.
    */
  def committedEpochs: Seq[Long] = {
    val f = fs
    val root = new HPath(path)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.matches("_committed_\\d+"))
      .map(_.stripPrefix("_committed_").toLong)
      .sorted
  }

  /** True when ANY epoch has committed — distinguishes "no admitted
    * rows ever" (a valid empty result) from a readable sink.
    */
  def anyCommitted: Boolean = committedEpochs.nonEmpty

  /** Ascending ids of epochs whose partition holds DATA files — a
    * committed epoch whose frame was empty writes no partition (the
    * dynamic committer skips it), so readers that need parquet rows
    * gate on this, not on [[committedEpochs]]. Unparsable partition
    * dirs (stray debris, null-key partitions) are ignored.
    */
  def dataEpochs: Seq[Long] = {
    val f = fs
    val root = new HPath(path)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("batch_id=\\d+"))
      .filter(s => f.listStatus(s.getPath).exists(p =>
        p.getPath.getName.startsWith("part-") &&
          !p.getPath.getName.endsWith(".crc")))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .sorted
  }

  /** True when any epoch's partition holds readable parquet rows. */
  def hasData: Boolean = dataEpochs.nonEmpty

  /** Takedown PURGE for a committed epoch stream — the enforcement
    * half of [[graft.ext.TrainingData.emitTakedownReport]]'s answer
    * (the report says which blocks/epochs a deleted doc touched; this
    * removes its rows from the sink): rewrite ONLY the epoch
    * partitions that actually hold rows matching `ids` on `idCol`,
    * through the tmp-then-rename swap every store delete uses, and
    * leave every other epoch's files (and ALL commit markers — the
    * epochs stay durable, their content is REDACTED, not replayed)
    * untouched. Returns the ascending ids of rewritten epochs.
    *
    * The ids are eagerly materialized first (the self-reference
    * hazard: an id set derived from the sink's own rows must not
    * re-evaluate mid-rewrite). Cost: one scan per epoch to detect
    * hits + one rewrite per AFFECTED epoch — a takedown touching k of
    * n epochs pays k rewrites, never n.
    *
    * Swap discipline — stricter than the stores' delete-then-rename,
    * because a SINK partition cannot be rebuilt from a source: the
    * redacted rows land in `.purge_<k>`, the live partition renames
    * ASIDE to `.old_<k>`, the redacted dir renames into place, and
    * only then does the old dir delete. A crash in the residual
    * window (between the two renames) leaves the epoch's rows fully
    * recoverable on disk in `.old_<k>` — never silently lost under a
    * still-standing commit marker; re-running the purge after such a
    * crash fails loud on the leftover dot-dirs rather than guessing.
    */
  /** Recovery gate for [[purgeIds]], callable at the entry of any
    * composed flow (e.g. [[graft.ext.Takedown.takedownEndToEnd]])
    * BEFORE other surfaces mutate: fail loud if an interrupted purge
    * left `.old_*`/`.purge_*` recovery dirs under the sink root. The
    * check is whole-root, not per-epoch-on-hit — a crash between the
    * two renames leaves NO live partition (dataEpochs skips the epoch,
    * a per-epoch check never runs), and a crash after the swap leaves
    * the UN-redacted rows in `.old_<k>` with a re-run seeing no hits;
    * both windows must surface with the recovery instruction rather
    * than read as a clean sink.
    */
  def requireNoInterruptedPurge(): Unit = {
    val f = fs
    val root = new HPath(path)
    if (f.exists(root)) {
      val leftover = f.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith(".old_") || n.startsWith(".purge_"))
      require(leftover.isEmpty,
        s"purge: leftover ${leftover.sorted.mkString(", ")} under $path " +
          "from an interrupted purge — recover first (rename .old_<k> " +
          "back to batch_id=<k> if the live partition is missing, else " +
          "delete the .old_/.purge_ leftovers) before retrying")
    }
  }

  def purgeIds(spark: org.apache.spark.sql.SparkSession, idCol: String,
      ids: DataFrame): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    val f = fs
    requireNoInterruptedPurge()
    val del = ids.select(col(ids.columns.head).as("__del_id"))
      .distinct().localCheckpoint()
    dataEpochs.filter { k =>
      val part = s"$path/batch_id=$k"
      val cur = spark.read.parquet(part)
      val hit = cur.join(
        org.apache.spark.sql.functions.broadcast(del),
        cur(idCol) === del("__del_id"), "left_semi")
      if (hit.isEmpty) false
      else {
        // leftover .purge_/.old_ dirs are impossible here: the
        // whole-root requireNoInterruptedPurge() at entry already
        // failed loud on any, and within this (single-writer) run each
        // epoch is visited once with its dot-dirs deleted before return
        val tmp = new HPath(path, s".purge_$k")
        val old = new HPath(path, s".old_$k")
        cur.join(org.apache.spark.sql.functions.broadcast(del),
            cur(idCol) === del("__del_id"), "left_anti")
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val curPath = new HPath(part)
        require(f.rename(curPath, old), s"purge: could not set aside $curPath")
        require(f.rename(tmp, curPath), s"purge: could not swap in $tmp")
        require(f.delete(old, true), s"purge: could not drop $old")
        true
      }
    }
  }
}

/** S8 — console preview (ETL_pipeline.py:352,364). */
object ConsoleSink {
  def show(df: DataFrame, n: Int = 30): Unit = df.show(n, truncate = false)
}
