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
  */
final case class EpochParquetSink(path: String) extends Sink {
  override def write(df: DataFrame): Unit = {
    require(df.columns.contains("batch_id"),
      "EpochParquetSink needs a batch_id column to key the epoch partition")
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
  }

  /** True when epoch `batchId`'s partition holds COMMITTED data files
    * — the replay guard: a crashed first attempt leaves no part files
    * (the parquet committer stages under _temporary), so false means
    * "recompute and write", true means "this epoch's output is already
    * durable, keep it".
    */
  def committed(batchId: Long): Boolean = {
    val part = new java.io.File(path, s"batch_id=$batchId")
    val files = part.listFiles()
    files != null && files.exists(f =>
      f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
  }

  /** True when ANY epoch has committed — distinguishes "no admitted
    * rows ever" (a valid empty result) from a readable sink.
    */
  def anyCommitted: Boolean = {
    val dirs = new java.io.File(path).listFiles()
    dirs != null && dirs.exists(d =>
      d.getName.startsWith("batch_id=") &&
        committed(d.getName.stripPrefix("batch_id=").toLong))
  }
}

/** S8 — console preview (ETL_pipeline.py:352,364). */
object ConsoleSink {
  def show(df: DataFrame, n: Int = 30): Unit = df.show(n, truncate = false)
}
