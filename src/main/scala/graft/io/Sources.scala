package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.1 S1-S5).
  *
  * The reference enumerates daily files on the driver and folds them
  * with a per-file `unionByName` + `cache` loop
  * (ETL_pipeline.py:22-29,251-260,305-326). That loop is an artifact of
  * notebook style, not a semantic: at 100 TB it builds a union plan
  * thousands of nodes deep and re-caches every iteration. We replace it
  * with a single multi-path scan — Spark unions source files natively
  * inside one FileSourceScan, keeping partition counts and locality
  * under the scheduler's control — and derive the per-file date column
  * from the file name inside the scan (`input_file_name()`), so the
  * whole read stays one job with column pruning and predicate pushdown
  * intact.
  *
  * For a production layout we prefer Hive-style `date=YYYYMMDD/`
  * partitioning, where the date range predicate is pruned by Catalyst
  * before any file is opened (PartitionPruning); [[listDatedFiles]]
  * reproduces the reference's flat-directory behavior for parity.
  */
object Sources {

  // Anchored to the final path segment ([^/]* cannot cross a '/'): an
  // 8-digit run elsewhere in the path (bucket names, tmp dirs) must
  // never win over the file's own YYYYMMDD basename.
  private val DatePattern = "(\\d{8})[^/]*$"

  /** S4 — driver-side listing of a flat directory of `YYYYMMDD`-named
    * files/folders, kept when the embedded date falls in
    * `[startDate, endDate]` (both `yyyyMMdd` ints, inclusive).
    * Mirrors ETL_pipeline.py:22-29 (`.json` files) and :305-306 (day
    * folders). Listing is one namenode RPC; the content is never read.
    */
  def listDatedFiles(
      spark: SparkSession,
      dir: String,
      startDate: Int,
      endDate: Int,
      suffix: String = ""): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq
      .map(_.getPath)
      .filter(p => suffix.isEmpty || p.getName.endsWith(suffix))
      .flatMap { p =>
        val base = p.getName.split('.').head
        base.toIntOption.collect {
          case d if d >= startDate && d <= endDate => p.toString
        }
      }
      .sorted
  }

  /** S5 — derive the `Date` column from the `YYYYMMDD` in each row's
    * source file name (ETL_pipeline.py:37-39,255 does this driver-side
    * with a per-file literal; `input_file_name()` keeps it inside the
    * scan so one multi-path read replaces the union loop).
    */
  def withFileDate(df: DataFrame, colName: String = "Date"): DataFrame =
    df.withColumn(
      colName,
      to_date(regexp_extract(input_file_name(), DatePattern, 1), "yyyyMMdd"))

  /** S1 — multi-path JSON scan with pinned schema.
    *
    * The reference wraps each single-file read in try/except → skip
    * (ETL_pipeline.py:30-36). We read PERMISSIVE with a
    * `_corrupt_record` column instead: a bad row (or file) surfaces as
    * data that can be audited, rather than a silently dropped day.
    */
  def readJson(spark: SparkSession, schema: StructType, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no JSON input paths (reference aborts too: ETL_pipeline.py:262-264)")
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(paths: _*)
  }

  /** S2 — multi-path Parquet scan (schema embedded). */
  def readParquet(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no parquet input paths (ETL_pipeline.py:308-310)")
    spark.read.parquet(paths: _*)
  }

  /** S3 — CSV dim with header and pinned schema (ETL_pipeline.py:302). */
  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** ORC scan — the columnar interchange format for Hive-era lakes
    * (the reference's lake is parquet-only; ORC closes the other half
    * of the columnar-lake surface). Same pushdown story as parquet:
    * predicates land in the scan's PushedFilters and unused columns
    * never leave the stripe, so the 100 TB economics are identical.
    */
  def readOrc(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "no ORC input paths")
    spark.read.orc(paths: _*)
  }

  /** Partition-pruned read of a Hive-style `date=YYYYMMDD/` layout
    * (written by [[PartitionedParquetSink]]): the BETWEEN predicate
    * lands in the scan's PartitionFilters, so out-of-range directories
    * are never opened — the scalable replacement for
    * [[listDatedFiles]]' driver-side listing.
    */
  def readDatePartitioned(spark: SparkSession, dir: String,
      startDate: Int, endDate: Int,
      dateCol: String = "date"): DataFrame =
    spark.read.parquet(dir)
      .filter(col(dateCol).between(startDate, endDate))

  /** Binary media ingestion (multimodal pipelines): Spark's
    * `binaryFile` source yields (path, modificationTime, length,
    * content) — the raw-bytes entry point that
    * [[graft.ext.Multimodal]] decodes. `pathGlob` filters at the file
    * index (e.g. `*.jpg`); `maxBytes` guards against a single huge
    * object blowing a task (binary rows don't split).
    */
  def readBinaryFiles(spark: SparkSession, dir: String,
      pathGlob: String = "*", maxBytes: Long = 512L * 1024 * 1024): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .filter(col("length") <= maxBytes)

  /** S1+S5 composed — the reference's whole interaction read
    * (ETL_pipeline.py:243-260) as one scan: list days in range, one
    * multi-path JSON read, flatten the `_source` envelope, inject the
    * file date.
    */
  def readLogContent(
      spark: SparkSession,
      dir: String,
      startDate: Int,
      endDate: Int): DataFrame = {
    val paths = listDatedFiles(spark, dir, startDate, endDate, suffix = ".json")
    val raw = readJson(spark, graft.schema.Schemas.logContent, paths)
    withFileDate(raw).select(col("_source.*"), col("Date"))
  }

  /** S2+S5 composed — the behavior read (ETL_pipeline.py:305-326). */
  def readLogSearch(
      spark: SparkSession,
      dir: String,
      startDate: Int,
      endDate: Int): DataFrame = {
    val paths = listDatedFiles(spark, dir, startDate, endDate)
    readParquet(spark, paths)
  }
}
