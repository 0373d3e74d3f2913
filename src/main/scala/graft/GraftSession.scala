package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session builder encoding the engine's tuning defaults —
  * what a deployment would put in spark-defaults, collected here so
  * local runs, tests, and docs agree:
  *
  * - AQE on with coalescing + skew-join splitting (Spark 4 defaults,
  *   pinned explicitly because the engine's join shapes rely on them);
  * - shuffle partitions sized to the parallelism (the 200 default is
  *   wrong in both directions: too many for local runs, too few for a
  *   1000-executor cluster — callers pass the real figure);
  * - broadcast threshold raised to 64 MB: the engine's dimension
  *   tables (keyword dictionaries, band/bucket maps) are far below
  *   this, and a missed broadcast on a 100 TB fact side costs a full
  *   shuffle;
  * - UTC session timezone (date-from-filename semantics must not
  *   depend on cluster locale).
  */
object GraftSession {

  /** The tuning profile, as data (assertable, greppable). */
  def tuningConfigs(parallelism: Int): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> parallelism.toString,
    "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024 * 1024).toString,
    // scan split size pinned (not inherited): 128 MB input splits keep
    // a 100 TB scan at ~800k tasks and one split comfortably inside a
    // few-GB executor even after decode inflation
    "spark.sql.files.maxPartitionBytes" -> (128 * 1024 * 1024).toString,
    // zstd output: ~25-30% smaller than snappy at comparable CPU — at
    // 100 TB that is tens of TB of storage and shuffle-read bytes
    "spark.sql.parquet.compression.codec" -> "zstd",
    // bucketed scans report their on-disk sortBy order to the planner
    // (single-file buckets only — the Bucketed.writeBucketed layout),
    // which is what makes coLocatedJoin zero-Exchange AND zero-Sort.
    // Pinned here, not mutated inside the join builder: planning is
    // lazy, so a set-and-restore around construction would see the
    // restored value at plan time (ADVICE r9 — the conf is a session
    // profile decision, like every other pin in this map)
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  /** Production streaming profile: RocksDB-backed state store. The
    * default HDFSBackedStateStoreProvider keeps every key's state on
    * the executor HEAP — at 100 TB/day key cardinality that is an OOM,
    * not a tuning problem; RocksDB spills state to local disk with
    * incremental checkpointing. Not the local/test default (tiny state,
    * JNI startup cost); a deployment merges this into its conf. The
    * stateful operators are provider-agnostic — pinned by the RocksDB
    * case in StreamingGateSpec.
    */
  val rocksDbStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def builder(parallelism: Int, appName: String = "graft"): SparkSession.Builder =
    tuningConfigs(parallelism).foldLeft(
      SparkSession.builder().appName(appName)) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Local session at the given core count (tests, benchmarks). */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = builder(cores, appName)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
}
