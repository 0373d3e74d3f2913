package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Merge
import graft.queries.{CoreQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-operator registries; each entry has an
  * equivalent DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (then it is covered by ScalaTest golden tests,
  * SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship: the full Customer-360 interaction profile (SURVEY.md
    * §3.1) re-targeted onto the events table, with the reference's
    * final Total_ column renames (ETL_pipeline.py:292-294).
    */
  def entry(spark: SparkSession): DataFrame =
    Merge.renameWithPrefix(
      CoreQueries.customer360(spark, "/root/testdata/sf0.001"),
      Seq("acquisition", "commerce", "content", "engagement"),
      "Total_")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data extension operators (dedup / similarity / text
    * analysis / multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql
}
