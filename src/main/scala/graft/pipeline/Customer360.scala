package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{Sink, Sources}
import graft.ops.{Behavior, Interaction, Merge}
import graft.schema.Schemas

/** The reference's full batch pipeline (ETL_pipeline.py:235-366
  * `main()`), re-expressed as one declarative Spark job per branch:
  * interaction (daily JSON viewing logs → customer profile), behavior
  * (daily Parquet search logs → keyword trend), merge + load.
  *
  * Differences from the reference, all deliberate (SURVEY.md §1.4/§4):
  * - the per-file read/union/cache loop (:251-260, :322-326) is a
  *   single multi-path scan;
  * - schemas are pinned, not inferred;
  * - the mapping dim join is explicitly broadcast;
  * - the zip-join offers the deterministic variant for testing; the
  *   faithful `monotonically_increasing_id` form remains available;
  * - empty input raises a real exception (the reference's
  *   `RaiseException` NameError crash-bug, :262-264/:308-310).
  */
object Customer360 {

  /** Config constants of ETL_pipeline.py:213-233, minus Azure
    * credentials (sinks are injected as [[graft.io.Sink]]).
    */
  final case class Config(
      logContentDir: String,
      logSearchDir: String,
      mappingPath: String,
      interactionStart: Int = 20220401,
      interactionEnd: Int = 20220430,
      behaviorStart: Int = 20220601,
      behaviorEnd: Int = 20220713,
      limit: Int = 250,
      deterministic: Boolean = true)

  /** §3.1 — interaction branch: JSON day files → per-contract profile
    * (fused single-pass plan; quantile segmentation keeps the
    * reference's two-job collect-to-literal shape).
    */
  def interactionBranch(spark: SparkSession, cfg: Config): DataFrame = {
    val raw = Sources.readLogContent(
      spark, cfg.logContentDir, cfg.interactionStart, cfg.interactionEnd)
      .filter(col("Contract").isNotNull) // PERMISSIVE corrupt rows
    val categories = Interaction.referenceCategoryMap.values.toSeq.distinct.sorted
    val profile = Interaction.fusedProfile(
      raw, Interaction.referenceCategoryMap, categories)
    val full = Interaction.customerType(
      Interaction.customerTaste(
        Interaction.mostWatch(profile, categories), categories),
      categories, exactQuantiles = cfg.deterministic)
    Merge.renameWithPrefix(full, categories, "Total_")
  }

  /** §3.2 — behavior branch: Parquet day folders → per-user trending
    * keywords with category transitions.
    */
  def behaviorBranch(spark: SparkSession, cfg: Config): DataFrame = {
    val mapping = Sources.readCsv(spark, Schemas.mapping, cfg.mappingPath)
      .dropDuplicates("search") // A7 — 1:1 lookup, arbitrary survivor
    val raw = Sources.readLogSearch(
      spark, cfg.logSearchDir, cfg.behaviorStart, cfg.behaviorEnd)
      .select(month(to_date(col("datetime"))).as("month"),
        col("user_id"), col("keyword"))
    val most = Behavior.mostSearchedKeyword(
      Behavior.filterSearch(raw), deterministic = cfg.deterministic)
    val joined = Behavior.monthlySplitJoin(most, 6, 7, limit = Some(cfg.limit))
    Behavior.previous(Behavior.trendingType(
      Behavior.searchCategory(joined, mapping)))
  }

  /** §3.3 — merge the branches row-wise and load. */
  def run(spark: SparkSession, cfg: Config, sink: Sink): DataFrame = {
    val interaction = interactionBranch(spark, cfg)
    val behavior = behaviorBranch(spark, cfg)
    val merged =
      if (cfg.deterministic)
        Merge.zipJoinDeterministic(
          interaction, Seq(col("Contract")),
          behavior, Seq(col("user_id")),
          limit = Some(cfg.limit))
      else
        Merge.zipJoinFaithful(interaction, behavior, cfg.limit)
    sink.write(merged)
    merged
  }
}
