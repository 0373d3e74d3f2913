package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation — the training-data north star as ONE
  * composable call: language gate → quality gate → exact dedup →
  * near-dup (MinHash+LSH) dedup → split assignment. Every stage is an
  * existing gated operator; this is the composition a user of the
  * engine actually runs before tokenization, and it is itself
  * oracle-gated end-to-end (q_corpus_prepare replays all five stages
  * in SQL).
  *
  * Stage ORDER is the 100 TB design:
  *  1. row-local gates first (lang-ID + quality are zero-shuffle
  *     projections — they drop the junk fraction before anything
  *     shuffles);
  *  2. exact dedup second (one digest shuffle over survivors; web
  *     corpora are 30-50% byte-identical, so this collapses the
  *     input to the expensive stage);
  *  3. near-dup LSH third (band equi-join over what remains);
  *  4. split LAST, so train/valid/test membership is stable under
  *     re-preparation — the split key is the document id, not
  *     anything the earlier stages computed.
  *
  * Keeping the near-dup rep = the CLUSTER MIN ID (the
  * [[Dedup.nearDupClusters]] label) makes the survivor set
  * deterministic and layout-independent — re-running preparation on a
  * grown corpus keeps the same representatives wherever clusters
  * didn't change. The opt-in [[SurvivorPolicy.Ranked]] policy instead
  * keeps each neighborhood's [[GraphRank.pagerankMicro]] local maxima
  * — the documents the neighborhood clusters around — at the cost of
  * the rank iteration's 2-shuffles-per-round; only the survivor
  * CHOICE moves, never which documents count as near-duplicates
  * (spec-pinned in CorpusPipelineSpec).
  */
object CorpusPipeline {

  /** Which document survives a near-dup neighborhood. */
  sealed trait SurvivorPolicy
  object SurvivorPolicy {
    /** Each connected cluster keeps its MIN-ID member (the
      * [[Dedup.nearDupClusters]] label) — one survivor per cluster,
      * zero extra passes. The default.
      */
    case object MinId extends SurvivorPolicy
    /** Each neighborhood keeps its [[GraphRank.pagerankSurvivors]]
      * local rank maxima — graph-centrality canonicals (a cluster
      * with several dense cores keeps one per core).
      */
    case object Ranked extends SurvivorPolicy
  }

  /** Prepare `df` for training: returns one row per SURVIVING document
    * — (id, lang_pred, quality, n_tokens, split_bucket, split).
    */
  def prepare(df: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String], minQuality: Double,
      survivorPolicy: SurvivorPolicy = SurvivorPolicy.MinId): DataFrame = {
    val text: Column = col(textCol)
    // stage 1: row-local gates (no shuffle) — the survivor
    // attributes (lang, quality, token count) are ALSO row-local, so
    // they are computed here and carried through the collapse join
    // rather than re-derived from a second corpus scan at the end
    val kept = TextAnalysis.langId(df, textCol)
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .filter(col("lang_pred").isin(allowedLangs: _*) &&
        col("quality") >= minQuality)
      .withColumn("n_tokens", size(TextAnalysis.tokens(text)))
    // stages 2+3 fused over ONE digest+shingle scan: the exact-dedup
    // winners ARE the collapse representatives (min id per distinct
    // text), and the near-dup stage consumes exactly those documents'
    // shingle sets — round 5 paid the md5 scan twice, once in
    // exactDedupSurvivors and again inside minhashDedupEdges' own
    // collapse. Mode is Always (not Auto): exact-dup removal is this
    // pipeline's CONTRACT, not a performance heuristic, so the
    // collapse must run even when duplicates are rare. The carry
    // makes the collapse's cached join the ONLY pass over the text:
    // every downstream frame (pairs, clusters, final projection)
    // reads the cache, never the corpus.
    val collapse = Dedup.collapsedShingleSets(kept, idCol, textCol,
      HashDefs.ShingleN, Dedup.CollapseMode.Always,
      carry = Seq("lang_pred", "quality", "n_tokens"))
    // stage 3: near-dup survivors over exact survivors — both
    // policies consume the SAME pair graph (only the survivor choice
    // differs): min-id keeps each cluster's label member, ranked
    // keeps each neighborhood's integer-PageRank local maxima.
    // Duplicate-cluster star edges are unnecessary here: the members
    // they would connect are exactly the losers stage 2 removes.
    val pairs = Dedup.minhashRepPairs(collapse.repSets, minJaccard = 0.5)
      .select("id_a", "id_b")
    val reps = survivorPolicy match {
      case SurvivorPolicy.MinId =>
        Dedup.nearDupClusters(collapse.repSets.select(col("id")), pairs)
          .filter(col("id") === col("cluster"))
          .select("id")
      case SurvivorPolicy.Ranked =>
        GraphRank.pagerankSurvivors(collapse.repSets.select(col("id")), pairs)
          .select("id")
    }
    val survivors = collapse.repAttrs.get.join(reps, Seq("id"), "left_semi")
    // stage 4: stable hash split on the id
    TrainingData.withSplit(survivors, col("id"))
      .select(col("id").as(idCol), col("lang_pred"), col("quality"),
        col("n_tokens"), col("split_bucket"), col("split"))
  }

  /** Stage-by-stage FUNNEL accounting of [[prepare]] — the report a
    * corpus-construction run publishes next to its output: documents
    * and whitespace tokens surviving each stage (input → lang gate →
    * quality gate → exact dedup → near-dup survivors), as exact
    * integer counts so the report itself is oracle-checkable. This is
    * the number the data team actually argues about ("the near-dup
    * stage ate 12% of our tokens — at which threshold?"). Cost: ONE
    * cached scoring pass feeds the three gate-stage aggregations (the
    * count/sum rows are map-side combinable over it), plus the
    * [[prepare]] run itself for the near-dup stage — the funnel is a
    * report you produce WITH the preparation run, not a free rider on
    * it.
    * The exact-dedup stage keeps the min-id winner per digest — the
    * same rule [[prepare]]'s collapse applies — so funnel counts
    * match what prepare ships.
    */
  def prepareFunnel(df: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String], minQuality: Double,
      survivorPolicy: SurvivorPolicy = SurvivorPolicy.MinId): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val text: Column = col(textCol)
    // cached: the lang-ID + quality scoring chain is the expensive
    // row-local half and feeds the lang/quality/exact stage rows —
    // uncached, each stage aggregation would re-score the corpus
    val scored = TextAnalysis.langId(df, textCol)
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .withColumn("__nt", size(TextAnalysis.tokens(text)).cast("long"))
      .cache()
    val langKept = scored.filter(col("lang_pred").isin(allowedLangs: _*))
    val kept = langKept.filter(col("quality") >= minQuality)
    val exact = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy(md5(text)).orderBy(col(idCol))))
      .filter(col("__rn") === 1)
    val survivors = prepare(df, idCol, textCol, allowedLangs, minQuality,
      survivorPolicy)
    def stat(stage: String, ord: Int, f: DataFrame, nt: Column): DataFrame =
      f.agg(count(lit(1)).as("docs"),
          coalesce(sum(nt), lit(0L)).as("tokens"))
        .select(lit(stage).as("stage"), lit(ord).as("stage_order"),
          col("docs"), col("tokens"))
    stat("input", 0, df, size(TextAnalysis.tokens(text)).cast("long"))
      .unionByName(stat("lang_gate", 1, langKept, col("__nt")))
      .unionByName(stat("quality_gate", 2, kept, col("__nt")))
      .unionByName(stat("exact_dedup", 3, exact, col("__nt")))
      .unionByName(stat("near_dup", 4, survivors,
        col("n_tokens").cast("long")))
  }
}
