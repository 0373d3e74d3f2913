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
  * didn't change.
  */
object CorpusPipeline {

  /** Prepare `df` for training: returns one row per SURVIVING document
    * — (id, lang_pred, quality, n_tokens, split_bucket, split).
    */
  def prepare(df: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String], minQuality: Double): DataFrame = {
    val text: Column = col(textCol)
    // stage 1: row-local gates (no shuffle)
    val kept = TextAnalysis.langId(df, textCol)
      .withColumn("quality", TextAnalysis.qualityScore(text))
      .filter(col("lang_pred").isin(allowedLangs: _*) &&
        col("quality") >= minQuality)
    // stage 2: exact dedup over survivors (digest shuffle). Cached:
    // the near-dup stage (shingle collapse), the cluster universe,
    // the final survivor join and the split all consume this frame —
    // uncached, each re-runs the scan + gates + digest shuffle
    val exact = Dedup.exactDedupSurvivors(kept, idCol, textCol).cache()
    // stage 3: near-dup clusters over exact survivors; keep each
    // cluster's min-id representative (singletons keep themselves)
    val reps = Dedup.nearDupClusters(
        exact.select(col(idCol).as("id")),
        Dedup.minhashDedupEdges(exact, idCol, textCol))
      .filter(col("id") === col("cluster"))
      .select(col("id").as(idCol))
    val survivors = exact.join(reps, Seq(idCol), "left_semi")
    // stage 4: stable hash split on the id
    TrainingData.withSplit(survivors, col(idCol))
      .select(col(idCol), col("lang_pred"), col("quality"),
        size(TextAnalysis.tokens(text)).as("n_tokens"),
        col("split_bucket"), col("split"))
  }
}
