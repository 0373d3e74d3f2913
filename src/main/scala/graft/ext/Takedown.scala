package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{EpochParquetSink, IndexStore}

/** COMPOSED right-to-be-forgotten takedown — one operator, one
  * replayable answer.
  *
  * The pieces all exist separately — admission-store delete
  * ([[graft.io.IndexStore.deleteFromAdmissionIndexes]]), fuzzy
  * paragraph-store delete
  * ([[graft.io.IndexStore.deleteFromParagraphFuzzyIndex]]), committed
  * epoch purge ([[graft.io.EpochParquetSink.purgeIds]]), blast-radius
  * report ([[TrainingData.emitTakedownReport]]) — but a compliance
  * audit wants ONE answer, not four: given request ids, delete from
  * every surface and return a per-id audit proving, from post-state
  * reads, that the id is gone from EVERY one of them. That is what
  * [[Takedown.takedownEndToEnd]] is.
  *
  * No reference-repo equivalent (the reference has no takedown
  * surface); the composition is the GDPR/right-to-be-forgotten shape
  * a production corpus operator runs.
  */
object Takedown {

  /** Run the full takedown cycle and return the per-id audit.
    *
    * Steps, in order: (1) probe every surface for the ids' PRE-delete
    * footprint, eagerly materialized (the probes must observe the
    * state the deletes are about to destroy — the same self-reference
    * hazard every store delete documents); (2) delete the ids from
    * the admission store (shingle_sets + band_index; the id-free
    * exact-hash rungs stay, by that delete's stated policy), delete
    * the ids' PARAGRAPH HASHES from the fuzzy paragraph store (its
    * key is content, not documents), and purge the ids' rows from the
    * committed epoch sink (k-of-n partition rewrite, markers intact);
    * (3) probe every surface again and assemble one row per id.
    *
    * Output, one row per distinct request id (including ids the
    * corpus never held — all-zero rows; a takedown request must be
    * answerable for ids you never had):
    * {{{
    * (idCol,
    *  adm_sets_before,  adm_sets_after,   -- shingle_sets rows
    *  adm_bands_before, adm_bands_after,  -- band_index rows
    *  fuzzy_paras_before, fuzzy_paras_after, -- doc's distinct para
    *                                          -- hashes present in store
    *  sink_pieces_before, sink_pieces_after, -- sink rows on idCol
    *  sink_tokens_before,                    -- their token sum
    *  epochs_touched)                        -- distinct epochs purged
    * }}}
    * Every `*_after` is 0 when the cycle worked — the audit PROVES it
    * from re-reads, it does not assume it.
    *
    * Shape at scale: the request-id set is takedown-sized (broadcast
    * everywhere); each probe is one store-table scan with a
    * broadcast semi-join + map-side-combinable count; the purge pays
    * one detect scan per epoch and one rewrite per AFFECTED epoch.
    * Nothing here scans the corpus text except the paragraph-hash
    * projection of the REQUESTED docs.
    *
    * Shared-paragraph caveat (the fuzzy delete's documented policy):
    * deleting by content hash also un-blocks paragraphs the requested
    * docs share with live docs — `fuzzy_paras_after` counts the
    * REQUESTED docs' hashes still present, which post-delete is 0
    * regardless of sharing.
    */
  def takedownEndToEnd(corpus: DataFrame, ids: DataFrame, idCol: String,
      textCol: String, admissionDir: String, fuzzyDir: String,
      sink: EpochParquetSink, sep: String = "\n\n"): DataFrame = {
    val spark = corpus.sparkSession
    // recovery gate FIRST — an interrupted earlier purge must fail the
    // cycle before the store deletes run, or the surfaces end up
    // mutated inconsistently (stores deleted, sink blocked)
    sink.requireNoInterruptedPurge()
    val del = ids.select(col(ids.columns.head).as("__id"))
      .distinct().localCheckpoint()

    // the requested docs' paragraph hashes — the fuzzy store's key
    val delParas = Dedup.paragraphRows(
        corpus.join(broadcast(del), corpus(idCol) === del("__id"),
          "left_semi"),
        idCol, textCol, sep)
      .select(col("id").as("__id"),
        TextAnalysis.tokenHash60(col("para")).as("h"))
      .distinct().localCheckpoint()

    def idCount(rows: DataFrame, name: String): DataFrame =
      rows.join(broadcast(del), rows("id") === del("__id"), "left_semi")
        .groupBy(col("id").as("__id")).agg(count(lit(1)).as(name))

    def admProbe(suffix: String): DataFrame =
      del
        .join(idCount(IndexStore.readShingleSets(spark, admissionDir),
          s"adm_sets_$suffix"), Seq("__id"), "left")
        .join(idCount(IndexStore.readBandIndex(spark, admissionDir),
          s"adm_bands_$suffix"), Seq("__id"), "left")
        .na.fill(0L)
        .localCheckpoint()

    def fuzzyProbe(suffix: String): DataFrame =
      del
        .join(delParas
            .join(IndexStore.readParagraphHashes(spark, fuzzyDir),
              Seq("h"), "left_semi")
            .groupBy("__id")
            .agg(count(lit(1)).as(s"fuzzy_paras_$suffix")),
          Seq("__id"), "left")
        .na.fill(0L)
        .localCheckpoint()

    def sinkProbe(suffix: String): DataFrame = {
      val agg =
        if (!sink.hasData)
          del.limit(0).withColumn(s"sink_pieces_$suffix", lit(0L))
            .withColumn(s"sink_tokens_$suffix", lit(0L))
            .withColumn(s"epochs_$suffix", lit(0L))
        else {
          val rows = spark.read.parquet(sink.path)
          rows.join(broadcast(del), rows(idCol) === del("__id"),
              "left_semi")
            .groupBy(col(idCol).as("__id"))
            .agg(count(lit(1)).as(s"sink_pieces_$suffix"),
              sum(col("n_tok").cast("long")).as(s"sink_tokens_$suffix"),
              countDistinct(col("batch_id").cast("long"))
                .as(s"epochs_$suffix"))
        }
      del.join(agg, Seq("__id"), "left").na.fill(0L).localCheckpoint()
    }

    // (1) PRE-delete footprint, materialized before anything mutates
    val admB = admProbe("before")
    val fuzzyB = fuzzyProbe("before")
    val sinkB = sinkProbe("before")

    // (2) every surface
    IndexStore.deleteFromAdmissionIndexes(del, admissionDir)
    IndexStore.deleteFromParagraphFuzzyIndex(delParas.select("h"), fuzzyDir)
    sink.purgeIds(spark, idCol, del)

    // (3) POST-delete re-reads — the proof
    val admA = admProbe("after")
    val fuzzyA = fuzzyProbe("after")
    val sinkA = sinkProbe("after")

    admB.join(admA, Seq("__id"))
      .join(fuzzyB, Seq("__id")).join(fuzzyA, Seq("__id"))
      .join(sinkB, Seq("__id")).join(sinkA, Seq("__id"))
      .select(col("__id").as(idCol),
        col("adm_sets_before"), col("adm_sets_after"),
        col("adm_bands_before"), col("adm_bands_after"),
        col("fuzzy_paras_before"), col("fuzzy_paras_after"),
        col("sink_pieces_before"), col("sink_pieces_after"),
        col("sink_tokens_before"),
        col("epochs_before").as("epochs_touched"))
  }
}
