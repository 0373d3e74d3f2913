package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{EpochParquetSink, IndexStore}

/** The composed right-to-be-forgotten cycle: every surface deleted,
  * the audit proven from post-state reads, live content untouched,
  * crash windows failing loud before anything mutates.
  */
class TakedownSpec extends SparkSpec {
  import spark.implicits._

  private def tempDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-td").toFile
    d.deleteOnExit()
    d
  }

  /** Six docs: 1 and 4 are the takedown set; doc 1 shares its second
    * paragraph with live doc 2 (the shared-paragraph policy edge);
    * doc 6 is a two-word doc (empty shingle set — no band rows).
    */
  private def corpus: DataFrame = Seq(
    (1L, "alpha beta gamma delta epsilon\n\nshared boilerplate footer paragraph here"),
    (2L, "omega psi chi phi upsilon tau\n\nshared boilerplate footer paragraph here"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "red orange yellow green blue indigo violet again and again"),
    (5L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
    (6L, "tiny doc")).toDF("doc_id", "text")

  private def stage(): (String, String, EpochParquetSink, DataFrame) = {
    val root = tempDir().getAbsolutePath
    val admDir = s"$root/adm"
    val fuzzyDir = s"$root/fuzzy"
    IndexStore.writeAdmissionIndexes(corpus, admDir)
    IndexStore.writeParagraphFuzzyIndex(corpus, fuzzyDir)
    val sink = EpochParquetSink(s"$root/sink")
    // two epochs; ids 1,2,3 in epoch 0 and 3,4,5,6 in epoch 1 (doc 3
    // straddles — multi-epoch rows per id work too)
    sink.writeEpoch(Seq((1L, 5), (2L, 6), (3L, 4)).toDF("doc_id", "n_tok"), 0L)
    sink.writeEpoch(Seq((3L, 6), (4L, 10), (5L, 10), (6L, 2))
      .toDF("doc_id", "n_tok"), 1L)
    (admDir, fuzzyDir, sink, corpus)
  }

  test("takedownEndToEnd: per-id audit proves presence before and " +
      "absence after on every surface; live content survives") {
    val (admDir, fuzzyDir, sink, c) = stage()
    val audit = Takedown.takedownEndToEnd(c, Seq(1L, 4L).toDF("id"),
        "doc_id", "text", admDir, fuzzyDir, sink)
      .orderBy("doc_id").collect()
    audit.map(_.getLong(0)).toSeq shouldBe Seq(1L, 4L)
    val byId = audit.map(r => r.getLong(0) -> r).toMap
    // befores: non-vacuous on every surface
    val r1 = byId(1L)
    r1.getAs[Long]("adm_sets_before") shouldBe 1L
    r1.getAs[Long]("adm_bands_before") shouldBe graft.ext.HashDefs.Bands.toLong
    r1.getAs[Long]("fuzzy_paras_before") shouldBe 2L // two paragraphs
    r1.getAs[Long]("sink_pieces_before") shouldBe 1L
    r1.getAs[Long]("sink_tokens_before") shouldBe 5L
    r1.getAs[Long]("epochs_touched") shouldBe 1L
    val r4 = byId(4L)
    r4.getAs[Long]("fuzzy_paras_before") shouldBe 1L
    r4.getAs[Long]("sink_pieces_before") shouldBe 1L
    // afters: zero on every surface, for every requested id
    audit.foreach { r =>
      r.getAs[Long]("adm_sets_after") shouldBe 0L
      r.getAs[Long]("adm_bands_after") shouldBe 0L
      r.getAs[Long]("fuzzy_paras_after") shouldBe 0L
      r.getAs[Long]("sink_pieces_after") shouldBe 0L
    }
    // live content survives every surface: admission rows for live ids
    spark.read.parquet(s"$admDir/${IndexStore.ShingleSetsTable}")
      .select("id").as[Long].collect().toSet shouldBe Set(2L, 3L, 5L, 6L)
    // the digest/span rungs are RETAINED (that delete's stated policy)
    spark.read.parquet(s"$admDir/${IndexStore.DigestsTable}")
      .count() shouldBe 6L
    // fuzzy store: doc 1's SHARED paragraph hash is gone too (content-
    // keyed delete — the documented policy), doc 2's unique para stays
    val sharedH = singleValue(corpus.filter(col("doc_id") === 2L)
      .select(TextAnalysis.tokenHash60(
        split(col("text"), "\n\n").getItem(1)))).asInstanceOf[Long]
    val liveHashes = IndexStore.readParagraphHashes(spark, fuzzyDir)
      .as[Long].collect().toSet
    liveHashes should not contain sharedH
    liveHashes.size shouldBe 4 // paras of docs 2(first),3,5,6
    // sink: live rows intact, markers intact, purged ids gone
    val sinkRows = spark.read.parquet(sink.path)
    sinkRows.count() shouldBe 5L // (2),(3) in epoch 0; (3),(5),(6) in 1
    rowSet(sinkRows.select("doc_id")) shouldBe
      Set(Seq(2L), Seq(3L), Seq(5L), Seq(6L))
    sink.committedEpochs shouldBe Seq(0L, 1L)
  }

  test("takedownEndToEnd: ids the corpus never held audit as all-zero " +
      "rows, and nothing mutates") {
    val (admDir, fuzzyDir, sink, c) = stage()
    val audit = Takedown.takedownEndToEnd(c, Seq(99L).toDF("id"),
      "doc_id", "text", admDir, fuzzyDir, sink).collect()
    audit.length shouldBe 1
    audit.head.toSeq.tail.foreach(_ shouldBe 0L)
    spark.read.parquet(sink.path).count() shouldBe 7L
    spark.read.parquet(s"$admDir/${IndexStore.ShingleSetsTable}")
      .count() shouldBe 6L
    // 7 distinct paragraph hashes: docs 1/2 share one footer para
    IndexStore.readParagraphHashes(spark, fuzzyDir).count() shouldBe 7L
  }

  test("takedownEndToEnd: an interrupted earlier sink purge fails the " +
      "cycle LOUD before any store delete runs") {
    val (admDir, fuzzyDir, sink, c) = stage()
    new java.io.File(sink.path, ".old_0").mkdirs()
    val e = intercept[IllegalArgumentException] {
      Takedown.takedownEndToEnd(c, Seq(1L).toDF("id"),
        "doc_id", "text", admDir, fuzzyDir, sink)
    }
    e.getMessage should include(".old_0")
    // the stores were NOT touched — the gate ran before the deletes
    spark.read.parquet(s"$admDir/${IndexStore.ShingleSetsTable}")
      .count() shouldBe 6L
    IndexStore.readParagraphHashes(spark, fuzzyDir).count() shouldBe 7L
  }
}
