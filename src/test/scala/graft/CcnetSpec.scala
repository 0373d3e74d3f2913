package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style bucketing: tercile semantics on a hand-built
  * two-language corpus, the exact-integer fluency currency, and
  * layout determinism of both the rank-based and threshold faces.
  */
class CcnetSpec extends SparkSpec {
  import spark.implicits._

  // six docs per language; within each language, fluency is driven by
  // how many times the doc repeats its language's common token (more
  // repeats of a corpus-frequent token = higher avg ln(freq) = head)
  private def corpus: DataFrame = {
    val en = (1 to 6).map(i =>
      (i.toLong, (Seq.fill(i)("the") ++ Seq("x" + i)).mkString(" ")))
    val de = (1 to 6).map(i =>
      (10L + i, (Seq.fill(i)("der") ++ Seq("y" + i)).mkString(" ")))
    (en ++ de).toDF("doc_id", "text")
  }

  private def buckets(df: DataFrame): Map[Long, (String, String)] =
    df.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(4))).toMap

  test("terciles split each language into head/middle/tail by fluency") {
    val out = TextAnalysis.ccnetBuckets(corpus, "doc_id", "text")
      .withColumnRenamed("id", "doc_id").orderBy("doc_id")
    val m = buckets(out)
    // language assignment comes from the marker words
    (1L to 6L).foreach(i => m(i)._1 shouldBe "en")
    (11L to 16L).foreach(i => m(i)._1 shouldBe "de")
    // doc 6 repeats "the" most → head; doc 1 least → tail; 6 docs per
    // language = exactly 2 per tercile
    Seq(6L, 5L).map(m(_)._2) shouldBe Seq("head", "head")
    Seq(4L, 3L).map(m(_)._2) shouldBe Seq("middle", "middle")
    Seq(2L, 1L).map(m(_)._2) shouldBe Seq("tail", "tail")
    Seq(16L, 15L).map(m(_)._2) shouldBe Seq("head", "head")
    Seq(12L, 11L).map(m(_)._2) shouldBe Seq("tail", "tail")
  }

  test("threshold face agrees with rank terciles away from boundaries") {
    val rank = buckets(TextAnalysis.ccnetBuckets(corpus, "doc_id", "text")
      .withColumnRenamed("id", "doc_id"))
    val thr = buckets(TextAnalysis
      .ccnetBucketsThresh(corpus, "doc_id", "text")
      .withColumnRenamed("id", "doc_id"))
    // the clear head and clear tail agree on both faces; only
    // interpolated boundary docs may differ by design
    Seq(6L, 16L).foreach(i => thr(i)._2 shouldBe rank(i)._2)
    Seq(1L, 11L).foreach(i => thr(i)._2 shouldBe rank(i)._2)
  }

  test("persisted cuts serve the same buckets as in-plan calibration") {
    val tmp = java.nio.file.Files.createTempDirectory("ccnet-store").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val inPlan = TextAnalysis.ccnetBucketsThresh(corpus, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val dir = graft.io.IndexStore.ensureCcnetCuts(corpus, tmp)
    val served = TextAnalysis.ccnetBucketsWithCuts(corpus, "doc_id", "text",
        graft.io.IndexStore.readCcnetCuts(spark, dir))
      .collect().map(_.toSeq).toSet
    served shouldBe inPlan
  }

  test("fluency is exact-integer and layout-deterministic") {
    def rows(df: DataFrame): Seq[Seq[Any]] =
      TextAnalysis.ccnetFluency(df, "doc_id", "text")
        .select("id", "lang_pred", "n_tok", "lp_sum_micro")
        .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    rows(corpus.repartition(7)) shouldBe rows(corpus)
    // hand-check one doc: doc 1 = "the x1"; corpus freq of "the" = 21
    // (1+2+..+6), of "x1" = 1 → lp_micro = round(ln(21)*1e6) + 0
    val d1 = rows(corpus).find(_.head == 1L).get
    d1(2) shouldBe 2L
    d1(3) shouldBe math.round(math.log(21.0) * 1e6)
  }
}
