package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text-analysis operator semantics: token counts, ratios, language
  * ID argmax, order-sensitive fingerprinting, hash bounds.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokenCountWs: whitespace tokens") {
    singleValue(one("a bb ccc").select(
      TextAnalysis.tokenCountWs(col("text")))) shouldBe 3
    singleValue(one("single").select(
      TextAnalysis.tokenCountWs(col("text")))) shouldBe 1
  }

  test("tokenCountBpe: alpha runs, single digits, punctuation") {
    // "ab12, c!" → ab, 1, 2, ",", c, "!" = 6
    singleValue(one("ab12, c!").select(
      TextAnalysis.tokenCountBpe(col("text")))) shouldBe 6
  }

  test("stopwordRatio and punctRatio on known text") {
    // "the cat is on a mat!" → 7 tokens ("mat!" is not a stopword token);
    // stopwords: the, is, on, a = 4... tokens: the,cat,is,on,a,mat! → 6 tokens, 4 stop
    val t = "the cat is on a mat!"
    singleValue(one(t).select(round(
      TextAnalysis.stopwordRatio(col("text")), 6))) shouldBe
      (4.0 / 6.0 * 1e6).round / 1e6
    // punct: '!' of 20 chars
    singleValue(one(t).select(round(
      TextAnalysis.punctRatio(col("text")), 6))) shouldBe
      (1.0 / 20.0 * 1e6).round / 1e6
  }

  test("meanTokenLen: (chars - separators) / tokens") {
    // "ab cd" → (5 - 1) / 2 = 2.0
    singleValue(one("ab cd").select(
      TextAnalysis.meanTokenLen(col("text")))) shouldBe 2.0
  }

  test("qualityScore stays within [0, 1]") {
    val texts = Seq("", "a", "the " * 200, "x!@#$%", "normal text of the day")
      .toDF("text")
    val bad = texts.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1)
    bad.count() shouldBe 0L
  }

  test("langId: marker-word argmax, first language wins ties") {
    val df = Seq(
      (1L, "the house of the rising sun is here"),  // en
      (2L, "der hund und die katze ist hier"),      // de
      (3L, "el perro y los gatos es aqui"),         // es — 'y' and 'es' markers
      (4L, "nothing matching at all")               // all-zero → en (first)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "text").select("doc_id", "lang_pred")
    rowSet(out) shouldBe Set(
      Seq(1L, "en"), Seq(2L, "de"), Seq(3L, "es"), Seq(4L, "en"))
  }

  test("fingerprint: order-sensitive, deterministic, bounded") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    fps(1L) shouldBe fps(3L)
    fps(1L) should not be fps(2L)
    fps.values.foreach { v =>
      v should be >= 0L
      v should be < HashDefs.FpMod
    }
  }

  test("tokenHash60: stable 60-bit non-negative hash, distinct across tokens") {
    val df = Seq("alpha", "beta", "alpha").toDF("t")
      .select(TextAnalysis.tokenHash60(col("t")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    hs(0) shouldBe hs(2)
    hs(0) should not be hs(1)
    hs.foreach { h =>
      h should be >= 0L
      h should be < (1L << 60)
    }
  }
}
