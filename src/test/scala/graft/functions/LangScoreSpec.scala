package graft.functions

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** [[ScoredTextExpr]] — the one-pass lang/stopword/token/quality
  * scorer that replaced the interpreted `size(filter(split(...)))`
  * lambda composition in langId / qualityScore / stopwordRatio /
  * CorpusPipeline's gate pass (r19): pins BIT-exact equivalence to
  * the legacy Column form on adversarial strings (unicode, empty
  * tokens, trailing spaces, overlap words, ties, nulls) and that the
  * marker tables stay in sync with [[TextAnalysis.langMarkers]].
  */
class LangScoreSpec extends SparkSpec {
  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** The exact pre-r19 Column composition, kept as the reference. */
  private def legacyScored(df: DataFrame): DataFrame = {
    val text = col("text")
    val ws = split(text, " ")
    def inList(t: Column, words: Seq[String]): Column =
      words.map(w => t === w).reduce(_ || _)
    val scored = TextAnalysis.langMarkers.foldLeft(df) {
      case (d, (lang, markers)) =>
        d.withColumn(s"score_$lang", F.size(F.filter(ws, t => inList(t, markers))))
    }
    val scores = TextAnalysis.langMarkers.map { case (lang, _) => col(s"score_$lang") }
    val best = greatest(scores: _*)
    val pred = TextAnalysis.langMarkers.foldLeft(null.asInstanceOf[Column]) {
      case (null, (lang, _)) => when(col(s"score_$lang") === best, lang)
      case (acc, (lang, _))  => acc.when(col(s"score_$lang") === best, lang)
    }
    val stopWords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    val stop = F.size(F.filter(ws, t => inList(t, stopWords))).cast("double") /
      greatest(F.size(ws), lit(1)).cast("double")
    val punct = TextStatsFunctions.non_alnum_count(text).cast("double") /
      greatest(F.length(text), lit(1)).cast("double")
    val lenScore = least(F.length(text).cast("double") / lit(500.0), lit(1.0))
    val quality = round(lit(0.5) * lenScore + lit(0.25) * (lit(1.0) - punct) +
      lit(0.25) * least(stop * lit(5.0), lit(1.0)), 6)
    scored.withColumn("lang_pred", pred)
      .withColumn("quality", quality)
      .withColumn("n_tokens", F.size(ws))
      .withColumn("stop_ratio", round(stop, 6))
  }

  private def fusedScored(df: DataFrame): DataFrame = {
    val lid = TextAnalysis.langId(df, "text")
    lid.withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tokens",
        LangScoreFunctions.scored_text(col("text")).getField("n_tokens"))
      .withColumn("stop_ratio", round(TextAnalysis.stopwordRatio(col("text")), 6))
  }

  private val adversarial: Seq[Option[String]] = Seq(
    Some(""), Some(" "), Some("  "), Some("a"), Some("a "), Some(" a"),
    Some("the the the"), Some("der und ist das die"),
    Some("le la les et est"),            // fr markers; le also zh
    Some("de shi zai le wo"),            // zh markers; de also de-lang
    Some("el los las y es"),             // es markers; es also fr "est"? no — exact words only
    Some("is it of and a to in for on the"), // all stopwords
    Some("tie es le"),                   // cross-language tie
    Some("héllo wörld 中文 文本 emoji 😀 mixed"),
    Some("tabs\tand\nnewlinesform\ffeed\rcarriage"),
    Some("punct!!! ??? ,,, ;;; ***"),
    Some("x" * 499), Some("x" * 500), Some("x" * 501),
    Some(("the quick brown fox " * 30).trim),
    Some("a b"),                    // non-breaking space is NOT a split char
    Some("multi  spaces   between    tokens"),
    Some("trailing spaces   "),
    None)

  test("fused scorer is value-identical to the legacy Column form") {
    val df = adversarial.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val cols = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" } ++
      Seq("lang_pred", "quality", "n_tokens", "stop_ratio")
    val legacy = legacyScored(df).select("doc_id", cols: _*).collect()
      .sortBy(_.getLong(0))
    val fused = fusedScored(df).select("doc_id", cols: _*).collect()
      .sortBy(_.getLong(0))
    legacy.length shouldBe fused.length
    legacy.zip(fused).foreach { case (l, f) =>
      withClue(s"doc ${l.getLong(0)}: legacy=$l fused=$f\n") {
        l.toSeq shouldBe f.toSeq // exact, incl. double bit values via equals
      }
    }
  }

  test("fused scorer matches legacy on the sf0.001 documents table") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val cols = TextAnalysis.langMarkers.map { case (l, _) => s"score_$l" } ++
      Seq("lang_pred", "quality", "n_tokens", "stop_ratio")
    val legacy = legacyScored(df).select("doc_id", cols: _*).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val fused = fusedScored(df).select("doc_id", cols: _*).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    fused.keySet shouldBe legacy.keySet
    fused.foreach { case (id, f) =>
      withClue(s"doc $id\n") { f shouldBe legacy(id) }
    }
  }

  test("teacherLabel stays identical to the legacy stop-count form") {
    val df = (adversarial ++ Seq(
      Some(("the and of " * 20) + ("z" * 150)),  // len≥200, stops≥5
      Some("the and of is it " + ("z" * 200)),   // exactly 5 stopwords
      Some("the and of is " + ("z" * 200))       // 4 stopwords -> 0
    )).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val stopWords = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    def inList(t: Column, words: Seq[String]): Column =
      words.map(w => t === w).reduce(_ || _)
    val legacy = (F.length(col("text")) >= 200 &&
      F.size(F.filter(split(col("text"), " "), t => inList(t, stopWords))) >= 5)
      .cast("int")
    val got = df.select(col("doc_id"),
      graft.ext.QualityModel.teacherLabel(col("text")).as("y"),
      legacy.as("y_legacy")).collect()
    got.foreach { r =>
      withClue(s"doc ${r.getLong(0)}\n") {
        r.get(1) shouldBe r.get(2)
      }
    }
  }

  test("marker tables stay in sync with TextAnalysis") {
    LangScore.langs.toSeq shouldBe TextAnalysis.langMarkers.map(_._1)
    LangScore.markers.map(_.toSeq).toSeq shouldBe
      TextAnalysis.langMarkers.map(_._2)
    LangScore.stopwords.toSeq shouldBe
      Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  }
}
