package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.Row

/** Gopher rule table: hand-computed evidence and per-rule verdicts,
  * including the degenerate one-word document.
  */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(texts: (Long, String)*): Map[Long, Row] =
    TextAnalysis.gopherRules(
        texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-computed evidence columns") {
    // 60 words: 58 distinct fillers + "the" + "of", all alphabetic,
    // 4-char mean, no symbols, no repeated bigram
    val good = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
      .mkString(" ")
    val m = rules(1L -> good)
    val r = m(1L)
    r.getLong(1) shouldBe 60L // n_words
    r.getLong(3) shouldBe 60L // n_alpha_words
    r.getLong(4) shouldBe 0L // n_sym
    r.getLong(5) shouldBe 2L // n_stop_hits: the, of
    r.getLong(6) shouldBe 59L // bigram_total
    r.getLong(7) shouldBe 59L // bigram_distinct
    (8 to 14).foreach(i => r.getBoolean(i) shouldBe true) // all rules + pass
  }

  test("each rule fails on its targeted violation") {
    val base = ((1 to 58).map(i => f"word$i%02d") ++ Seq("the", "of"))
    val short = "the of word" // < 50 words
    val longWords = ((1 to 58).map(i => "w" * 20 + i) ++ Seq("the", "of"))
      .mkString(" ") // mean len > 10
    val numeric = ((1 to 58).map(_.toString) ++ Seq("the", "of"))
      .mkString(" ") // alpha fraction 2/60 < 0.8
    val symbols = (base.take(53) ++ Seq.fill(7)("#")).mkString(" ") // 7#/60 > 0.1
    val noStops = (1 to 60).map(i => f"word$i%02d").mkString(" ")
    val repeated = (Seq.fill(30)(Seq("dup", "pair")).flatten).mkString(" ")
    val m = rules(1L -> short, 2L -> longWords, 3L -> numeric,
      4L -> symbols, 5L -> noStops, 6L -> repeated)
    m(1L).getBoolean(8) shouldBe false // r_wordcount
    m(2L).getBoolean(9) shouldBe false // r_meanlen
    m(3L).getBoolean(10) shouldBe false // r_alpha
    m(4L).getBoolean(11) shouldBe false // r_symbol
    m(5L).getBoolean(12) shouldBe false // r_stops
    m(6L).getBoolean(13) shouldBe false // r_rep2 (59 bigrams, 2 distinct)
    m.values.foreach(_.getBoolean(14) shouldBe false) // pass
  }

  test("one-word and empty-ish docs don't blow up the bigram branch") {
    val m = rules(1L -> "solo", 2L -> "")
    m(1L).getLong(6) shouldBe 0L // bigram_total
    m(1L).getLong(7) shouldBe 0L
    m(2L).getLong(1) shouldBe 1L // split("") = [""] — one empty token
  }
}
