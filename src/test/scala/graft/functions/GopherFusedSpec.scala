package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** [[GopherEvidenceExpr]] / [[FingerprintExpr]] /
  * [[RepeatedNgramRatioExpr]] — the one-pass walks that replaced the
  * interpreted HOF compositions (r19): pins value-identity to the
  * legacy Column forms on adversarial strings and the sf0.001
  * documents table.
  */
class GopherFusedSpec extends SparkSpec {
  private lazy val testImplicits = spark.implicits
  import testImplicits._

  /** The exact pre-r19 Column compositions, kept as the reference. */
  private def legacyGopher(df: DataFrame): DataFrame = {
    val t = col("text")
    val ws = split(t, " ")
    val nWords = F.size(ws).cast("long")
    val charSum = aggregate(transform(ws, w => F.length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nAlpha = F.size(F.filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long")
    val nHash = (F.length(t) - F.length(replace(t, lit("#"), lit("")))).cast("long")
    val nEll = ((F.length(t) - F.length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long")
    val gopherStops = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    val nStops = gopherStops
      .map(s => array_contains(ws, s).cast("long")).reduce(_ + _)
    val t2 = greatest(nWords - 1, lit(0L))
    val grams = transform(sequence(lit(0), greatest(t2, lit(1L)).cast("int") - 1),
      i => concat_ws(" ", try_element_at(ws, i + 1), try_element_at(ws, i + 2)))
    val d2 = when(t2 <= 0, lit(0L))
      .otherwise(F.size(array_distinct(grams)).cast("long"))
    df.select(col("doc_id"), nWords.as("n_words"), charSum.as("char_sum"),
      nAlpha.as("n_alpha"), (nHash + nEll).as("n_sym"),
      nStops.as("n_stops"), t2.as("t2"), d2.as("d2"))
  }

  private def legacyFingerprint(t: Column): Column = {
    import graft.ext.HashDefs
    val tok60 = (c: Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    aggregate(
      transform(split(t, " "), x => tok60(x) % lit(HashDefs.TokenMod)),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(HashDefs.FpMod))
  }

  private def legacyRepeated(t: Column, n: Int): Column = {
    val toks = split(t, " ")
    val total = F.size(toks) - (n - 1)
    val grams = transform(sequence(lit(0), greatest(total, lit(1)) - 1),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(total <= 0, lit(0.0)).otherwise(
      lit(1.0) - F.size(array_distinct(grams)).cast("double")
        / total.cast("double"))
  }

  private val adversarial: Seq[Option[String]] = Seq(
    Some(""), Some(" "), Some("   "), Some("one"), Some("one two"),
    Some("one two three"), Some("a a a a a a"),
    Some("the be to of and that have with"),
    Some("the the be be"),                  // presence, not counts
    Some("x.y ... .... ..... ......x #tag ##"),
    Some("héllo wörld 中文 😀 ascii"),
    Some("rep rep rep rep gram gram"),
    Some(("the quick brown fox jumps " * 20).trim),
    Some("trailing space "), Some(" leading"),
    Some("double  space"),
    None)

  test("gopher evidence is value-identical to the legacy form") {
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val e = GopherFunctions.gopher_evidence(col("text"))
    val got = df.select(col("doc_id"), e.getField("n_words").as("n_words"),
      e.getField("char_sum").as("char_sum"), e.getField("n_alpha").as("n_alpha"),
      e.getField("n_sym").as("n_sym"), e.getField("n_stops").as("n_stops"),
      greatest(e.getField("t2"), lit(0L)).as("t2"),
      coalesce(e.getField("d2"), lit(0L)).as("d2"))
    rowSet(got) shouldBe rowSet(legacyGopher(df))
  }

  test("fingerprint and repeated-ngram ratio match the legacy forms") {
    val df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"),
      round(graft.ext.TextAnalysis.repeatedNgramRatio(col("text"), 3), 6).as("r3"),
      round(graft.ext.TextAnalysis.repeatedNgramRatio(col("text"), 2), 6).as("r2"))
    val want = df.select(col("doc_id"),
      legacyFingerprint(col("text")).as("fp"),
      round(legacyRepeated(col("text"), 3), 6).as("r3"),
      round(legacyRepeated(col("text"), 2), 6).as("r2"))
    rowSet(got) shouldBe rowSet(want)
  }

  test("non-blank segment count matches the legacy split/trim form") {
    val cases = Seq(
      Some(""), Some(" "), Some("\n\n"), Some("\n\n\n"), Some("a"),
      Some("a\n\nb"), Some("a\n\n\n\nb"), Some(" \n\n "), Some("\t\n\n\t"),
      Some("lead\n\n"), Some("\n\ntail"), Some("中文\n\n段落 😀"),
      Some("one\n\n  \n\ntwo\n\nthree   "), Some("\n"), None)
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def legacy(sep: String) =
      F.size(F.filter(split(col("text"), java.util.regex.Pattern.quote(sep)),
        p => F.length(trim(p)) > 0))
    val got = df.select(col("doc_id"),
      GopherFunctions.non_blank_segment_count(col("text"), "\n\n").as("a"),
      GopherFunctions.non_blank_segment_count(col("text"), "\n").as("b"),
      legacy("\n\n").as("la"), legacy("\n").as("lb")).collect()
    got.foreach { r =>
      withClue(s"doc ${r.getLong(0)}\n") {
        r.get(1) shouldBe r.get(3)
        r.get(2) shouldBe r.get(4)
      }
    }
    // and on real data, incl. the paragraph-synth boilerplate shape
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text", concat_ws("\n\n", col("text"), col("text")))
    val real = docs.select(
      GopherFunctions.non_blank_segment_count(col("text"), "\n\n").as("a"),
      legacy("\n\n").as("la")).collect()
    real.foreach(r => r.get(0) shouldBe r.get(1))
  }

  test("all three match legacy on the sf0.001 documents table") {
    val df = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val e = GopherFunctions.gopher_evidence(col("text"))
    val got = df.select(col("doc_id"), e.getField("n_words").as("n_words"),
      e.getField("char_sum").as("char_sum"), e.getField("n_alpha").as("n_alpha"),
      e.getField("n_sym").as("n_sym"), e.getField("n_stops").as("n_stops"),
      greatest(e.getField("t2"), lit(0L)).as("t2"),
      coalesce(e.getField("d2"), lit(0L)).as("d2"),
      graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"),
      round(graft.ext.TextAnalysis.repeatedNgramRatio(col("text"), 3), 6).as("r3"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val want = legacyGopher(df)
      .join(df.select(col("doc_id"),
        legacyFingerprint(col("text")).as("fp"),
        round(legacyRepeated(col("text"), 3), 6).as("r3")), Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (id, g) =>
      withClue(s"doc $id\n") { g shouldBe want(id) }
    }
  }
}
