package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.UnicodeFunctions.nfc_normalize

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    UnicodeNorm.nfc(UTF8String.fromString(s)).toString

  test("nfc composes canonical sequences; precomposed is a fixpoint") {
    // explicit escapes, not literal glyphs - an editor or terminal
    // that silently pre-composes would make glyph assertions vacuous
    nfc("a\u0301") shouldBe "\u00e1" // a + COMBINING ACUTE -> precomposed
    nfc("\u00e1") shouldBe "\u00e1" // precomposed fixpoint
    nfc(nfc("e\u0301 plus ascii")) shouldBe nfc("e\u0301 plus ascii")
    nfc("A\u030a") shouldBe "\u00c5" // A + ring above
    // compatibility (NFKC-only) sequences are NOT touched by NFC
    nfc("\ufb01") shouldBe "\ufb01" // fi ligature survives
  }

  test("ascii fast path returns the input object untouched") {
    val in = UTF8String.fromString("plain ascii text, already nfc")
    UnicodeNorm.nfc(in) should be theSameInstanceAs in
  }

  test("expression: null-safe, codegen'd, dedup digests converge after nfc") {
    // one decomposed and one precomposed spelling of the same text
    val df = Seq("a\u0301b", null, "\u00e1b").toDF("t")
    val out = df.select(nfc_normalize(col("t")).as("n"))
    out.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)) shouldBe
      Array("\u00e1b", null, "\u00e1b")
    // the point of the pass: both encodings digest identically after it
    df.filter(col("t").isNotNull)
      .select(md5(nfc_normalize(col("t"))).as("d"))
      .distinct().count() shouldBe 1
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val plan = docs.select(nfc_normalize(col("text")))
      .queryExecution.executedPlan.toString
    plan should include("*(1) Project [nfcnormalizeexpr")
  }
}
