package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass scorer for the corpus-prep row-local gates: the marker-word
  * language scores, stopword count, whitespace token count, `lang_pred`
  * and the composite `quality` — all from a SINGLE walk over the UTF-8
  * bytes.
  *
  * The composed Column form it replaces evaluated
  * `size(filter(split(text, " "), t => t IN (...)))` once per language
  * AND once per `greatest()` operand inside every CASE branch of the
  * argmax — up to ~30 interpreted-lambda evaluations per row, each
  * materializing the split array (the corpus_prepare plans carried 8
  * `lambdafunction`s; the CASE expansion multiplies them at eval time).
  * Guide §4: hot row-local logic belongs in one codegen'd expression.
  *
  * Value-identical by construction (pinned in LangScoreSpec +
  * PropertySpec-style equivalence, and every consuming face is
  * oracle-hash-gated):
  *  - tokens = `split(text, " ")` semantics (single-space regex, limit
  *    -1, trailing empties kept) ⇒ token count = spaces + 1; every
  *    marker/stopword is ≤ 3 ASCII bytes, so only 1-3-byte tokens can
  *    match, and byte-packed keys never collide with tokens containing
  *    multi-byte codepoints (their unrecorded bytes read as zero, and
  *    no table word has a zero byte);
  *  - char/punct counts are the same codepoint walk as
  *    [[TextStats.nonAlnumCount]] / `length()`;
  *  - `quality` replays the exact Catalyst double ops:
  *    `round(0.5*least(len/500.0, 1.0) + 0.25*(1.0 - punct/max(len,1))
  *    + 0.25*least(stop/max(ntok,1)*5.0, 1.0), 6)` with Spark's
  *    HALF_UP `BigDecimal.valueOf` rounding (NaN/Inf passthrough, same
  *    as RoundBase's codegen);
  *  - `lang_pred` is the same first-language-wins argmax as the
  *    when-chain over `greatest`.
  */
object LangScore {

  /** Marker lists and stopwords — MUST stay in sync with
    * [[graft.ext.TextAnalysis.langMarkers]] / `.stopwords` (asserted at
    * class-load in TextAnalysis and spec-pinned).
    */
  val langs: Array[String] = Array("en", "de", "es", "fr", "zh")
  val markers: Array[Array[String]] = Array(
    Array("the", "a", "of", "and", "is"),
    Array("der", "die", "das", "und", "ist"),
    Array("el", "los", "las", "y", "es"),
    Array("le", "la", "les", "et", "est"),
    Array("de", "shi", "zai", "le", "wo"))
  val stopwords: Array[String] = Array(
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)

  /** Open-addressed int→int table: key = b0 | b1<<8 | b2<<16 | len<<24
    * (all words are 1-3 ASCII bytes), value = flag bits (bit L for
    * language L, bit 5 = stopword). Power-of-two size with linear
    * probing; key 0 is impossible (len ≥ 1 ⇒ high byte ≥ 1).
    */
  private val TableSize = 128
  private val keysT = new Array[Int](TableSize)
  private val flagsT = new Array[Int](TableSize)

  private def keyOf(w: String): Int = {
    require(w.length >= 1 && w.length <= 3 && w.forall(_ < 0x80),
      s"marker/stopword must be 1-3 ASCII chars: '$w'")
    var k = w.length << 24
    var i = 0
    while (i < w.length) { k |= (w.charAt(i).toInt << (8 * i)); i += 1 }
    k
  }

  private def put(w: String, bit: Int): Unit = {
    val k = keyOf(w)
    var i = k & (TableSize - 1)
    while (keysT(i) != 0 && keysT(i) != k) i = (i + 1) & (TableSize - 1)
    keysT(i) = k
    flagsT(i) = flagsT(i) | (1 << bit)
  }

  {
    var l = 0
    while (l < markers.length) {
      markers(l).foreach(put(_, l))
      l += 1
    }
    stopwords.foreach(put(_, 5))
  }

  @inline private def flagsOf(k: Int): Int = {
    var i = k & (TableSize - 1)
    while (true) {
      val kk = keysT(i)
      if (kk == k) return flagsT(i)
      if (kk == 0) return 0
      i = (i + 1) & (TableSize - 1)
    }
    0
  }

  val schema: StructType = StructType(
    langs.map(l => StructField(s"score_$l", IntegerType, nullable = false))
      ++ Seq(
        StructField("stop_cnt", IntegerType, nullable = false),
        StructField("n_tokens", IntegerType, nullable = false),
        StructField("lang_pred", StringType, nullable = false),
        StructField("quality", DoubleType, nullable = false)))

  /** The single-pass scorer. Returns
    * (score_en..score_zh, stop_cnt, n_tokens, lang_pred, quality).
    */
  def scoredText(t: UTF8String): InternalRow = {
    val n = t.numBytes
    var i = 0
    var spaces = 0
    var chars = 0
    var punct = 0L
    var s0, s1, s2, s3, s4, stop = 0
    var tokLen = 0
    var key = 0
    @inline def closeToken(): Unit = {
      if (tokLen >= 1 && tokLen <= 3) {
        val f = flagsOf(key | (tokLen << 24))
        if (f != 0) {
          if ((f & 1) != 0) s0 += 1
          if ((f & 2) != 0) s1 += 1
          if ((f & 4) != 0) s2 += 1
          if ((f & 8) != 0) s3 += 1
          if ((f & 16) != 0) s4 += 1
          if ((f & 32) != 0) stop += 1
        }
      }
      tokLen = 0
      key = 0
    }
    while (i < n) {
      val b = t.getByte(i) & 0xff
      if (b < 0x80) {
        chars += 1
        if (b == ' ') {
          spaces += 1
          closeToken()
        } else {
          if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
                (b >= '0' && b <= '9') || b == '\t' || b == '\n' ||
                b == 0x0b || b == '\f' || b == '\r')) punct += 1
          if (tokLen < 3) key |= b << (8 * tokLen)
          tokLen += 1
        }
        i += 1
      } else {
        // multi-byte codepoint: one char, one punct match, and the
        // token can no longer equal any ASCII table word (its bytes
        // stay unrecorded = zero, and no table word has a zero byte)
        chars += 1
        punct += 1
        tokLen += 1
        i += UTF8String.numBytesForFirstByte(t.getByte(i))
      }
    }
    closeToken()
    val nTokens = spaces + 1
    // argmax, first language in declared order wins ties — identical
    // to the when(score === greatest(...)) chain
    var best = s0
    if (s1 > best) best = s1
    if (s2 > best) best = s2
    if (s3 > best) best = s3
    if (s4 > best) best = s4
    val pred =
      if (s0 == best) langU8(0)
      else if (s1 == best) langU8(1)
      else if (s2 == best) langU8(2)
      else if (s3 == best) langU8(3)
      else langU8(4)
    // quality: the exact IEEE op sequence of the Column form
    val lenScore = Math.min(chars.toDouble / 500.0, 1.0)
    val punctR = punct.toDouble / Math.max(chars, 1).toDouble
    val stopR = stop.toDouble / Math.max(nTokens, 1).toDouble
    val q0 = 0.5 * lenScore + 0.25 * (1.0 - punctR) +
      0.25 * Math.min(stopR * 5.0, 1.0)
    val quality =
      if (java.lang.Double.isNaN(q0) || java.lang.Double.isInfinite(q0)) q0
      else java.math.BigDecimal.valueOf(q0)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s0, s1, s2, s3, s4, stop, nTokens, pred, quality))
  }
}

/** The one-pass text scorer as a codegen'd expression returning
  * struct<score_en..score_zh int, stop_cnt int, n_tokens int,
  * lang_pred string, quality double>.
  */
case class ScoredTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangScore.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"scored_text needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    LangScore.scoredText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangScore.scoredText($c)")

  override protected def withNewChildInternal(newChild: Expression): ScoredTextExpr =
    copy(child = newChild)
}

object LangScoreFunctions {
  /** One-pass lang/stopword/token/quality scores of `text`. */
  def scored_text(text: Column): Column =
    GraftColumnBridge.column(ScoredTextExpr(
      GraftColumnBridge.expression(text)))
}
