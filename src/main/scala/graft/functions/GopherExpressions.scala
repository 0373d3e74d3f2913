package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass replacements for the remaining interpreted-lambda
  * row-local text operators (guide §4, VERDICT r19 sweep): the Gopher
  * rule evidence, the rolling document fingerprint, and the
  * repeated-n-gram ratio. Each was a composition of higher-order array
  * lambdas (`transform`/`aggregate`/`filter` are CodegenFallback:
  * interpreted, per-element Column-tree evaluation) plus per-token
  * regex (`rlike`) or `array_distinct` over freshly-allocated gram
  * strings — measured 4.7 s noop at sf0.1 for q_gopher_rules alone
  * against a 0.13 s count() bench face (the count prunes the evidence
  * columns; the oracle dump and the streaming gopher gate pay full
  * price).
  *
  * Value-identical by construction, spec-pinned in GopherFusedSpec
  * against the legacy Column compositions (and every consuming face is
  * oracle-hash-gated):
  *  - `split(text, " ")` semantics (limit -1, trailing empties kept);
  *  - char counts are code points (`numChars`/`codePointCount`), so
  *    supplementary-plane chars count once like Spark's `length`;
  *  - the `n_sym` ellipsis count replays `replace(t, "...", "")`'s
  *    left-to-right non-overlapping scan (a run of d dots yields d/3);
  *  - the fingerprint reuses [[TextHashing.hash60]] — the same md5
  *    formula the Column form computed via conv(substring(md5)).
  */
object GopherSupport {

  private val gopherStops: Array[String] = Array(
    "the", "be", "to", "of", "and", "that", "have", "with")

  val evidenceSchema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_stops", LongType, nullable = false),
    StructField("t2", LongType, nullable = false),
    StructField("d2", LongType, nullable = false)))

  /** (n_words, char_sum, n_alpha, n_sym, n_stops, t2, d2) in one walk:
    * word count, summed token char lengths, tokens containing an ASCII
    * letter, '#' chars + non-overlapping "..." runs, distinct Gopher
    * stopword hits (presence, not counts — the array_contains form),
    * bigram total and distinct-bigram count.
    */
  def evidence(t: UTF8String): InternalRow = {
    val s = t.toString
    val tokens = s.split(" ", -1)
    val nWords = tokens.length.toLong
    var charSum = 0L
    var nAlpha = 0L
    var stopsMask = 0
    var i = 0
    while (i < tokens.length) {
      val tok = tokens(i)
      charSum += tok.codePointCount(0, tok.length)
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < tok.length) {
        val c = tok.charAt(j)
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      if (tok.length >= 2 && tok.length <= 4) {
        var k = 0
        while (k < gopherStops.length) {
          if (tok == gopherStops(k)) stopsMask |= (1 << k)
          k += 1
        }
      }
      i += 1
    }
    // symbol evidence over the raw string: '#' chars plus d/3 per run
    // of d consecutive '.' (replace(t, "...", "")'s non-overlap scan)
    var nSym = 0L
    var dotRun = 0
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') dotRun += 1
      else {
        nSym += dotRun / 3
        dotRun = 0
        if (c == '#') nSym += 1
      }
      i += 1
    }
    nSym += dotRun / 3
    val nStops = java.lang.Integer.bitCount(stopsMask).toLong
    val t2 = math.max(nWords - 1, 0L)
    val d2 =
      if (t2 <= 0) 0L
      else {
        val seen = new java.util.HashSet[String]()
        val sb = new java.lang.StringBuilder()
        i = 0
        while (i < tokens.length - 1) {
          sb.setLength(0)
          sb.append(tokens(i)).append(' ').append(tokens(i + 1))
          seen.add(sb.toString)
          i += 1
        }
        seen.size.toLong
      }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, charSum, nAlpha, nSym, nStops, t2, d2))
  }

  /** Rolling polynomial fingerprint:
    * fold `h := (h*31 + hash60(tok) % TokenMod) % FpMod` in token
    * order (empty tokens included, like the transform it replaces).
    */
  def fingerprint(t: UTF8String): Long = {
    import graft.ext.HashDefs.{FpMod, TokenMod}
    val tokens = t.toString.split(" ", -1)
    var h = 0L
    var i = 0
    while (i < tokens.length) {
      h = (h * 31L + TextHashing.hash60(tokens(i)) % TokenMod) % FpMod
      i += 1
    }
    h
  }

  /** Fraction of duplicated word n-grams: 0.0 when fewer than n
    * tokens, else `1.0 - distinct/total` over the stride-1 n-gram
    * strings (space-joined, string-distinct — the
    * `array_distinct(transform(sequence...))` form).
    */
  def repeatedNgramRatio(t: UTF8String, n: Int): Double = {
    val tokens = t.toString.split(" ", -1)
    val total = tokens.length - (n - 1)
    if (total <= 0) 0.0
    else {
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < total) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(tokens(i + k))
          k += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      1.0 - seen.size.toDouble / total.toDouble
    }
  }
}

/** Count of non-blank segments between literal `sep` occurrences —
  * the fused twin of `size(filter(split(text, quote(sep)), p =>
  * length(trim(p)) > 0))`: Java-split left-to-right non-overlapping
  * literal boundaries (limit -1, trailing empties kept), a segment
  * counts when it has any byte ≠ 0x20 (Spark's `trim` removes only
  * spaces, so a paragraph of tabs/newlines is non-blank — replicated).
  */
object SegmentCountSupport {
  def nonBlankSegments(t: UTF8String, sepBytes: Array[Byte]): Int = {
    val n = t.numBytes
    val m = sepBytes.length
    var i = 0
    var nonBlank = false
    var cnt = 0
    while (i < n) {
      var isSep = i + m <= n
      var j = 0
      while (isSep && j < m) {
        if (t.getByte(i + j) != sepBytes(j)) isSep = false
        j += 1
      }
      if (isSep) {
        if (nonBlank) cnt += 1
        nonBlank = false
        i += m
      } else {
        if (t.getByte(i) != ' ') nonBlank = true
        i += 1
      }
    }
    if (nonBlank) cnt += 1
    cnt
  }
}

/** Non-blank-segment count as one codegen'd expression — see
  * [[SegmentCountSupport.nonBlankSegments]].
  */
case class NonBlankSegmentCountExpr(child: Expression, sep: String)
    extends UnaryExpression {

  require(sep.nonEmpty, "non_blank_segment_count needs a non-empty sep")

  private lazy val sepBytes =
    sep.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"non_blank_segment_count needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SegmentCountSupport.nonBlankSegments(
      input.asInstanceOf[UTF8String], sepBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SegmentCountSupport.nonBlankSegments($c, $sepRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NonBlankSegmentCountExpr =
    copy(child = newChild)
}

/** Gopher rule evidence as one codegen'd expression returning
  * struct<n_words..d2 bigint> — see [[GopherSupport.evidence]].
  */
case class GopherEvidenceExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherSupport.evidenceSchema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gopher_evidence needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    GopherSupport.evidence(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherSupport.evidence($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherEvidenceExpr =
    copy(child = newChild)
}

/** Rolling polynomial document fingerprint as one codegen'd
  * expression — see [[GopherSupport.fingerprint]].
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"doc_fingerprint needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    GopherSupport.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherSupport.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** Repeated word-n-gram ratio as one codegen'd expression — see
  * [[GopherSupport.repeatedNgramRatio]].
  */
case class RepeatedNgramRatioExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repeated_ngram_ratio needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    GopherSupport.repeatedNgramRatio(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherSupport.repeatedNgramRatio($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): RepeatedNgramRatioExpr =
    copy(child = newChild)
}

object GopherFunctions {
  /** Gopher evidence struct of `text`. */
  def gopher_evidence(text: Column): Column =
    GraftColumnBridge.column(GopherEvidenceExpr(
      GraftColumnBridge.expression(text)))

  /** Rolling polynomial fingerprint of `text`. */
  def doc_fingerprint(text: Column): Column =
    GraftColumnBridge.column(FingerprintExpr(
      GraftColumnBridge.expression(text)))

  /** Repeated word-n-gram ratio of `text`. */
  def repeated_ngram_ratio(text: Column, n: Int): Column =
    GraftColumnBridge.column(RepeatedNgramRatioExpr(
      GraftColumnBridge.expression(text), n))

  /** Count of non-blank segments of `text` under literal `sep`. */
  def non_blank_segment_count(text: Column, sep: String): Column =
    GraftColumnBridge.column(NonBlankSegmentCountExpr(
      GraftColumnBridge.expression(text), sep))
}
