package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Code-point discipline shared by the unigram trainer and encoder:
  * segmentation positions are CODE POINT boundaries, never the middle
  * of a surrogate pair. Cutting a pair would emit lone-surrogate
  * pieces, which UTF8String/parquet mangle to '?' — breaking encode
  * losslessness and corrupting a persisted piece table on non-BMP
  * text (emoji, CJK extensions).
  */
object UnigramSeg {

  /** `pos` is a valid cut position in `word`. */
  def isBoundary(word: String, pos: Int): Boolean =
    pos <= 0 || pos >= word.length ||
      !(Character.isHighSurrogate(word.charAt(pos - 1)) &&
        Character.isLowSurrogate(word.charAt(pos)))

  /** [start, end) spans exactly ONE code point — the unit the unk
    * fallback emits (a BMP char, or an atomic surrogate pair).
    */
  def isSingleCodePoint(word: String, start: Int, end: Int): Boolean =
    end - start == 1 ||
      (end - start == 2 && Character.isHighSurrogate(word.charAt(start)) &&
        Character.isLowSurrogate(word.charAt(start + 1)))

  /** The piece string is one code point. */
  def isSingleCodePoint(piece: String): Boolean =
    isSingleCodePoint(piece, 0, piece.length)
}

/** Unigram-LM tokenizer ENCODING support (the SentencePiece encode
  * half): Viterbi segmentation of each word under a trained piece →
  * log-probability table — pick the segmentation maximizing the sum
  * of piece log-probs. Row-local; the table ships once per plan as a
  * compiled reference object, exactly like the BPE rank map
  * ([[BpeEncodeSupport]]).
  */
object UnigramEncodeSupport {

  /** Compiled piece table + the two scalars the DP needs: the longest
    * piece length (bounds the inner loop) and the unknown-character
    * penalty (min trained log-prob minus 10 — any in-vocabulary
    * segmentation beats one through an unknown char, but coverage
    * never fails).
    */
  final class Table(val lp: java.util.HashMap[String, java.lang.Double],
      val maxLen: Int, val unkLp: Double) extends Serializable

  def compile(pieces: Array[String], lps: Array[Double]): Table = {
    require(pieces.length == lps.length && pieces.length > 0,
      "unigram_encode: empty or misaligned piece table")
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var maxLen = 1
    var minLp = Double.MaxValue
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Double.valueOf(lps(i)))
      if (pieces(i).length > maxLen) maxLen = pieces(i).length
      if (lps(i) < minLp) minLp = lps(i)
      i += 1
    }
    new Table(m, maxLen, minLp - 10.0)
  }

  /** Viterbi DP per word (words = space-split, matching training's
    * tokenization). Tie-break: strict `>` with the ending-piece
    * length scanned ascending, so an exact score tie resolves to the
    * SHORTEST final piece — deterministic on any platform, and the
    * same rule the trainer's prune step uses (UnigramTok.viterbi).
    * Cuts only at code-point boundaries; the unk fallback emits one
    * CODE POINT (so a surrogate pair stays atomic — [[UnigramSeg]]).
    */
  def encode(text: UTF8String, t: Table): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val n = word.length
      if (n > 0) {
        val best = new Array[Double](n + 1)
        val back = new Array[Int](n + 1)
        var i = 1
        while (i <= n) {
          best(i) = Double.NegativeInfinity
          if (UnigramSeg.isBoundary(word, i)) {
            // ≥2 so a surrogate-pair unk (l=2, one code point) stays
            // reachable even under a single-char piece table
            val span = if (t.maxLen < 2) 2 else t.maxLen
            val lMax = if (span < i) span else i
            var l = 1
            while (l <= lMax) {
              if (UnigramSeg.isBoundary(word, i - l)) {
                val lp = t.lp.get(word.substring(i - l, i))
                val s =
                  if (lp != null) best(i - l) + lp.doubleValue()
                  else if (UnigramSeg.isSingleCodePoint(word, i - l, i))
                    best(i - l) + t.unkLp
                  else Double.NegativeInfinity
                if (s > best(i)) { best(i) = s; back(i) = l }
              }
              l += 1
            }
          }
          i += 1
        }
        // reconstruct right-to-left, emit left-to-right
        val cuts = new java.util.ArrayList[Integer]()
        var p = n
        while (p > 0) { cuts.add(Integer.valueOf(p)); p -= back(p) }
        var k = cuts.size() - 1
        var start = 0
        while (k >= 0) {
          val end = cuts.get(k).intValue()
          out.add(UTF8String.fromString(word.substring(start, end)))
          start = end
          k -= 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** Subword-regularization SAMPLING (Kudo 2018 §3): draw a
  * segmentation of each word with probability ∝ P(segmentation)^α
  * via forward-filtering backward-sampling over the unigram lattice.
  * α→∞ recovers Viterbi; α<1 flattens toward uniform — the training
  * trick that exposes a model to alternative tokenizations.
  *
  * Randomness is a DETERMINISTIC splitmix64 stream seeded by
  * (seed, word content, word position in the row) — layout- and
  * platform-independent draws, so the sampled corpus is reproducible
  * run-to-run (what the golden oracle and the spec pin) and two
  * identical documents sample identically.
  */
object UnigramSampleSupport {

  private def splitmix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a over the word's UTF-16 units — content-derived seed. */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h = (h ^ s.charAt(i)) * 0x100000001b3L
      i += 1
    }
    h
  }

  def sample(text: UTF8String, t: UnigramEncodeSupport.Table,
      seed: Long, alpha: Double): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[UTF8String]()
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val n = word.length
      if (n > 0) {
        // forward with α-scaled log-probs (unk included, so the
        // lattice always has mass)
        val logA = new Array[Double](n + 1)
        val span = if (t.maxLen < 2) 2 else t.maxLen
        var i = 1
        while (i <= n) {
          logA(i) = Double.NegativeInfinity
          if (UnigramSeg.isBoundary(word, i)) {
            val lMax = if (span < i) span else i
            var l = 1
            while (l <= lMax) {
              if (UnigramSeg.isBoundary(word, i - l)) {
                val lp = t.lp.get(word.substring(i - l, i))
                val slp =
                  if (lp != null) alpha * lp.doubleValue()
                  else if (UnigramSeg.isSingleCodePoint(word, i - l, i))
                    alpha * t.unkLp
                  else Double.NegativeInfinity
                if (slp != Double.NegativeInfinity) {
                  val v = logA(i - l) + slp
                  logA(i) =
                    if (logA(i) == Double.NegativeInfinity) v
                    else if (logA(i) >= v)
                      logA(i) + math.log1p(math.exp(v - logA(i)))
                    else v + math.log1p(math.exp(logA(i) - v))
                }
              }
              l += 1
            }
          }
          i += 1
        }
        // backward sampling: at pos, pick the final piece (pos-l, pos)
        // with prob exp(α·lp + logA(pos-l) − logA(pos))
        var state = splitmix(seed ^ fnv64(word) ^ (w.toLong * 0x9e3779b97f4a7c15L))
        val cuts = new java.util.ArrayList[Integer]()
        var pos = n
        while (pos > 0) {
          state = splitmix(state)
          val u = (state >>> 11).toDouble / (1L << 53).toDouble
          val lMax = if (span < pos) span else pos
          var acc = 0.0
          var chosen = -1
          var l = 1
          while (l <= lMax && chosen < 0) {
            if (UnigramSeg.isBoundary(word, pos - l)) {
              val lp = t.lp.get(word.substring(pos - l, pos))
              val slp =
                if (lp != null) alpha * lp.doubleValue()
                else if (UnigramSeg.isSingleCodePoint(word, pos - l, pos))
                  alpha * t.unkLp
                else Double.NegativeInfinity
              if (slp != Double.NegativeInfinity &&
                  logA(pos - l) != Double.NegativeInfinity) {
                acc += math.exp(logA(pos - l) + slp - logA(pos))
                if (u < acc) chosen = l
              }
            }
            l += 1
          }
          // float-rounding guard: Σ weights can land a hair under 1 —
          // fall back to the LAST feasible span (deterministic)
          if (chosen < 0) {
            var l2 = lMax
            while (l2 >= 1 && chosen < 0) {
              if (UnigramSeg.isBoundary(word, pos - l2) &&
                  logA(pos - l2) != Double.NegativeInfinity &&
                  (t.lp.get(word.substring(pos - l2, pos)) != null ||
                    UnigramSeg.isSingleCodePoint(word, pos - l2, pos)))
                chosen = l2
              l2 -= 1
            }
          }
          cuts.add(Integer.valueOf(pos))
          pos -= chosen
        }
        var k = cuts.size() - 1
        var start = 0
        while (k >= 0) {
          val end = cuts.get(k).intValue()
          out.add(UTF8String.fromString(word.substring(start, end)))
          start = end
          k -= 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** `unigram_sample(text)` — sampled segmentation under a fixed
  * trained table, deterministic (seed, α) shipped with the compiled
  * table once per plan.
  */
case class UnigramSampleExpr(child: Expression, pieces: Seq[(String, Double)],
    seed: Long, alpha: Double) extends UnaryExpression {

  private lazy val table = UnigramEncodeSupport.compile(
    pieces.map(_._1).toArray, pieces.map(_._2).toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_sample needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramSampleSupport.sample(input.asInstanceOf[UTF8String], table,
      seed, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncodeSupport.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSampleSupport.sample($c, $tableRef, ${seed}L, $alpha)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSampleExpr =
    copy(child = newChild)
}

/** `unigram_encode(text)` under a fixed trained piece table
  * (driver-known, shipped once per plan as a compiled table reference
  * object) — the Viterbi sibling of [[BpeEncodeExpr]].
  */
case class UnigramEncodeExpr(child: Expression, pieces: Seq[(String, Double)])
    extends UnaryExpression {

  private lazy val table = UnigramEncodeSupport.compile(
    pieces.map(_._1).toArray, pieces.map(_._2).toArray)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_encode needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeSupport.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramEncodeSupport.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramEncodeSupport.encode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramFunctions {
  /** Viterbi-encode text into pieces under a trained unigram table. */
  def unigram_encode(text: Column, pieces: Seq[(String, Double)]): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(text), pieces))

  /** Sample a segmentation ∝ P(seg)^α — deterministic in (seed, text,
    * word position).
    */
  def unigram_sample(text: Column, pieces: Seq[(String, Double)],
      seed: Long, alpha: Double): Column =
    GraftColumnBridge.column(UnigramSampleExpr(
      GraftColumnBridge.expression(text), pieces, seed, alpha))
}
