package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a codegen'd byte-walk — the verify
  * stage of the entity-resolution family ([[graft.ops.EntityResolution]]).
  * Spark ships `levenshtein` but no Jaro-Winkler; a Scala UDF would
  * pay serialization per row and break whole-stage codegen in the
  * verify loop, which at 100 TB runs once per blocked candidate pair.
  *
  * Semantics are the standard definition, pinned BIT-EXACTLY to
  * DuckDB's `jaro_winkler_similarity` (the oracle replays it):
  *  - Jaro: match window `max(0, max(l1,l2)/2 - 1)`; greedy
  *    left-to-right matching with used-flags; transpositions =
  *    half the aligned-order mismatches; score
  *    `(m/l1 + m/l2 + (m-t)/m) / 3`; 0.0 when either side is empty
  *    or there are no matches.
  *  - Winkler boost: `j + p·0.1·(1-j)` with `p` = common prefix
  *    capped at 4, applied only when `j > 0.7`.
  * The formula is evaluated in exactly this operation order so the
  * IEEE doubles match DuckDB digit-for-digit (verified on the
  * classic pairs and the full sf0.01 candidate set — no libm calls,
  * only +,·,/, so there is no ulp hazard to round away).
  *
  * Operates on UTF-8 BYTES, as DuckDB does — for ASCII the two are
  * identical; multi-byte codepoints count per byte on both engines.
  */
object StringSim {

  /** Standard Jaro-Winkler over UTF-8 bytes, 0.0–1.0. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val l1 = a.numBytes
    val l2 = b.numBytes
    if (l1 == 0 || l2 == 0) return 0.0
    val mw = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = a.getByte(i)
      var j = math.max(0, i - mw)
      val hi = math.min(l2 - 1, i + mw)
      var found = false
      while (!found && j <= hi) {
        if (!f2(j) && b.getByte(j) == c) {
          f1(i) = true; f2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // operation order mirrors the reference formula exactly (IEEE
    // doubles are deterministic given the same op order — this is
    // what keeps the oracle hash-equal without rounding tricks)
    val md = m.toDouble
    val j = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (j > 0.7) {
      var p = 0
      val maxp = math.min(4, math.min(l1, l2))
      while (p < maxp && a.getByte(p) == b.getByte(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}

/** `jaro_winkler_similarity(a, b)` — codegen'd, null-safe. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs two string inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object StringSimFunctions {
  /** Jaro-Winkler similarity of two strings, 0.0–1.0. */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftColumnBridge.column(JaroWinklerExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
