package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the
  * canonicalization pass every multilingual corpus needs before
  * hashing: "é" arrives both precomposed (U+00E9) and decomposed
  * (e + U+0301) in real crawls, and every digest/shingle/dedup
  * operator downstream treats those as different bytes unless the
  * corpus is normalized first. Spark has no built-in; a UDF would
  * break codegen in the one pass that by definition touches every
  * byte of the corpus.
  *
  * Semantics: Unicode canonical composition (java.text.Normalizer
  * NFC), which matches DuckDB's `nfc_normalize` (utf8proc) on
  * canonical sequences — the oracle replays it directly.
  *
  * Cost: the dominant case is already-ASCII text, which is NFC by
  * construction — a byte scan detects it and returns the input
  * UTF8String untouched (no UTF-16 round trip, no allocation). Only
  * rows with non-ASCII bytes pay the Normalizer pass.
  */
object UnicodeNorm {

  def nfc(t: UTF8String): UTF8String = {
    val n = t.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((t.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) t
    else {
      val s = t.toString
      if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) t
      else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
    }
  }
}

/** `nfc_normalize(text)` — codegen'd, null-safe, ASCII fast path. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object UnicodeFunctions {
  /** Unicode NFC canonical composition of a string column. */
  def nfc_normalize(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(
      GraftColumnBridge.expression(text)))
}
