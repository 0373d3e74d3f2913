package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge application: rewrite a symbol array replacing every
  * left-to-right non-overlapping adjacent (left, right) occurrence
  * with the concatenated symbol — the inner step of the tokenizer
  * trainer ([[graft.ext.TextAnalysis.bpeTrain]]). Row-local; the
  * trainer applies it once per round over the compressed vocabulary.
  */
object BpeSupport {

  def mergeStep(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(cur, arr.getUTF8String(i + 1)))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }
}

/** `bpe_merge(symbols)` for one fixed (left, right) rule — the rule
  * is driver-known per training round, so it rides the expression as
  * constructor state (shipped via a codegen reference object, not a
  * per-row column).
  */
case class BpeMergeExpr(child: Expression, left: String, right: String)
    extends UnaryExpression {

  private lazy val leftU = UTF8String.fromString(left)
  private lazy val rightU = UTF8String.fromString(right)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    BpeSupport.mergeStep(input.asInstanceOf[ArrayData], leftU, rightU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeMergeL", leftU,
      classOf[UTF8String].getName)
    val rRef = ctx.addReferenceObj("bpeMergeR", rightU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeSupport.mergeStep($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeExpr =
    copy(child = newChild)
}

object BpeFunctions {
  /** Apply one BPE merge rule to a symbol array column. */
  def bpe_merge(symbols: Column, left: String, right: String): Column =
    GraftColumnBridge.column(BpeMergeExpr(
      GraftColumnBridge.expression(symbols), left, right))
}
