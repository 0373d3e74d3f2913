package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-local evaluation of all LSH table buckets.
  *
  * The composable form builds nTables × nPlanes literal-array dot
  * products into the plan — 3k+ literal doubles per call site, which
  * costs real planning/codegen time and evaluates each plane as a
  * separate expression. This computes every bucket in one compiled
  * loop over a `double[][]` plane matrix attached as a codegen
  * reference object.
  */
object LshSupport {

  /** Same deterministic plane family as
    * [[graft.ext.Similarity]]: component(plane, d) =
    * hash(plane, d) → [-0.5, 0.5).
    */
  def planeMatrix(nPlanes: Int, nTables: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nTables * nPlanes, dim) { (plane, d) =>
      (((plane.toLong * 1315423911L + d.toLong * 2654435761L) % 1000003L).toDouble
        / 1000003.0) - 0.5
    }

  /** Bucket ids for all tables: bucket[t] bit p = sign(dot(v, plane
    * t*nPlanes+p)). `isFloat` selects the element getter (floats are
    * widened per element, matching [[VectorDot]]).
    */
  def buckets(vec: ArrayData, planes: Array[Array[Double]],
      nPlanes: Int, isFloat: Boolean): ArrayData = {
    val nTables = planes.length / nPlanes
    val out = new Array[Long](nTables)
    val n = vec.numElements()
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val plane = planes(t * nPlanes + p)
        val d = math.min(n, plane.length)
        var proj = 0.0
        var i = 0
        if (isFloat) while (i < d) { proj += vec.getFloat(i).toDouble * plane(i); i += 1 }
        else while (i < d) { proj += vec.getDouble(i) * plane(i); i += 1 }
        if (proj > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<float|double>` embedding → array<long> of nTables LSH bucket
  * ids (element t = table t's bucket).
  */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planes: Array[Array[Double]] =
    LshSupport.planeMatrix(nPlanes, nTables, dim)

  override def nullSafeEval(input: Any): Any =
    LshSupport.buckets(input.asInstanceOf[ArrayData], planes, nPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshSupport.buckets($c, $planesRef, $nPlanes, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshFunctions {
  def lsh_buckets(vec: Column, nPlanes: Int, nTables: Int, dim: Int): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(vec), nPlanes, nTables, dim))
}
