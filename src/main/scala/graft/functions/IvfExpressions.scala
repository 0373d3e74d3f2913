package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse-quantizer assignment: rank the (pre-normalized) centroid
  * matrix by dot product against the row's vector and return the top
  * `nProbe` cell ids. Row-local — the corpus is assigned to cells where
  * it already sits (zero shuffle); only the probed cells' candidates
  * ever move.
  */
object IvfSupport {

  /** Top-`nProbe` cell ids by (dot desc, cid asc). `cents` rows are
    * L2-normalized, so dot order == cosine order (the row vector's own
    * norm is a positive constant factor). Selection sort over C cells —
    * C is small (a coarse quantizer), nProbe smaller.
    */
  def probes(vec: ArrayData, cents: Array[Array[Double]], nProbe: Int,
      isFloat: Boolean): ArrayData = {
    val nc = cents.length
    val dots = new Array[Double](nc)
    val n = vec.numElements()
    var c = 0
    while (c < nc) {
      val cent = cents(c)
      val d = math.min(n, cent.length)
      var s = 0.0
      var i = 0
      if (isFloat) while (i < d) { s += vec.getFloat(i).toDouble * cent(i); i += 1 }
      else while (i < d) { s += vec.getDouble(i) * cent(i); i += 1 }
      dots(c) = s
      c += 1
    }
    val k = math.min(nProbe, nc)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nc)
    var r = 0
    while (r < k) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < nc) {
        // strict > keeps the LOWEST cid on ties — the deterministic
        // tie-break the SQL oracle reproduces with (dot DESC, cid ASC).
        // `best == -1` seeds with the first untaken cell, which also
        // makes NaN dots (NaN input vectors) rank deterministically
        // last-by-lowest-cid instead of leaving best at -1 and crashing.
        if (!taken(j) && (best == -1 || dots(j) > bestDot)) {
          best = j; bestDot = dots(j)
        }
        j += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<float|double>` vector → array<int> of the `nProbe` nearest
  * IVF cells (by cosine to the normalized centroid matrix; lowest cid
  * wins ties). nProbe=1 is plain cell assignment.
  */
case class IvfCells(child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ivf_cells needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    IvfSupport.probes(input.asInstanceOf[ArrayData], cents, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfSupport.probes($c, $centsRef, $nProbe, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCells =
    copy(child = newChild)
}

object IvfFunctions {
  def ivf_cells(vec: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    GraftColumnBridge.column(IvfCells(
      GraftColumnBridge.expression(vec), cents, nProbe))
}
