package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expression for the embedding hot path.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is semantically right but interpreted: every pair allocates an
  * intermediate array and evaluates two lambdas per element, which made
  * the all-pairs near-dup scan ~250× slower than a native engine.
  * `VectorDot` is the (b)-tier answer from SURVEY.md §7.4: a
  * whole-stage-codegen'd tight loop over the underlying primitive
  * arrays, no allocation, no virtual calls.
  *
  * Accepts `array<float>` / `array<double>` children (floats are
  * widened per element, which is exact); accumulates in double in index
  * order — bit-identical to the interpreted fold and to DuckDB's
  * `list_dot_product` over `DOUBLE[]`.
  *
  * Null semantics: null array → null result; elements are assumed
  * non-null (embedding vectors), matching `containsNull = false` data.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (DoubleType, DoubleType) =>
        while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, FloatType) =>
        while (i < n) { sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { sum += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { sum += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case _ => throw new IllegalStateException("unreachable: checked input types")
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType => s"((double) $arr.getFloat($i))"
      case _ => throw new IllegalStateException("unreachable: checked input types")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** One-pass JVM kernels for the unary vector transforms. The
  * Column-composed forms (`transform(vec, x => x / vec_norm(vec))`)
  * re-evaluate the norm/scale subexpression PER ELEMENT inside an
  * interpreted higher-order lambda — O(d²) work per row and no
  * codegen; these do one O(d) pass in the generated loop.
  */
object VectorSupport {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  private def elem(vec: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)

  /** v / ||v|| as array<double> (zero vector → zeros-over-zero = NaNs,
    * matching the composable form's division semantics).
    */
  def normalize(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val n = vec.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = elem(vec, i, isFloat); ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = elem(vec, i, isFloat) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Symmetric int8 quantization: struct(q array<tinyint>, scale) with
    * scale = 127/max|v| and q[i] = round-half-away-from-zero(v[i]·scale)
    * — the same rounding Spark's `round()` and DuckDB's `round()` use,
    * which keeps the oracle exact.
    */
  def quantize(vec: ArrayData, isFloat: Boolean): InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(vec, i, isFloat))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    // zero/empty vector: scale 1 with all-zero q reconstructs exactly
    // (the raw formula would emit scale = Infinity and NaN elements)
    val scale = if (maxAbs == 0.0) 1.0 else 127.0 / maxAbs
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      val x = elem(vec, i, isFloat) * scale
      val r = if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)
      q(i) = r.toByte
      i += 1
    }
    InternalRow(new GenericArrayData(q), scale)
  }
}

/** v/||v|| as one codegen'd O(d) pass (see [[VectorSupport]]). */
case class VectorNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_normalize needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorSupport.normalize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorSupport.normalize($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): VectorNormalize =
    copy(child = newChild)
}

/** Symmetric int8 quantization as one codegen'd O(d) pass. */
case class VectorQuantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_quantize needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    VectorSupport.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorSupport.quantize($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): VectorQuantize =
    copy(child = newChild)
}

/** Column-level entry points for the vector expressions. */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vec_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(vec_dot(a, a))
  }

  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  def vec_normalize(a: Column): Column =
    GraftColumnBridge.column(VectorNormalize(GraftColumnBridge.expression(a)))

  def vec_quantize(a: Column): Column =
    GraftColumnBridge.column(VectorQuantize(GraftColumnBridge.expression(a)))
}
