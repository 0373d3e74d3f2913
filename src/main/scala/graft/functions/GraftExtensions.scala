package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the custom Catalyst expressions: registers
  * `vec_dot(a, b)`, `vec_norm(v)` (as dot(v,v) is cheap to compose in
  * SQL, only the dot needs native registration) and
  * `shingle_hashes(text, n)` in the session FunctionRegistry, so
  * `spark.sql("SELECT vec_dot(e1, e2) ...")` plans the same codegen'd
  * expression the Column API uses.
  *
  * Two deployment paths:
  * - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *   build time (the standard extension hook);
  * - [[GraftFunctions.register]] on a live session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes two arrays")
        VectorDot(children(0), children(1))
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignatureExpr].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "minhash_signature(hashes) takes one array")
        MinhashSignatureExpr(children.head)
      }),
    (new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "shingle_hashes(text, n) takes two args")
        ShingleHashes(children(0), intLit(children(1), "shingle width n"))
      }),
    (new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimhashExpr].getName, "simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "simhash(text, bits) takes two args")
        SimhashExpr(children(0), intLit(children(1), "simhash bits"))
      }),
    (new FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "lsh_buckets(vec, nPlanes, nTables, dim) takes four args")
        LshBuckets(children(0), intLit(children(1), "nPlanes"),
          intLit(children(2), "nTables"), intLit(children(3), "dim"))
      }),
    (new FunctionIdentifier("span_hashes"),
      new ExpressionInfo(classOf[SpanHashes].getName, "span_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "span_hashes(text, w) takes two args")
        SpanHashes(children(0), intLit(children(1), "span width w"))
      }),
    (new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "jaro_winkler(a, b) takes two strings")
        JaroWinklerExpr(children(0), children(1))
      }),
    (new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "nfc_normalize(text) takes one string")
        NfcNormalizeExpr(children.head)
      }))

  /** Register the functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(
        spark, ident, info, builder)
    }
}
