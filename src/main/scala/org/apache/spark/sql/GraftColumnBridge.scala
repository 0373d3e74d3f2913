package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column⇄Expression converters —
  * Spark 4 hides the direct `new Column(expr)` constructor behind
  * `classic.ExpressionUtils`; custom expressions (graft.functions)
  * need both directions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a one-row/one-column DataFrame as a Catalyst scalar
    * subquery expression (the shape `BloomFilterMightContain` and
    * friends require for their filter side — Spark's runtime
    * row-level filtering injects the same form). The child plan is
    * already analyzed, so the outer query just plans and broadcasts
    * the subquery result.
    */
  def scalarSubquery(df: Dataset[Row]): Expression =
    catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[classic.Dataset[Row]].logicalPlan)

  /** The exception `raise_error` throws (USER_RAISED_EXCEPTION) —
    * `SparkRuntimeException` is `private[spark]`, so custom
    * expressions that fail loud with the same catchable shape build
    * it through this bridge.
    */
  def userRaisedException(message: String): Throwable =
    new org.apache.spark.SparkRuntimeException(
      errorClass = "USER_RAISED_EXCEPTION",
      messageParameters = Map("errorMessage" -> message))

  /** The exception Spark 4's `decode(col, charset)` throws on invalid
    * input bytes (MALFORMED_CHARACTER_CODING) — `QueryExecutionErrors`
    * is `private[sql]`, so custom decoders that fail loud with the
    * same catchable shape build it through this bridge.
    */
  def malformedCharacterCoding(funcName: String, charset: String): RuntimeException =
    errors.QueryExecutionErrors.malformedCharacterCoding(funcName, charset)

  /** Register a builder in a live session's FunctionRegistry
    * (`sessionState` is `private[sql]`; this is the sanctioned-shape
    * bridge for registering non-UDF Catalyst expressions outside
    * `spark.sql.extensions`).
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
