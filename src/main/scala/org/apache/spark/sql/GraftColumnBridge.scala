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
