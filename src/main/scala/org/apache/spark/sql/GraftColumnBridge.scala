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
}
