package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column↔Expression converters, for wiring
  * custom Catalyst expressions (graft.functions.LpmExpr) into the public
  * Column API. Lives under org.apache.spark.sql only to satisfy the
  * private[sql] access scope. */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
