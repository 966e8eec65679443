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

  /** Materialize a SparkSessionExtensions' injected functions into a
    * live registry — the session-build step, callable from tests (the
    * method is private[sql]). */
  def registerInjectedFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : Unit = ext.registerFunctions(registry)

  /** Fully lower a Column's node tree to a Catalyst Expression (the
    * converter the classic Dataset API itself uses). Needed when the
    * expression escapes Dataset resolution — e.g. FunctionRegistry
    * builders, where a lazy ColumnNodeExpression wrapper would reach
    * codegen unresolved. */
  def lower(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
