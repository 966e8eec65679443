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

  /** Optimize a frame's ANALYZED plan with the session optimizer,
    * without QueryExecution's batch-execution gate — the only way to
    * inspect optimizer placement (e.g. a Filter vs EventTimeWatermark)
    * on a STREAMING frame before start(): touching
    * `queryExecution.optimizedPlan` on one throws
    * UnsupportedOperationChecker's "must be executed with
    * writeStream.start()". The returned plan is advisory (micro-batch
    * execution re-optimizes per batch with the same rule set). */
  def optimizeLogical(df: Dataset[_])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.sparkSession.sessionState.optimizer.execute(
      df.queryExecution.analyzed)
}
