package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-build registration of the engine's whole SQL function
  * surface (SURVEY §2.9's injectFunction path):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Injects the same builders [[graft.functions.SqlFunctions.registerAll]]
  * installs as temp functions at runtime — one list, two entry points.
  * Built-in geo/AS/IP-list tables back the lookup functions; deployments
  * with real tables call `SqlFunctions.registerAll(spark, geoDb, lists)`
  * to overwrite them on the live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.SqlFunctions.builders().foreach { case (name, fn) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => GraftBridge.lower(fn(exprs))))
    }
}
