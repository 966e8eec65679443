package graft.functions

import graft.flow.BuiltinTables
import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-registry exposure of the engine's function surface: after
  * `SqlFunctions.registerAll(spark)`, every scalar the reference's filter
  * DSL offers is callable from plain `spark.sql(...)` — `tfstr(flags)`,
  * `portstr(port)`, `ppstr(sp,dp)`, `xdiv/xdiv_r/xdiv_l`, `ip4str(ip)`,
  * `country_code(ip)`/`asn(ip)`/... and `ip_in_list(ip, 'bogon')`.
  *
  * Registration uses temp functions on the live session (the runtime
  * equivalent of injectFunction in a SparkSessionExtensions; both paths
  * build the same Expressions).
  */
object SqlFunctions {

  private def colOf(e: Expression): Column = GraftBridge.toColumn(e)

  private def register(spark: SparkSession, name: String,
                       fn: Seq[Expression] => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => GraftBridge.lower(fn(exprs)), "scala_udf")

  private def longArg(e: Expression): Long =
    e.eval(null) match {
      case i: Int  => i.toLong
      case l: Long => l
      case other   => sys.error(s"expected integer literal, got $other")
    }
  private def strArg(e: Expression): String =
    String.valueOf(e.eval(null))

  def registerAll(spark: SparkSession,
                  geo: GeoDb = BuiltinTables.geoDb,
                  ipLists: Map[String, IpList] =
                    BuiltinTables.ipLists): Unit = {
    register(spark, "tfstr", es => NetFns.tfstr(colOf(es.head)))
    register(spark, "portstr", es => NetFns.portstr(colOf(es.head)))
    register(spark, "ppstr",
      es => NetFns.ppstr(colOf(es(0)), colOf(es(1))))
    register(spark, "xdiv",
      es => NetFns.xdiv(colOf(es(0)), colOf(es(1))))
    register(spark, "xdiv_r",
      es => NetFns.xdivR(colOf(es(0)), colOf(es(1)), longArg(es(2))))
    register(spark, "xdiv_l",
      es => NetFns.xdivL(colOf(es(0)), colOf(es(1)), longArg(es(2))))
    register(spark, "ip4str", es => NetFns.ip4str(colOf(es.head)))
    GeoDb.attrs.foreach { attr =>
      register(spark, attr,
        es => geo.geoAttr(spark, attr)(colOf(es.head)))
    }
    register(spark, "asn", es => geo.asn(spark)(colOf(es.head)))
    register(spark, "asd", es => geo.asd(spark)(colOf(es.head)))
    register(spark, "ip_in_list", es => {
      val nm = strArg(es(1))
      val list = ipLists.getOrElse(nm,
        sys.error(s"unknown IP list '$nm'"))
      LpmExpr.contains4(list.v4)(colOf(es(0)))
    })
    // v6 variants over binary(16) columns (first-class like the
    // reference's xe_ip covering both families, geoip.h:43-55)
    register(spark, "ip6str", es => NetFns.ip6str(colOf(es.head)))
    GeoDb.attrs.foreach { attr =>
      register(spark, s"${attr}6",
        es => geo.geoAttr6(spark, attr)(colOf(es.head)))
    }
    register(spark, "asn6", es => geo.asn6(spark)(colOf(es.head)))
    register(spark, "asd6", es => geo.asd6(spark)(colOf(es.head)))
    register(spark, "ip6_in_list", es => {
      val nm = strArg(es(1))
      val list = ipLists.getOrElse(nm,
        sys.error(s"unknown IP list '$nm'"))
      LpmExpr.contains6(list.v6)(colOf(es(0)))
    })
    // curation surface: stable [0,100) bucket for split assignment
    register(spark, "hash_bucket",
      es => graft.operators.Curation.hashBucket(colOf(es.head)))
    // embedding surface: the native codegen'd vector expressions
    // (VecExprs) — vec_dot(a,b), vec_cosine(a,b) (NULL on zero norm),
    // lsh_signature(v, dim, nbits)
    register(spark, "vec_dot", es =>
      graft.operators.Similarity.dot(colOf(es(0)), colOf(es(1))))
    register(spark, "vec_cosine", es =>
      graft.operators.Similarity.cosineNullSafe(
        colOf(es(0)), colOf(es(1))))
    register(spark, "lsh_signature", es =>
      graft.operators.Similarity.lshSignature(colOf(es.head),
        longArg(es(1)).toInt, longArg(es(2)).toInt))
  }
}
