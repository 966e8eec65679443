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

  /** The function surface as (name, builder) pairs — shared by
    * [[registerAll]] (temp functions on a live session) and
    * [[graft.GraftExtensions]] (injectFunction at session build).
    * Builders that need a session resolve `SparkSession.active` at
    * CALL time, so the list itself can be built before any session
    * exists (the extensions path). */
  def builders(geo: GeoDb = BuiltinTables.geoDb,
               ipLists: Map[String, IpList] = BuiltinTables.ipLists)
      : Seq[(String, Seq[Expression] => Column)] = {
    def sess = SparkSession.active
    Seq[(String, Seq[Expression] => Column)](
      "tfstr" -> (es => NetFns.tfstr(colOf(es.head))),
      "portstr" -> (es => NetFns.portstr(colOf(es.head))),
      "ppstr" -> (es => NetFns.ppstr(colOf(es(0)), colOf(es(1)))),
      "xdiv" -> (es => NetFns.xdiv(colOf(es(0)), colOf(es(1)))),
      "xdiv_r" -> (es =>
        NetFns.xdivR(colOf(es(0)), colOf(es(1)), longArg(es(2)))),
      "xdiv_l" -> (es =>
        NetFns.xdivL(colOf(es(0)), colOf(es(1)), longArg(es(2)))),
      "ip4str" -> (es => NetFns.ip4str(colOf(es.head))),
      "asn" -> (es => geo.asn(sess)(colOf(es.head))),
      "asd" -> (es => geo.asd(sess)(colOf(es.head))),
      "ip_in_list" -> (es => {
        val nm = strArg(es(1))
        val list = ipLists.getOrElse(nm,
          sys.error(s"unknown IP list '$nm'"))
        LpmExpr.contains4(list.v4)(colOf(es(0)))
      }),
      "ip6str" -> (es => NetFns.ip6str(colOf(es.head))),
      "asn6" -> (es => geo.asn6(sess)(colOf(es.head))),
      "asd6" -> (es => geo.asd6(sess)(colOf(es.head))),
      "ip6_in_list" -> (es => {
        val nm = strArg(es(1))
        val list = ipLists.getOrElse(nm,
          sys.error(s"unknown IP list '$nm'"))
        LpmExpr.contains6(list.v6)(colOf(es(0)))
      }),
      "hash_bucket" -> (es =>
        graft.operators.Curation.hashBucket(colOf(es.head))),
      "vec_dot" -> (es =>
        graft.operators.Similarity.dot(colOf(es(0)), colOf(es(1)))),
      "vec_cosine" -> (es =>
        graft.operators.Similarity.cosineNullSafe(
          colOf(es(0)), colOf(es(1)))),
      "lsh_signature" -> (es =>
        graft.operators.Similarity.lshSignature(colOf(es.head),
          longArg(es(1)).toInt, longArg(es(2)).toInt))) ++
      GeoDb.attrs.map(attr =>
        attr -> ((es: Seq[Expression]) =>
          geo.geoAttr(sess, attr)(colOf(es.head)))) ++
      GeoDb.attrs.map(attr =>
        s"${attr}6" -> ((es: Seq[Expression]) =>
          geo.geoAttr6(sess, attr)(colOf(es.head))))
  }

  def registerAll(spark: SparkSession,
                  geo: GeoDb = BuiltinTables.geoDb,
                  ipLists: Map[String, IpList] =
                    BuiltinTables.ipLists): Unit = {
    builders(geo, ipLists).foreach { case (n, fn) =>
      register(spark, n, fn)
    }
  }
}
