package graft

import graft.sinks.SqlExport

/** End-to-end JDBC sink check against embedded Derby (in Spark's own
  * classpath) — the production path the reference reaches via psql
  * (db_export, scripts/xe-dbexport-pg.sh): one table per (mo, fwm),
  * one append per window close. */
class JdbcSinkSpec extends SparkTest {

  test("writeJdbc appends window dumps to one (mo,fwm) table") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val conf = SqlExport.Conf("ingress", "hourly")

    val w1 = flowDf(Seq("time", "src", "octets"),
      Seq(Seq(1700000000L, 167772161L, 100L),
        Seq(1700000000L, 167772162L, 50L)))
    val w2 = flowDf(Seq("time", "src", "octets"),
      Seq(Seq(1700003600L, 167772161L, 70L)))

    SqlExport.writeJdbc(w1, conf, url, props)
    SqlExport.writeJdbc(w2, conf, url, props) // append, not clobber

    val back = spark.read.jdbc(url, SqlExport.tableName(conf), props)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(back == Seq(
      (1700000000L, 167772161L, 100L),
      (1700000000L, 167772162L, 50L),
      (1700003600L, 167772161L, 70L)))
  }
}
