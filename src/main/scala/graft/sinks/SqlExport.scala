package graft.sinks

import graft.functions.NetFns
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-text export sink: per window, emit
  * `CREATE TABLE IF NOT EXISTS "<mo>_<fwm>" (...)` + `CREATE INDEX` +
  * multi-row `INSERT`, matching the reference's PostgreSQL file format
  * (reference monit-objects-fwm.c:227-494; type mapping 291-302, index
  * 327-334). The reference then shells out to psql (db_export:725-752);
  * on Spark the natural sink is a JDBC write — this text emitter exists
  * for golden-output parity and for the same file-based retry workflow
  * (STEP-BY-STEP.md:446-459).
  *
  * Column typing: `time` → TIMESTAMPTZ, IPv4-in-Long marked columns →
  * INET (rendered dotted-quad), strings → TEXT, integers → BIGINT.
  */
object SqlExport {

  final case class Conf(moName: String, fwmName: String,
                        ipCols: Set[String] = Set.empty,
                        clickhouse: Boolean = false)

  def tableName(conf: Conf): String = s"${conf.moName}_${conf.fwmName}"

  private def pgType(f: StructField, conf: Conf): String =
    // time FIRST, but dialect-aware: ClickHouse has no TIMESTAMPTZ
    if (f.name == "time") if (conf.clickhouse) "DateTime" else "TIMESTAMPTZ"
    else if (conf.ipCols.contains(f.name))
      if (conf.clickhouse)
        if (f.dataType == BinaryType) "Nullable(IPv6)" else "Nullable(IPv4)"
      else "INET"
    else f.dataType match {
      case StringType => if (conf.clickhouse) "Nullable(String)" else "TEXT"
      case BinaryType => if (conf.clickhouse) "Nullable(String)" else "macaddr"
      case _ => if (conf.clickhouse) "Nullable(Int64)" else "BIGINT"
    }

  /** DDL text (CREATE TABLE + index), reference monit-objects-fwm.c
    * :269-334 layout. */
  def ddl(schema: StructType, conf: Conf): String = {
    val tbl = tableName(conf)
    val cols = schema.fields
      .map(f => s""""${f.name}" ${pgType(f, conf)}""").mkString(", ")
    if (conf.clickhouse)
      s"""CREATE TABLE IF NOT EXISTS "$tbl" ($cols) """ +
        s"ENGINE = MergeTree() PRIMARY KEY time;"
    else
      s"""CREATE TABLE IF NOT EXISTS "$tbl" ($cols);""" + "\n" +
        s"""CREATE INDEX IF NOT EXISTS "${tbl}_time_idx" """ +
        s"""ON "$tbl" (time);"""
  }

  private def literal(v: Any, f: StructField, conf: Conf): String = v match {
    case null => "NULL"
    case _ if f.name == "time" => // epoch seconds column
      if (conf.clickhouse) s"toDateTime($v)" else s"to_timestamp($v)"
    case l: Long if conf.ipCols.contains(f.name) =>
      "'" + Seq(24, 16, 8, 0).map(s => (l >> s) & 0xff).mkString(".") + "'"
    case b: Array[Byte] if conf.ipCols.contains(f.name) && b.length == 16 =>
      // v6 INET literal: RFC 5952 compressed, inet_ntop parity
      "'" + NetFns.ip6Compressed(b) + "'"
    case b: Array[Byte] if conf.ipCols.contains(f.name) && b.length == 4 =>
      // binary-carried IPv4: dotted-quad, still a valid INET literal
      "'" + b.map(_ & 0xff).mkString(".") + "'"
    case b: Array[Byte] if conf.ipCols.contains(f.name) =>
      // malformed address length: NULL beats an invalid INET literal
      // that would abort the whole INSERT at import time
      "NULL"
    case s: String =>
      // ClickHouse treats backslash as an escape inside string literals
      // (Postgres with standard_conforming_strings does not): double it
      // there, or a value ending in '\' swallows the closing quote and
      // breaks the whole multi-row INSERT
      val esc = if (conf.clickhouse) s.replace("\\", "\\\\") else s
      "'" + esc.replace("'", "''") + "'"
    case b: Array[Byte] =>
      "'" + b.map("%02x".format(_)).mkString(":") + "'"
    case other => other.toString
  }

  /** INSERT text for a (small, post-aggregation) result. The caller is
    * expected to hand in one window's rows — cardinality is bounded by
    * the fwm limit/top-N, so collecting here matches the reference's
    * per-window dump. */
  def insertSql(df: DataFrame, conf: Conf): String = {
    val schema = df.schema
    val rows = df.collect()
    if (rows.isEmpty) return ""
    val colNames = schema.fieldNames.map(n => s""""$n"""").mkString(", ")
    val values = rows.map { r =>
      "(" + schema.fields.zipWithIndex.map { case (f, i) =>
        literal(r.get(i), f, conf)
      }.mkString(", ") + ")"
    }.mkString(",\n")
    s"""INSERT INTO "${tableName(conf)}" ($colNames) VALUES\n$values;"""
  }

  /** Full export file content for one window dump. */
  def exportSql(df: DataFrame, conf: Conf): String =
    ddl(df.schema, conf) + "\n" + insertSql(df, conf) + "\n"

  /** JDBC writer for production use (same table naming/types via the
    * target's JdbcDialect): one append per window close into the
    * (mo, fwm) table — exercised end-to-end against embedded Derby in
    * JdbcSinkSpec; against Postgres this is the reference's psql path
    * (db_export:725-752) without the shell hop. */
  def writeJdbc(df: DataFrame, conf: Conf, url: String,
                props: java.util.Properties): Unit =
    df.write.mode("append").jdbc(url, tableName(conf), props)
}
