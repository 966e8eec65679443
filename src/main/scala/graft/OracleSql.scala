package graft

import graft.flow.BuiltinTables
import graft.functions.{Lpm, NetFns}

/** DuckDB-SQL fragment generators. Each fragment is derived from the SAME
  * Scala data structure the Spark side evaluates (service map, LPM tables,
  * flag names, powers-of-k), so oracle and engine cannot drift. */
object OracleSql {

  /** `(VALUES (20,'ftp-data'),...) svc(p, nm)` body, sorted by port. */
  val servicesValues: String =
    NetFns.servicesByPort.toSeq.sortBy(_._1)
      .map { case (p, n) => s"($p, '$n')" }.mkString(", ")

  /** concat_ws('+', CASE...) mirroring NetFns.tfstr bit order (CWR→FIN). */
  def tfstrSql(col: String): String = {
    val bits = Seq(128 -> "CWR", 64 -> "ECE", 32 -> "URG", 16 -> "ACK",
      8 -> "PSH", 4 -> "RST", 2 -> "SYN", 1 -> "FIN")
    val args = bits.map { case (m, nm) =>
      s"CASE WHEN (($col % 256) & $m) <> 0 THEN '$nm' END" }
    s"concat_ws('+', ${args.mkString(", ")})"
  }

  /** Powers-of-k literal list, identical to NetFns.xdivL's table. */
  def powersList(k: Long): String = {
    val buf = Vector.newBuilder[Long]
    var p = 1L
    while (p <= Long.MaxValue / k) { buf += p; p *= k }
    buf += p
    buf.result().mkString("[", ", ", "]")
  }

  /** Disjoint-interval CASE for one attribute of an LPM table:
    * `CASE WHEN ip BETWEEN a AND b THEN 'v' ... ELSE '?' END`.
    * @param attr index into the pipe-joined record, or -1 for whole value */
  def lpmCase(table: Lpm.Table, ipExpr: String, attr: Int): String = {
    val whens = table.starts.indices.map { i =>
      val v =
        if (attr < 0) table.values(i)
        else table.values(i).split('|')(attr)
      s"WHEN $ipExpr BETWEEN ${table.starts(i)} AND ${table.ends(i)} " +
        s"THEN '$v'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '?' END"
  }

  /** Proto-number → IANA name CASE (fallback: number as string). */
  def protoNameSql(col: String): String = {
    val whens = BuiltinTables.protoNames.toSeq.sortBy(_._1)
      .map { case (p, n) => s"WHEN $p THEN '$n'" }.mkString(" ")
    s"CASE $col $whens ELSE CAST($col AS VARCHAR) END"
  }
}
