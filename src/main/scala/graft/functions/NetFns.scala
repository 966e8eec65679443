package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Scalar function pack mirroring the reference function surface
  * (SURVEY.md §2.3; reference filter.h:396-418, utils.c:22-77).
  *
  * All functions are built from codegen'd Catalyst built-ins — no Scala
  * UDF in the hot path. Integer division is floor(double)-based and exact
  * for values < 2^53 (flow counters fit comfortably).
  */
object NetFns {

  /** div(a,b): integer a/b, 0 when b == 0 (reference filter.h:396-418). */
  def xdiv(a: Column, b: Column): Column =
    when(b.isNull || a.isNull || b === 0, lit(0L))
      .otherwise(floor(a.cast(DoubleType) / b.cast(DoubleType)))
      .cast(LongType)

  /** div_r(a,b,k): division rounded down to a multiple of k
    * (reference filter.h:409-415: q/k*k). */
  def xdivR(a: Column, b: Column, k: Long): Column =
    if (k > 1) (floor(xdiv(a, b).cast(DoubleType) / lit(k.toDouble)) *
      lit(k)).cast(LongType)
    else xdiv(a, b)

  /** div_l(a,b,k): division rounded down to the nearest power of k
    * (reference filter.h:407-409: pow(k, (int)(log q / log k))); 0 → 0.
    * Computed exactly over a precomputed powers-of-k table instead of
    * floating log/pow (which the reference uses and which is inexact at
    * power boundaries). */
  def xdivL(a: Column, b: Column, k: Long): Column = {
    require(k > 1, s"div_l k must be > 1, got $k")
    val powers = {
      val buf = Vector.newBuilder[Long]
      var p = 1L
      while (p <= Long.MaxValue / k) { buf += p; p *= k }
      buf += p
      buf.result()
    }
    val q = xdiv(a, b)
    // descending when-chain (first power ≤ q wins) instead of the
    // HOF filter+array_max form: the lambda is interpreted per element
    // per row with a fresh filtered array each time, while the chain is
    // whole-stage-codegen'd with zero allocation — same exact result
    val chain = powers.reverse.tail.foldLeft(
      when(q >= powers.last, lit(powers.last))) { (acc, p) =>
      acc.when(q >= p, lit(p))
    }.otherwise(lit(0L))
    when(q <= 0, lit(0L)).otherwise(chain).cast(LongType)
  }

  /** min(a,b) over two int fields (reference filter.c:685-709). */
  def xmin(a: Column, b: Column): Column = least(a, b)

  private val tcpFlagNames: Seq[(Int, String)] = Seq(
    7 -> "CWR", 6 -> "ECE", 5 -> "URG", 4 -> "ACK",
    3 -> "PSH", 2 -> "RST", 1 -> "SYN", 0 -> "FIN")

  /** 256-entry TCP-flags string table, highest bit first, '+'-joined:
    * 0b11 → "SYN+FIN" (reference utils.c:22-26, utils-data.inc). */
  val tcpFlagsTable: Seq[String] =
    (0 until 256).map { v =>
      tcpFlagNames.collect { case (bit, nm) if (v & (1 << bit)) != 0 => nm }
        .mkString("+")
    }

  // hoisted literal Columns: expression trees are immutable, so one
  // instance serves every query — rebuilding a 256-entry (or full
  // services-DB) literal per call costs driver CPU and bloats plans
  private lazy val tcpFlagsLit = typedlit(tcpFlagsTable)

  /** tfstr(flags): flags byte → "ACK+SYN" style string via a literal
    * 256-entry lookup array (codegen'd element_at). */
  def tfstr(flags: Column): Column =
    element_at(tcpFlagsLit, (flags % 256).cast("int") + 1)

  /** Parse a services(5)-format text ("name port/proto [aliases]", '#'
    * comments) into port → primary name. First entry per port wins —
    * getservbyport(port, NULL) semantics, which is what the reference's
    * generator consults to fill its 65536-entry ports_db
    * (utils-data.inc:263, utils.c:28-37). */
  def parseServices(text: String): Map[Int, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    text.linesIterator.foreach { raw =>
      val l = raw.takeWhile(_ != '#').trim
      if (l.nonEmpty) {
        val parts = l.split("\\s+")
        if (parts.length >= 2) {
          val slash = parts(1).indexOf('/')
          if (slash > 0) {
            parts(1).substring(0, slash).toIntOption
              .filter(p => p >= 0 && p <= 65535)
              .foreach(p => if (!out.contains(p)) out(p) = parts(0))
          }
        }
      }
    }
    out.toMap
  }

  /** Deterministic built-in subset — the fallback when no system
    * services DB is readable (containers often strip /etc/services). */
  val builtinServices: Map[Int, String] = Map(
    20 -> "ftp-data", 21 -> "ftp", 22 -> "ssh", 23 -> "telnet",
    25 -> "smtp", 53 -> "domain", 67 -> "bootps", 68 -> "bootpc",
    69 -> "tftp", 80 -> "http", 110 -> "pop3", 123 -> "ntp",
    137 -> "netbios-ns", 143 -> "imap2", 161 -> "snmp", 179 -> "bgp",
    194 -> "irc", 389 -> "ldap", 443 -> "https", 445 -> "microsoft-ds",
    465 -> "submissions", 514 -> "syslog", 587 -> "submission",
    636 -> "ldaps", 853 -> "domain-s", 873 -> "rsync", 993 -> "imaps",
    995 -> "pop3s", 1194 -> "openvpn", 1433 -> "ms-sql-s",
    1521 -> "oracle", 1723 -> "pptp", 2049 -> "nfs", 3128 -> "squid",
    3306 -> "mysql", 3389 -> "ms-wbt-server", 5060 -> "sip",
    5432 -> "postgresql", 5672 -> "amqp", 6379 -> "redis",
    8080 -> "http-alt", 9092 -> "kafka", 11211 -> "memcache",
    27017 -> "mongodb")

  /** Well-known service names: the full system services DB when present
    * (the reference builds its whole 65536-entry table from it), else
    * the built-in subset. Loaded once per JVM; the oracle SQL generator
    * derives its VALUES list from this same map, so engine and oracle
    * stay in lockstep whichever source won. */
  val servicesByPort: Map[Int, String] = {
    val p = java.nio.file.Paths.get("/etc/services")
    try {
      if (java.nio.file.Files.isReadable(p))
        parseServices(java.nio.file.Files.readString(p))
      else builtinServices
    } catch { case _: java.io.IOException => builtinServices }
  }

  private lazy val servicesLit =
    typedlit(servicesByPort.map { case (k, v) => k.toLong -> v })

  private def serviceName(port: Column): Column =
    element_at(servicesLit, port.cast(LongType))

  /** portstr(port): "https (443)" when known, "443"-style otherwise
    * (reference utils.c:28-37 — note the space before the paren). */
  def portstr(port: Column): Column = {
    val nm = serviceName(port)
    when(nm.isNotNull, concat(nm, lit(" ("), port.cast(StringType), lit(")")))
      .otherwise(port.cast(StringType))
  }

  /** ppstr(p1,p2): ports-pair display string (reference utils.c:39-77).
    * Branch structure mirrors ports_pair_to_str exactly, including the
    * quirk that (p1 > p2, unknown, known) has no explicit return and
    * falls through with "-> s2(p2)". */
  def ppstr(p1: Column, p2: Column): Column = {
    val s1 = serviceName(p1)
    val s2 = serviceName(p2)
    def named(s: Column, p: Column) =
      concat(s, lit("("), p.cast(StringType), lit(")"))
    when(s1.isNotNull && s2.isNotNull,
      concat(named(s1, p1), lit(" -> "), named(s2, p2)))
      .when(p1 === p2,
        concat(p1.cast(StringType), lit(" -> "), p2.cast(StringType)))
      .when(p1 < p2,
        when(s2.isNotNull, // s1 unknown here
          concat(p1.cast(StringType), lit(" -> "), named(s2, p2)))
          .when(s1.isNotNull, concat(named(s1, p1), lit(" ->")))
          .otherwise(concat(p1.cast(StringType), lit(" ->"))))
      .otherwise(
        when(s1.isNull && s2.isNull, concat(lit("-> "), p2.cast(StringType)))
          .when(s1.isNull && s2.isNotNull, concat(lit("-> "), named(s2, p2)))
          .when(s1.isNotNull && s2.isNull,
            concat(named(s1, p1), lit(" -> "), p2.cast(StringType)))
          .otherwise(lit("")))
  }

  /** Uncompressed lowercase IPv6 display of a binary(16) column: hex
    * groups ':'-joined ("2001:0db8:...:0001"). Internal/stateful uses
    * (mavg keys, limits files) keep this form — it is stable, sortable,
    * and round-trips through the limits-file parser. Outward-facing
    * sinks render [[ip6Compressed]] for inet_ntop parity. */
  def ip6str(ip: Column): Column =
    lower(regexp_replace(hex(ip), "(.{4})(?=.)", "$1:"))

  /** RFC 5952 compressed IPv6 display of a 16-byte address — the form
    * inet_ntop prints and the reference writes into SQL exports and
    * notification args (monit-objects-fwm.c INET rendering): lowercase,
    * no leading zeros, the longest (leftmost on tie) run of ≥2 zero
    * groups collapsed to "::". Driver-side render for post-aggregation
    * sink output (bounded rows), not a hot-path column expression. */
  def ip6Compressed(b: Array[Byte]): String = {
    require(b != null && b.length == 16, "IPv6 address must be 16 bytes")
    val g = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) |
      (b(2 * i + 1) & 0xff))
    var best = -1
    var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { best = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    // RFC 5952 §5 / inet_ntop parity: IPv4-MAPPED addresses render in
    // mixed notation ("::ffff:1.2.3.4", not "::ffff:102:304") — the
    // form every tool prints and every SQL INET parser accepts
    val v4mapped = (0 until 10).forall(b(_) == 0) &&
      b(10) == -1 && b(11) == -1
    if (v4mapped)
      "::ffff:" + (12 until 16).map(b(_) & 0xff).mkString(".")
    // RFC 5952 §4.2.1: a single zero group is NOT compressed
    else if (bestLen < 2) g.map(_.toHexString).mkString(":")
    else g.take(best).map(_.toHexString).mkString(":") + "::" +
      g.drop(best + bestLen).map(_.toHexString).mkString(":")
  }

  /** Dotted-quad display of an unsigned-IPv4-in-Long column. */
  def ip4str(ip: Column): Column =
    concat_ws(".",
      (shiftright(ip.cast(LongType), 24) % 256).cast(StringType),
      (shiftright(ip.cast(LongType), 16) % 256).cast(StringType),
      (shiftright(ip.cast(LongType), 8) % 256).cast(StringType),
      (ip.cast(LongType) % 256).cast(StringType))
}
