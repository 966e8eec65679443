package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

/** Longest-prefix-match lookup structures.
  *
  * The reference keeps IP lists and GeoIP/AS databases in bitwise tries
  * (reference ip-btrie.h:4-115, geoip.c:91-183) consulted per record. The
  * Spark-native equivalent: flatten the prefix set into DISJOINT sorted
  * intervals at build time (boundary sweep, longest prefix wins inside
  * overlaps), broadcast the arrays, and binary-search per row. Read-only,
  * O(log n), executor-local — the same access pattern the reference gets
  * from its mmap'd tries, but shared across a cluster via the broadcast.
  */
object Lpm {

  /** One source prefix: [start,end] inclusive, maskLen for LPM priority. */
  final case class Prefix(start: BigInt, end: BigInt, maskLen: Int,
                          value: String)

  /** The empty LPM table (every lookup misses). */
  val emptyTable: Table = Table(Array.empty, Array.empty, Array.empty)

  /** Disjoint-interval LPM table (values aligned with bounds). */
  final case class Table(starts: Array[BigInt], ends: Array[BigInt],
                         values: Array[String]) extends Serializable {
    def lookup(ip: BigInt): Option[String] = {
      var lo = 0
      var hi = starts.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= ip) { found = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      if (found >= 0 && ends(found) >= ip) Some(values(found)) else None
    }
  }

  /** Sweep overlapping prefixes into disjoint intervals; inside an overlap
    * the longest mask wins (LPM semantics of the reference tries).
    * O(n log n) boundary sweep — production geo/AS databases have
    * hundreds of thousands of prefixes (reference xemkgeodb builds
    * them offline; we build at broadcast time). */
  def build(prefixes: Seq[Prefix]): Table = {
    if (prefixes.isEmpty) return Table(Array.empty, Array.empty, Array.empty)
    // events: open at start, close at end+1; CIDR prefixes nest, so at
    // any point the active prefix with the longest mask wins
    val events = prefixes.zipWithIndex.flatMap { case (p, id) =>
      Seq((p.start, true, id), (p.end + 1, false, id))
    }.sortBy(_._1)
    val byId = prefixes.toArray
    // active prefixes ordered by (maskLen, id)
    val active = new java.util.TreeMap[(Int, Int), Int](
      Ordering.Tuple2[Int, Int])
    val ss = Array.newBuilder[BigInt]
    val es = Array.newBuilder[BigInt]
    val vs = Array.newBuilder[String]
    var i = 0
    var prev: BigInt = null
    while (i < events.length) {
      val point = events(i)._1
      if (prev != null && prev < point && !active.isEmpty) {
        ss += prev
        es += point - 1
        vs += byId(active.lastEntry().getValue).value
      }
      while (i < events.length && events(i)._1 == point) {
        val (_, open, id) = events(i)
        val key = (byId(id).maskLen, id)
        if (open) active.put(key, id) else active.remove(key)
        i += 1
      }
      prev = point
    }
    // merge adjacent intervals with equal values
    val (s0, e0, v0) = (ss.result(), es.result(), vs.result())
    val ms = Array.newBuilder[BigInt]
    val me = Array.newBuilder[BigInt]
    val mv = Array.newBuilder[String]
    var j = 0
    while (j < s0.length) {
      var end = e0(j)
      var k = j + 1
      while (k < s0.length && s0(k) == end + 1 && v0(k) == v0(j)) {
        end = e0(k); k += 1
      }
      ms += s0(j); me += end; mv += v0(j)
      j = k
    }
    Table(ms.result(), me.result(), mv.result())
  }

  def v4Prefix(cidr: String, value: String = ""): Prefix = {
    val (a, m) = splitCidr(cidr, 32)
    // validate, don't fold: "10.0.0/8" or "999.0.0.0/8" silently built
    // a WRONG interval before r11 — a filter list that matches the
    // wrong /8 is far worse than a config error
    val parts = a.split('.')
    // ASCII digits only: Char.isDigit also accepts Unicode numerals,
    // which Integer.parseInt would happily parse into a wrong interval
    require(parts.length == 4 &&
      parts.forall(p => p.nonEmpty &&
        p.forall(c => c >= '0' && c <= '9') &&
        p.length <= 3 && p.toInt <= 255),
      s"malformed IPv4 address in CIDR '$cidr'")
    val addr = BigInt(parts.foldLeft(0L)((acc, p) => acc * 256 + p.toLong))
    val span = BigInt(1) << (32 - m)
    val start = (addr / span) * span
    Prefix(start, start + span - 1, m, value)
  }

  def v6Prefix(cidr: String, value: String = ""): Prefix = {
    val (a, m) = splitCidr(cidr, 128)
    // only accept literals: getByName on a non-literal would do a
    // blocking DNS lookup at table-build time
    require(a.contains(':'), s"not an IPv6 literal: '$a'")
    val raw = java.net.InetAddress.getByName(a).getAddress
    // Java parses "::ffff:a.b.c.d" into an Inet4Address (4 bytes) —
    // rebuild the RFC 4291 v4-mapped 16-byte form instead of rejecting
    // a legitimate v6 CIDR
    val bytes =
      if (raw.length == 4)
        Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++ raw
      else raw
    require(bytes.length == 16, s"not an IPv6 address: $a")
    val addr = BigInt(1, bytes)
    val span = BigInt(1) << (128 - m)
    val start = (addr / span) * span
    Prefix(start, start + span - 1, m, value)
  }

  private def splitCidr(cidr: String, maxLen: Int): (String, Int) = {
    val idx = cidr.indexOf('/')
    if (idx < 0) (cidr, maxLen)
    else {
      val m = cidr.substring(idx + 1).toInt
      // an unchecked mask fails far from the cause: /33 makes the span
      // BigInt(1) << -1 == 0 → "BigInteger divide by zero"; a negative
      // mask silently over-matches everything
      require(m >= 0 && m <= maxLen,
        s"mask /$m out of range [0, $maxLen] in CIDR '$cidr'")
      (cidr.substring(0, idx), m)
    }
  }

}

/** A named IP list (v4 + v6 prefixes), the engine's analog of the
  * reference's IP-list files (reference iplist.c, CONFIG.md:471-481). */
final case class IpList(name: String, v4: Lpm.Table, v6: Lpm.Table)
  extends Serializable

object IpList {
  def apply(name: String, cidrs: Seq[String]): IpList = {
    val (v6s, v4s) = cidrs.partition(_.contains(":"))
    IpList(name,
      Lpm.build(v4s.map(c => Lpm.v4Prefix(c, "1"))),
      Lpm.build(v6s.map(c => Lpm.v6Prefix(c, "1"))))
  }
}

/** GeoIP + AS providers over LPM tables (reference geoip.h:13-41).
  * Values are pipe-joined records; accessors slice out one attribute.
  * Missing lookups yield "?" exactly like the reference
  * (filter.c:753-787: unknown IP → '?'). IPv6 is first-class like the
  * reference's `xe_ip`/__int128 tries (geoip.h:43-55): the v6 tables
  * feed the two-long codegen'd search ([[Lpm6Packed]]).
  */
final case class GeoDb(geo4: Lpm.Table, as4: Lpm.Table,
                       geo6: Lpm.Table = Lpm.emptyTable,
                       as6: Lpm.Table = Lpm.emptyTable)
  extends Serializable {
  import GeoDb._
  import org.apache.spark.sql.functions.{coalesce, lit}

  /** Geo attribute lookup via the codegen'd LPM expression
    * ([[LpmExpr]]); NULL input → "?" like the reference
    * (filter.c:753-787). The spark param is kept for API symmetry with
    * the v6/UDF paths; the expression ships its table in the task
    * binary (small, read-only — the broadcast analog). */
  def geoAttr(spark: SparkSession, kind: String)(ip: Column): Column =
    coalesce(
      LpmExpr.lookup4(geo4, attrIndex(kind), Some("?"))(ip), lit("?"))

  /** asn(ip): AS number as string, "?" when unknown. */
  def asn(spark: SparkSession)(ip: Column): Column =
    coalesce(LpmExpr.lookup4(as4, 0, Some("?"))(ip), lit("?"))
  /** asd(ip): AS description, "?" when unknown. */
  def asd(spark: SparkSession)(ip: Column): Column =
    coalesce(LpmExpr.lookup4(as4, 1, Some("?"))(ip), lit("?"))

  /** Geo attribute over a binary(16) IPv6 column. */
  def geoAttr6(spark: SparkSession, kind: String)(ip: Column): Column =
    coalesce(
      LpmExpr.lookup6(geo6, attrIndex(kind), Some("?"))(ip), lit("?"))

  /** asn(ip6) over a binary(16) column. */
  def asn6(spark: SparkSession)(ip: Column): Column =
    coalesce(LpmExpr.lookup6(as6, 0, Some("?"))(ip), lit("?"))
  /** asd(ip6) over a binary(16) column. */
  def asd6(spark: SparkSession)(ip: Column): Column =
    coalesce(LpmExpr.lookup6(as6, 1, Some("?"))(ip), lit("?"))
}

object GeoDb {
  /** Attribute order inside a geo record value
    * (continent|country_code|country|state|city|zip|lat|long). */
  val attrs: Seq[String] = Seq("continent", "country_code", "country",
    "state", "city", "zip", "lat", "long")
  def attrIndex(kind: String): Int = {
    val i = attrs.indexOf(kind)
    require(i >= 0, s"unknown geo attribute '$kind'")
    i
  }

  def record(continent: String, cc: String, country: String, state: String,
             city: String, zip: String, lat: String, long: String): String =
    Seq(continent, cc, country, state, city, zip, lat, long).mkString("|")
}
