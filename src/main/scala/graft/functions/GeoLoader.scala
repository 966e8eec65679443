package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** GeoIP / AS database loader (reference xemkgeodb.c — the offline tool
  * that turns public geo dumps into the collector's mmap'd tries,
  * geo rows process_line_ipapi:292-360, AS rows process_line_as:686-731,
  * range→subnet split add_range4:104-183/add_range6:186-289).
  *
  * Formats (CSV, '#' comments, quoted fields allowed):
  *  - geo:  `ip_ver,first,last,continent,country_code,country,state,
  *           city,zip,timezone,lat,long` — address RANGES, not CIDR;
  *           continent and country code are lowercased like the
  *           reference (xemkgeodb.c:321-327);
  *  - AS:   `first,last,asn,description` — v4/v6 auto-detected per row
  *           (the reference tries inet_pton(AF_INET6) first).
  *
  * Ranges are split into maximal aligned CIDR prefixes (the reference's
  * subnet walk), then flow into [[Lpm.build]]'s disjoint-interval sweep
  * — so nested dump rows get true longest-prefix precedence. The result
  * is the same broadcastable [[Lpm.Table]] the synthetic tables use; at
  * 100 TB scale the tables are built once on the driver and shipped
  * read-only to every executor.
  */
object GeoLoader {

  final case class Tables(v4: Lpm.Table, v6: Lpm.Table)

  /** Split one CSV line, honoring double-quoted fields (AS descriptions
    * and city names contain commas in the public dumps). */
  def csvFields(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            cur += '"'; i += 1 // escaped quote
          } else inQ = false
        } else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result().trim; cur.clear()
        case _   => cur += c
      }
      i += 1
    }
    out += cur.result().trim
    out.result()
  }

  def ipv4ToBig(s: String): BigInt = {
    val parts = s.trim.split('.')
    require(parts.length == 4, s"not an IPv4 address: '$s'")
    BigInt(parts.foldLeft(0L) { (a, p) =>
      val v = p.toLongOption.getOrElse(-1L)
      require(v >= 0 && v <= 255, s"not an IPv4 address: '$s'")
      a * 256 + v
    })
  }

  def ipv6ToBig(s: String): BigInt = {
    val t = s.trim
    // refuse anything that isn't a v6 literal BEFORE InetAddress sees
    // it: getByName on a non-literal is a DNS lookup, and a dump field
    // must never trigger one. A ':' is the discriminator (hostnames
    // cannot contain one); '.' stays allowed for the RFC 4291 embedded
    // dotted-quad forms (::ffff:10.0.0.1, 64:ff9b::192.0.2.1).
    require(t.contains(":") &&
      t.forall(c => Character.digit(c, 16) >= 0 || c == ':' || c == '.'),
      s"not an IPv6 address literal: '$s'")
    val bytes =
      try java.net.InetAddress.getByName(t).getAddress
      catch { case _: java.net.UnknownHostException =>
        throw new IllegalArgumentException(s"not an IPv6 address: '$s'") }
    bytes.length match {
      case 16 => BigInt(1, bytes)
      // Java collapses ::ffff:a.b.c.d to an Inet4Address — rebuild the
      // 128-bit v4-mapped value (RFC 4291 §2.5.5.2)
      case 4 => (BigInt(0xffff) << 32) + BigInt(1, bytes)
      case _ =>
        throw new IllegalArgumentException(s"not an IPv6 address: '$s'")
    }
  }

  /** Split an inclusive address range into maximal aligned CIDR
    * prefixes (reference add_range4/add_range6 walk): at each step take
    * the largest power-of-two block that starts aligned at `start` and
    * fits inside the range. ≤ 2·bits prefixes per range. */
  def rangeToPrefixes(start: BigInt, end: BigInt, bits: Int,
                      value: String): Seq[Lpm.Prefix] = {
    require(start <= end && start >= 0, s"bad range $start..$end")
    val out = Seq.newBuilder[Lpm.Prefix]
    var s = start
    while (s <= end) {
      val alignBit = if (s == 0) bits else math.min(s.lowestSetBit, bits)
      var size = BigInt(1) << alignBit
      while (s + size - 1 > end) size >>= 1
      val maskLen = bits - (size.bitLength - 1)
      out += Lpm.Prefix(s, s + size - 1, maskLen, value)
      s += size
    }
    out.result()
  }

  /** Non-comment lines as (1-based line number, fields); parse errors
    * rethrow with the offending line's number and text — the dumps are
    * user-supplied files fed through a CLI. */
  private def dataLines(text: String): Iterator[(Int, Seq[String])] =
    text.linesIterator.zipWithIndex
      .map { case (l, i) => (i + 1, l.trim) }
      .filter { case (_, l) => l.nonEmpty && !l.startsWith("#") }
      .map { case (n, l) => (n, csvFields(l)) }

  private def withLine[A](n: Int)(body: => A): A =
    try body
    catch { case e: IllegalArgumentException =>
      throw new IllegalArgumentException(s"line $n: ${e.getMessage}") }

  /** Parse a geo dump (ipapi format) into v4 + v6 prefix sets. */
  def parseGeoPrefixes(text: String): (Seq[Lpm.Prefix], Seq[Lpm.Prefix]) = {
    val v4 = Seq.newBuilder[Lpm.Prefix]
    val v6 = Seq.newBuilder[Lpm.Prefix]
    dataLines(text).foreach { case (n, f) => withLine(n) {
      require(f.length >= 12, s"geo row needs 12 fields, got ${f.length}")
      // field 9 is the timezone — unused, like the reference
      val rec = GeoDb.record(f(3).toLowerCase, f(4).toLowerCase, f(5),
        f(6), f(7), f(8), f(10), f(11))
      if (f(0) == "6")
        v6 ++= rangeToPrefixes(ipv6ToBig(f(1)), ipv6ToBig(f(2)), 128, rec)
      else
        v4 ++= rangeToPrefixes(ipv4ToBig(f(1)), ipv4ToBig(f(2)), 32, rec)
    }}
    (v4.result(), v6.result())
  }

  /** Parse an AS dump into v4 + v6 prefix sets (value `asn|descr`). */
  def parseAsPrefixes(text: String): (Seq[Lpm.Prefix], Seq[Lpm.Prefix]) = {
    val v4 = Seq.newBuilder[Lpm.Prefix]
    val v6 = Seq.newBuilder[Lpm.Prefix]
    dataLines(text).foreach { case (n, f) => withLine(n) {
      require(f.length >= 4, s"AS row needs 4 fields, got ${f.length}")
      val asn = f(2).toIntOption.getOrElse(0) // reference atoi
      val rec = s"$asn|${f(3)}"
      if (f(0).contains(":"))
        v6 ++= rangeToPrefixes(ipv6ToBig(f(0)), ipv6ToBig(f(1)), 128, rec)
      else
        v4 ++= rangeToPrefixes(ipv4ToBig(f(0)), ipv4ToBig(f(1)), 32, rec)
    }}
    (v4.result(), v6.result())
  }

  def geoTables(text: String): Tables = {
    val (v4, v6) = parseGeoPrefixes(text)
    Tables(Lpm.build(v4), Lpm.build(v6))
  }

  def asTables(text: String): Tables = {
    val (v4, v6) = parseAsPrefixes(text)
    Tables(Lpm.build(v4), Lpm.build(v6))
  }

  /** Load a [[GeoDb]] from dump files (the reference's geodb dir holds
    * geo + AS databases side by side, CONFIG.md:104-106). */
  def fromFiles(geoPath: String, asPath: String): GeoDb = {
    def read(p: String) =
      new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)
    val g = geoTables(read(geoPath))
    val a = asTables(read(asPath))
    GeoDb(g.v4, a.v4, g.v6, a.v6)
  }
}
