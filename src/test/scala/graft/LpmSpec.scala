package graft

import graft.filter.FieldSpec
import graft.functions.{GeoDb, IpList, Lpm}

class LpmSpec extends SparkTest {

  test("longest prefix wins inside overlaps (ip-btrie.h semantics)") {
    val t = Lpm.build(Seq(
      Lpm.v4Prefix("10.0.0.0/8", "coarse"),
      Lpm.v4Prefix("10.1.0.0/16", "fine"),
      Lpm.v4Prefix("10.1.2.0/24", "finest")))
    def ip(s: String) = BigInt(s.split('.')
      .foldLeft(0L)((a, p) => a * 256 + p.toLong))
    assert(t.lookup(ip("10.0.0.1")).contains("coarse"))
    assert(t.lookup(ip("10.1.0.1")).contains("fine"))
    assert(t.lookup(ip("10.1.2.3")).contains("finest"))
    assert(t.lookup(ip("10.1.3.1")).contains("fine"))
    assert(t.lookup(ip("11.0.0.1")).isEmpty)
    assert(t.lookup(ip("9.255.255.255")).isEmpty)
  }

  test("non-aligned CIDR is canonicalized to its network address") {
    val t = Lpm.build(Seq(Lpm.v4Prefix("10.1.2.3/24", "x")))
    def ip(s: String) = BigInt(s.split('.')
      .foldLeft(0L)((a, p) => a * 256 + p.toLong))
    assert(t.lookup(ip("10.1.2.0")).contains("x"))
    assert(t.lookup(ip("10.1.2.255")).contains("x"))
    assert(t.lookup(ip("10.1.3.0")).isEmpty)
  }

  test("IPv6 list membership") {
    val l = IpList("v6", Seq("2001:db8::/32", "fc00::/7"))
    def ip6(s: String) =
      BigInt(1, java.net.InetAddress.getByName(s).getAddress)
    assert(l.v6.lookup(ip6("2001:db8::1")).isDefined)
    assert(l.v6.lookup(ip6("fd12:3456::1")).isDefined)
    assert(l.v6.lookup(ip6("2001:db9::1")).isEmpty)
  }

  test("geo record attribute slicing") {
    val rec = GeoDb.record("EU", "de", "Germany", "BY", "Munich",
      "80331", "48.1", "11.5")
    assert(rec.split('|')(GeoDb.attrIndex("country_code")) == "de")
    assert(rec.split('|')(GeoDb.attrIndex("lat")) == "48.1")
  }

  test("FieldSpec parses '[src|dst] name [asc|desc]' " +
    "(filter-parser.c:393-485)") {
    val Right(f1) = FieldSpec.parse("octets desc")
    assert(f1.isAggr && f1.descending && f1.scale == 1 &&
      f1.sqlName == "octets")
    val Right(f2) = FieldSpec.parse("bits")
    assert(f2.isAggr && f2.scale == 8)
    val Right(f3) = FieldSpec.parse("src host")
    assert(!f3.isAggr && f3.sqlName == "src_host")
    val Right(f4) = FieldSpec.parse("div(octets, packets) asc")
    assert(f4.func.isDefined && f4.sqlName == "div_octets__packets_")
    assert(FieldSpec.parse("nonsense here").isLeft)
  }
}
