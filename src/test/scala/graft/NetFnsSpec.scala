package graft

import graft.functions.NetFns
import org.apache.spark.sql.functions.{col, lit}

class NetFnsSpec extends SparkTest {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("tfstr table matches reference layout (utils-data.inc)") {
    assert(NetFns.tcpFlagsTable(0) == "")
    assert(NetFns.tcpFlagsTable(1) == "FIN")
    assert(NetFns.tcpFlagsTable(2) == "SYN")
    assert(NetFns.tcpFlagsTable(3) == "SYN+FIN")
    assert(NetFns.tcpFlagsTable(5) == "RST+FIN")
    assert(NetFns.tcpFlagsTable(255) == "CWR+ECE+URG+ACK+PSH+RST+SYN+FIN")
    assert(eval1(NetFns.tfstr(lit(18L))) == "ACK+SYN")
  }

  test("portstr formats '<name> (<port>)' or bare number (utils.c:28-37)") {
    assert(eval1(NetFns.portstr(lit(443L))) == "https (443)")
    assert(eval1(NetFns.portstr(lit(22L))) == "ssh (22)")
    assert(eval1(NetFns.portstr(lit(12345L))) == "12345")
  }

  test("ppstr branch structure (utils.c:39-77)") {
    assert(eval1(NetFns.ppstr(lit(443L), lit(80L))) ==
      "https(443) -> http(80)")
    assert(eval1(NetFns.ppstr(lit(5L), lit(5L))) == "5 -> 5")
    // 45678/49999 sit in the dynamic range — unassigned in any services DB
    assert(eval1(NetFns.ppstr(lit(45678L), lit(49999L))) == "45678 ->")
    assert(eval1(NetFns.ppstr(lit(1000L), lit(443L))) == "-> https(443)")
    // p1<p2, s1 known, s2 unknown → "%s(%d) ->" (port2 dropped)
    assert(eval1(NetFns.ppstr(lit(443L), lit(45678L))) == "https(443) ->")
    // p1>p2, s1 known, s2 unknown → "%s(%d) -> %d"
    assert(eval1(NetFns.ppstr(lit(443L), lit(10L))) == "https(443) -> 10")
  }

  test("parseServices: services(5) format, first entry per port wins") {
    val txt = """# comment line
      |ftp-data  20/tcp
      |ftp       21/tcp
      |ssh       22/tcp  # The Secure Shell
      |ssh       22/udp
      |domain    53/tcp  nameserver
      |dns       53/udp  # later entry must NOT override (getservbyport)
      |kerberos  88/tcp  kerberos5 krb5 # aliases ignored
      |bad-line-without-port
      |noport    x/tcp
      |toobig    70000/tcp
      |""".stripMargin
    val m = NetFns.parseServices(txt)
    assert(m(20) == "ftp-data")
    assert(m(22) == "ssh")
    assert(m(53) == "domain") // first wins, like the reference's ports_db
    assert(m(88) == "kerberos")
    assert(!m.contains(70000))
    assert(m.size == 5)
  }

  test("servicesByPort prefers the full system services DB") {
    // the container ships /etc/services (~360 entries vs the 44-port
    // builtin) — the classic ports must resolve identically either way
    assert(NetFns.servicesByPort(443) == "https")
    assert(NetFns.servicesByPort(22) == "ssh")
    assert(NetFns.servicesByPort(80) == "http")
    if (java.nio.file.Files.isReadable(
        java.nio.file.Paths.get("/etc/services"))) {
      // a port the builtin subset lacks but the system DB names
      assert(NetFns.servicesByPort.size > NetFns.builtinServices.size)
    }
  }

  test("xdiv: integer division, 0 on zero divisor (filter.h:396-418)") {
    assert(eval1(NetFns.xdiv(lit(100L), lit(7L))) == 14L)
    assert(eval1(NetFns.xdiv(lit(100L), lit(0L))) == 0L)
  }

  test("xdivR rounds down to multiple of k (filter.h:409-415)") {
    assert(eval1(NetFns.xdivR(lit(1234L), lit(1L), 100)) == 1200L)
    assert(eval1(NetFns.xdivR(lit(99L), lit(1L), 100)) == 0L)
  }

  test("xdivL rounds down to power of k (filter.h:407-409)") {
    assert(eval1(NetFns.xdivL(lit(1234L), lit(1L), 10)) == 1000L)
    assert(eval1(NetFns.xdivL(lit(1000L), lit(1L), 10)) == 1000L)
    assert(eval1(NetFns.xdivL(lit(9L), lit(1L), 10)) == 1L)
    assert(eval1(NetFns.xdivL(lit(0L), lit(1L), 10)) == 0L)
    assert(eval1(NetFns.xdivL(lit(100L), lit(0L), 10)) == 0L)
  }

  test("ip4str dotted quad") {
    assert(eval1(NetFns.ip4str(lit(3221225985L))) == "192.0.2.1")
  }
}

class SqlFunctionsSpec extends SparkTest {
  test("function surface callable from spark.sql") {
    graft.functions.SqlFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT tfstr(18L) AS tf, portstr(443L) AS ps,
             ppstr(443L, 80L) AS pp, xdiv(100L, 7L) AS d,
             xdiv_l(1234L, 1L, 10) AS dl, ip4str(3221225985L) AS ip,
             country_code(3221225985L) AS cc, asn(167772161L) AS a,
             ip_in_list(167772161L, 'bogon') AS inlist
    """).collect()(0)
    assert(r.getAs[String]("tf") == "ACK+SYN")
    assert(r.getAs[String]("ps") == "https (443)")
    assert(r.getAs[String]("pp") == "https(443) -> http(80)")
    assert(r.getAs[Long]("d") == 14L)
    assert(r.getAs[Long]("dl") == 1000L)
    assert(r.getAs[String]("ip") == "192.0.2.1")
    assert(r.getAs[String]("cc") == "fr") // 192.0.2.x TEST-NET override
    assert(r.getAs[String]("a") == "64500")
    assert(r.getAs[Boolean]("inlist"))

    // curation bucket: matches the operator's definition and is stable
    val b = spark.sql("SELECT hash_bucket(42L) AS b").collect()(0)
      .getAs[Long]("b")
    assert(b >= 0 && b < 100)
    val b2 = spark.sql("SELECT hash_bucket(42L) AS b").collect()(0)
      .getAs[Long]("b")
    assert(b == b2)
  }

  test("GraftExtensions injects the full surface at session build " +
    "(registerFunctions path)") {
    // apply the extensions object and materialize its injections into
    // this session's registry — the same wiring
    // spark.sql.extensions=graft.GraftExtensions performs at build
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftBridge.registerInjectedFunctions(
      ext, spark.sessionState.functionRegistry)
    val r = spark.sql("""
      SELECT tfstr(18L) AS tf,
             vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
             country_code(3221225985L) AS cc
    """).collect()(0)
    assert(r.getAs[String]("tf") == "ACK+SYN")
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[String]("cc") == "fr")
  }

  test("vector function surface callable from spark.sql") {
    graft.functions.SqlFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT vec_dot(array(1.0F, 2.0F, 3.0F),
                     array(4.0F, 0.5F, -1.0F)) AS d,
             vec_cosine(array(3.0F, 4.0F), array(3.0F, 4.0F)) AS c,
             vec_cosine(array(0.0F, 0.0F), array(1.0F, 1.0F)) AS z,
             lsh_signature(array(1.0F, -1.0F, 0.5F, 2.0F), 4, 8) AS s
    """).collect()(0)
    assert(r.getAs[Double]("d") == 2.0)
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.isNullAt(r.fieldIndex("z"))) // zero norm → NULL, not error
    val sig = r.getAs[Long]("s")
    assert(sig >= 0 && sig < 256) // 8-bit signature
    // matches the Column-API signature exactly
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaApi = Seq(Seq(1.0f, -1.0f, 0.5f, 2.0f)).toDF("v")
      .select(graft.operators.Similarity.lshSignature(col("v"), 4, 8))
      .collect()(0).getLong(0)
    assert(sig == viaApi)
  }

  test("v6 function surface callable from spark.sql") {
    graft.functions.SqlFunctions.registerAll(spark)
    // 2001:db8:1::c000:0201 = dst-base + 192.0.2.1 (FR override);
    // 2001:db8::a04:0001 = src-base + 10.4.0.1 (EXAMPLE6-NET-B)
    val r = spark.sql("""
      SELECT country_code6(unhex('20010DB80001000000000000C0000201')) AS cc,
             asn6(unhex('20010DB800000000000000000A040001')) AS a,
             asd6(unhex('20010DB8000000000000000000000001')) AS miss,
             ip6str(unhex('20010DB80000000000000000C0000201')) AS s,
             ip6_in_list(unhex('FD120000000000000000000000000001'),
                         'bogon') AS inlist
    """).collect()(0)
    assert(r.getAs[String]("cc") == "fr")
    assert(r.getAs[String]("a") == "64601")
    assert(r.getAs[String]("miss") == "?")
    assert(r.getAs[String]("s") ==
      "2001:0db8:0000:0000:0000:0000:c000:0201")
    assert(r.getAs[Boolean]("inlist")) // fd12::1 ∈ fc00::/7
  }

  test("ip6Compressed: RFC 5952 rules (inet_ntop parity)") {
    import graft.functions.NetFns.ip6Compressed
    def v6(s: String): Array[Byte] =
      java.net.InetAddress.getByName(s).getAddress
    // longest run wins, not the first
    assert(ip6Compressed(v6("2001:0:0:1:0:0:0:1")) == "2001:0:0:1::1")
    // v4-MAPPED renders mixed (RFC 5952 §5, inet_ntop parity) — build
    // the 16-byte form by hand (Java parses the literal to 4 bytes)
    val mapped = Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++
      Array[Byte](1, 2, 3, 4)
    assert(ip6Compressed(mapped) == "::ffff:1.2.3.4")
    // leftmost on tie
    assert(ip6Compressed(v6("2001:db8:0:0:1:0:0:1")) == "2001:db8::1:0:0:1")
    // a single zero group is not compressed (§4.2.2)
    assert(ip6Compressed(v6("2001:db8:0:1:1:1:1:1")) == "2001:db8:0:1:1:1:1:1")
    // no leading zeros, lowercase (§4.1, §4.3)
    assert(ip6Compressed(v6("2001:0DB8::0001")) == "2001:db8::1")
    // unspecified + loopback + trailing/leading runs
    assert(ip6Compressed(v6("::")) == "::")
    assert(ip6Compressed(v6("::1")) == "::1")
    assert(ip6Compressed(v6("fe80::")) == "fe80::")
    // full address: nothing to compress
    assert(ip6Compressed(v6("2001:db8:1:2:3:4:5:6")) ==
      "2001:db8:1:2:3:4:5:6")
  }
}
