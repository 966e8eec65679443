package graft.flow

import graft.functions.{GeoDb, IpList, Lpm}

/** Deterministic built-in lookup tables for the test/query surface.
  *
  * The reference ships GeoIP/AS databases as external mmap'd files built
  * by xemkgeodb (reference geoip.c, EXTRA.md:278-292) and IP lists as
  * config files (CONFIG.md:471-481). The engine loads arbitrary tables the
  * same way (any Seq[Lpm.Prefix] → broadcast LPM); these literal ones give
  * the driver-checked queries a reproducible database.
  */
object BuiltinTables {

  /** Geo records over the test flow's 192.0.0.0/8 destination space,
    * including nested prefixes so LPM precedence is actually exercised. */
  val geoPrefixes: Seq[Lpm.Prefix] = Seq(
    Lpm.v4Prefix("192.0.0.0/10",
      GeoDb.record("EU", "de", "Germany", "BY", "Munich", "80331",
        "48.14", "11.58")),
    Lpm.v4Prefix("192.64.0.0/10",
      GeoDb.record("NA", "us", "USA", "CA", "San Jose", "95113",
        "37.34", "-121.89")),
    Lpm.v4Prefix("192.128.0.0/10",
      GeoDb.record("AS", "jp", "Japan", "13", "Tokyo", "100-0001",
        "35.68", "139.77")),
    Lpm.v4Prefix("192.192.0.0/10",
      GeoDb.record("SA", "br", "Brazil", "SP", "Sao Paulo", "01000-000",
        "-23.55", "-46.63")),
    // finer override inside the de /10 → LPM must pick this one
    Lpm.v4Prefix("192.0.2.0/24",
      GeoDb.record("EU", "fr", "France", "IDF", "Paris", "75001",
        "48.86", "2.35")),
    // sources (10.0.0.0/8 space)
    Lpm.v4Prefix("10.0.0.0/8",
      GeoDb.record("EU", "nl", "Netherlands", "NH", "Amsterdam", "1011",
        "52.37", "4.90"))
  )

  /** AS records over the 10.0.0.0/12 source space (asn|description). */
  val asPrefixes: Seq[Lpm.Prefix] = Seq(
    Lpm.v4Prefix("10.0.0.0/14", "64500|EXAMPLE-NET-A"),
    Lpm.v4Prefix("10.4.0.0/14", "64501|EXAMPLE-NET-B"),
    Lpm.v4Prefix("10.8.0.0/14", "64502|EXAMPLE-NET-C"),
    Lpm.v4Prefix("10.12.0.0/14", "64503|EXAMPLE-NET-D")
  )

  lazy val geoDb: GeoDb = GeoDb(Lpm.build(geoPrefixes), Lpm.build(asPrefixes))

  /** Standard IP lists (bogon per RFC 1918 + friends). */
  lazy val ipLists: Map[String, IpList] = Map(
    "bogon" -> IpList("bogon", Seq(
      "0.0.0.0/8", "10.0.0.0/8", "100.64.0.0/10", "127.0.0.0/8",
      "169.254.0.0/16", "172.16.0.0/12", "192.0.2.0/24", "192.168.0.0/16",
      "198.18.0.0/15", "::/8", "fc00::/7", "fe80::/10")),
    "testdst" -> IpList("testdst", Seq("192.0.0.0/12", "192.32.0.0/13")))

  /** IANA protocol names used for class naming (reference
    * STEP-BY-STEP.md:754-765 does this downstream via a dim join). */
  val protoNames: Map[Long, String] =
    Map(1L -> "icmp", 6L -> "tcp", 17L -> "udp")
}
