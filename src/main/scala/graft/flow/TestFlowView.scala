package graft.flow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Deterministic flow-record view over the driver's `events` table.
  *
  * The harness test data is a TPC-H-ish star schema (TESTDATA.md), not
  * packet captures, so the flow pipeline is exercised by deriving the
  * canonical columns of FlowSchema from `events` with pure integer
  * arithmetic. Every derivation below is PORTABLE SQL evaluated by BOTH
  * engines — Spark via `expr()` and DuckDB via the generated CTE — which
  * makes the DuckDB oracle exact (integer-only, no float divergence).
  *
  * `events.ts` is nanosecond-precision parquet; Spark reads it as a Long
  * of nanos (4.0, legacy nanosAsLong conf) or TIMESTAMP_NTZ (>= 4.1) and
  * DuckDB as TIMESTAMP_NS, so the shared column is `ts_sec` = epoch
  * seconds (engine- and version-specific expression, identical result —
  * see [[fromEvents]]).
  */
object TestFlowView {

  /** (column name, portable SQL over events columns). */
  val derivations: Seq[(String, String)] = Seq(
    // 10.0.0.0/8 sources: 10.0.x.x over a 2^20 span (= one /12)
    "ip4_src_addr" -> ("CAST(167772160 + (user_id * 7919) % 1048576 " +
      "AS BIGINT)"),
    // 192.0.0.0/8 destinations spread over 16M addresses
    "ip4_dst_addr" -> ("CAST(3221225472 + (event_id * 2654435761) % " +
      "16777216 AS BIGINT)"),
    "l4_src_port" -> ("CAST(CASE WHEN event_id % 3 = 0 THEN 443 " +
      "WHEN event_id % 5 = 0 THEN 80 WHEN event_id % 7 = 0 THEN 53 " +
      "ELSE 1024 + (event_id * 7919) % 64511 END AS BIGINT)"),
    "l4_dst_port" -> ("CAST(CASE WHEN user_id % 2 = 0 THEN 443 " +
      "WHEN user_id % 5 = 0 THEN 22 " +
      "ELSE 1 + (user_id * 13) % 65535 END AS BIGINT)"),
    "protocol" -> ("CAST(CASE WHEN event_id % 4 < 2 THEN 6 " +
      "WHEN event_id % 4 = 2 THEN 17 ELSE 1 END AS BIGINT)"),
    "tcp_flags" -> ("CAST(CASE WHEN event_id % 4 < 2 " +
      "THEN 2 + (event_id % 29) ELSE 0 END AS BIGINT)"),
    "in_bytes" -> "CAST(FLOOR(value * 100) AS BIGINT) + 64",
    "in_pkts" -> "CAST((event_id % 100) + 1 AS BIGINT)",
    "sampling_rate" -> "CAST(1 + (user_id % 3) AS BIGINT)",
    "src_as" -> "CAST(64496 + (user_id % 8) AS BIGINT)",
    "dst_as" -> "CAST(64496 + (event_id % 16) AS BIGINT)",
    "input_snmp" -> "CAST(1 + (user_id % 4) AS BIGINT)",
    "output_snmp" -> "CAST(1 + (event_id % 4) AS BIGINT)",
    "dev_ip" -> "CAST(100 + (user_id % 2) AS BIGINT)",
    "dev_id" -> "CAST(0 AS BIGINT)",
    // string dimension for StringL predicates (TLS SNI); NULL on most
    // rows like real payload-derived columns
    "sni" -> ("CASE WHEN event_id % 5 = 0 THEN 'video.example.com' " +
      "WHEN event_id % 5 = 1 THEN 'cdn.example.org' ELSE NULL END"),
    // the 6-bit ids embedded in the Spark-only binary MACs below —
    // oracle predicates on `mac` mirror on these integers
    "src_mac_id" -> "CAST(user_id % 64 AS BIGINT)",
    "dst_mac_id" -> "CAST(event_id % 64 AS BIGINT)"
  )

  /** Spark-only columns (binary, never read by a DuckDB oracle): IPv6
    * addresses embedding the v4 test addresses NAT64-style (RFC 6052
    * shape) at 2001:db8::/96 (src) and 2001:db8:1::/96 (dst). v6 oracle
    * predicates mirror on the embedded v4 integer instead, so oracle
    * SQL needs no blob support. Catalyst prunes these from every query
    * that doesn't read them (one projection over the scan). */
  val sparkOnlyDerivations: Seq[(String, String)] = Seq(
    "ip6_src_addr" -> ("unhex(concat('20010DB80000000000000000', " +
      "lpad(hex(167772160 + (user_id * 7919) % 1048576), 8, '0')))"),
    "ip6_dst_addr" -> ("unhex(concat('20010DB80001000000000000', " +
      "lpad(hex(3221225472 + (event_id * 2654435761) % 16777216), " +
      "8, '0')))"),
    // locally-administered MACs 02:00:00:00:00:xx embedding a 6-bit id;
    // MacL oracle predicates mirror on the embedded integer
    "src_mac" -> ("unhex(lpad(hex(2199023255552 + user_id % 64), " +
      "12, '0'))"),
    "dst_mac" -> ("unhex(lpad(hex(2199023255552 + event_id % 64), " +
      "12, '0'))"))

  /** Spark side: events DataFrame → flow. `events.ts` is
    * TIMESTAMP(NANOS) parquet, whose Spark-side type depends on the
    * runtime: Spark 4.0 only reads it as a raw Long of nanos (legacy
    * `nanosAsLong` conf), Spark ≥ 4.1 reads it natively as
    * TIMESTAMP_NTZ (and removed the conf — setting it is a silent
    * no-op). Branch the `ts_sec` derivation on the ACTUAL read schema
    * so both runtimes produce the identical epoch-seconds integer: the
    * session time zone is UTC everywhere (Bench, Verify, specs), so
    * the NTZ→TIMESTAMP cast is instant-exact, and second granularity
    * makes the nanos-vs-micros truncation irrelevant. */
  def fromEvents(events: DataFrame): DataFrame = {
    val tsSec = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("CAST(ts DIV 1000000000 AS BIGINT)")
      case _ => // TimestampNTZType (Spark >= 4.1) or TimestampType
        expr("unix_seconds(CAST(ts AS TIMESTAMP))")
    }
    events.select(
      (tsSec.as("ts_sec") +:
        expr("event_id").as("flow_id") +:
        (derivations ++ sparkOnlyDerivations)
          .map { case (n, e) => expr(e).as(n) }): _*)
  }

  def load(spark: SparkSession, sfDir: String): DataFrame = {
    // Spark 4.0 rejects TIMESTAMP(NANOS) parquet unless this legacy
    // conf maps it to Long; Spark >= 4.1 removed the conf (native NTZ
    // read) and ignores the set. Try-set for 4.0, adapt on schema.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    fromEvents(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** DuckDB side: the same derivations as a CTE body over `events`. */
  val duckdbCte: String = {
    val cols = ("CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_sec" +:
      "event_id AS flow_id" +:
      derivations.map { case (n, e) => s"$e AS $n" }).mkString(", ")
    s"flow AS (SELECT $cols FROM events)"
  }
}
