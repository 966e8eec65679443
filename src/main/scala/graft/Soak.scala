package graft

import graft.filter.{Compiler, FilterEnv}
import graft.operators.Fwm
import graft.sinks.AlertSink
import graft.sources.NetflowDecoder
import graft.streaming.MavgStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming soak main (VERDICT r4 #8): drives the full hot path —
  * rate source → synthesized NetFlow v9 packets (template + data per
  * packet, template ids churning past the cache cap) → decoder →
  * filter DSL → fwm windowed aggregation + mavg threshold alerting with
  * the notification-file sink — for SPARK_GRAFT_SOAK_SECS seconds at
  * SPARK_GRAFT_SOAK_RPS packets/s, then prints one JSON line with
  * sustained rates and state-store footprint. Record results in
  * SCALE.md.
  */
object Soak {

  /** Self-contained packet i: header + template + one data record.
    * Alternates NetFlow v9 and IPFIX (both hot paths exercised), and
    * every 32nd IPFIX packet (i % 64 == 1 over odd i) additionally
    * carries an options template + options data record announcing a
    * sampling rate — driving the epoch-keyed sampling store under load.
    * Template id rotates through 16384 values — past the decoder
    * cache's LRU cap, proving bounded template state under churn. */
  def mkPacket(i: Long): Array[Byte] = {
    def u16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tid = 256 + (i % 16384).toInt
    val rec = u32(64L + i % 1400) ++
      Array[Byte]((if (i % 3 == 0) 17 else 6).toByte) ++
      u32(0x0a000000L + i % 256) ++ u32(0xc0000000L + i % 65536) ++
      u16((i % 50000).toInt)
    if (i % 2 == 0) {
      // NetFlow v9: template flowset + data flowset
      val header = u16(9) ++ u16(2) ++ u32(0) ++ u32(1700000000L + i) ++
        u32(i) ++ u32(1)
      val tmpl = u16(0) ++ u16(28) ++ u16(tid) ++ u16(5) ++
        u16(1) ++ u16(4) ++ u16(4) ++ u16(1) ++ u16(8) ++ u16(4) ++
        u16(12) ++ u16(4) ++ u16(11) ++ u16(2)
      val data = u16(tid) ++ u16(4 + rec.length) ++ rec
      header ++ tmpl ++ data
    } else {
      // IPFIX: template set (id 2) + data set; every 32nd IPFIX packet
      // adds an options template (id 3, 1 scope) + options data with
      // field 34. The options tid is a fixed id just past the rotating
      // data-template range 256..16639.
      val tmpl = u16(2) ++ u16(28) ++ u16(tid) ++ u16(5) ++
        u16(1) ++ u16(4) ++ u16(4) ++ u16(1) ++ u16(8) ++ u16(4) ++
        u16(12) ++ u16(4) ++ u16(11) ++ u16(2)
      val data = u16(tid) ++ u16(4 + rec.length) ++ rec
      val opts =
        if (i % 64 == 1) {
          val otid = 16640
          val otmpl = u16(3) ++ u16(18) ++ u16(otid) ++ u16(2) ++ u16(1) ++
            u16(149) ++ u16(4) ++ u16(34) ++ u16(4)
          val odata = u16(otid) ++ u16(12) ++ u32(1L) ++ u32(1L + i % 16)
          otmpl ++ odata
        } else Array.emptyByteArray
      val body = tmpl ++ data ++ opts
      u16(10) ++ u16(16 + body.length) ++ u32(1700000000L + i) ++
        u32(i) ++ u32(1) ++ body
    }
  }

  /** Live-socket soak: blast `mkPacket` datagrams at a [[graft.sources
    * .UdpCollector]] over loopback at the target rate and run the
    * strict pktdump tail → decodeStream → filter → fwm pipeline on the
    * spool — the complete live ingest path, kernel socket included.
    * Reports sent/spooled (UDP drop visibility) and the sustained
    * flow-ingest rate. */
  private def udpSoak(spark: SparkSession, rps: Int, secs: Int): Unit = {
    import graft.sources.UdpCollector
    val spool = java.nio.file.Files
      .createTempDirectory("graft_udp_soak").toString
    val collector = new UdpCollector(spool, rotateMillis = 500,
      rotateBytes = 32L << 20, receiveBufferBytes = 32 << 20)

    val packets = spark.readStream.format("pktdump")
      .option("strict", "true").load(spool)
    val flows = NetflowDecoder.decodeStream(packets, "udpsoak")
    val env = FilterEnv.flow(spark)
    val pred = Compiler.filterColumn("proto 6 and src net 10.0.0.0/8", env)
      .fold(e => sys.error(e), identity)
    val fwm = Fwm.stream(
      flows.withColumn("ts", to_timestamp(col("ts_sec"))).filter(pred),
      env, Fwm.Conf("udpsoak", Seq("octets desc", "src host"),
        timeSec = 10, limit = Some(10)))
    val flowRows = new java.util.concurrent.atomic.AtomicLong
    val q = fwm.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        flowRows.addAndGet(b.count()); () }
      .start()

    // paced sender: one burst per 10 ms tick
    val sock = new java.net.DatagramSocket()
    val addr = java.net.InetAddress.getByName("127.0.0.1")
    val total = rps.toLong * secs
    val t0 = System.nanoTime()
    var sent = 0L
    while (sent < total) {
      val due = ((System.nanoTime() - t0) / 1e9 * rps).toLong min total
      while (sent < due) {
        val p = mkPacket(sent)
        sock.send(new java.net.DatagramPacket(p, p.length, addr,
          collector.localPort))
        sent += 1
      }
      Thread.sleep(10)
    }
    val sendWall = (System.nanoTime() - t0) / 1e9
    sock.close()
    Thread.sleep(1000) // let the last rotation period close
    collector.close()
    q.processAllAvailable() // drain the spool completely
    val ingestWall = (System.nanoTime() - t0) / 1e9
    val spooled = collector.packetsReceived.get()
    q.stop()

    // every spooled packet decodes to >= 1 flow row pre-filter; fwm
    // output is |top-k x windows|-sized, so count ingested flows from
    // the spool itself (batch read, cheap at these sizes)
    val ingested = spark.read.format("pktdump").load(spool).count()
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    println(s"""{"udp_soak":{"target_pps":$rps,"secs":$secs,""" +
      s""""sent":$sent,"spooled":$spooled,""" +
      s""""drop_pct":${r3(100.0 * (sent - spooled) / sent)},""" +
      s""""send_wall_sec":${r3(sendWall)},""" +
      s""""ingest_wall_sec":${r3(ingestWall)},""" +
      s""""ingested":$ingested,""" +
      s""""ingest_pps":${r3(ingested / ingestWall)},""" +
      s""""fwm_out_rows":${flowRows.get}}}""")
  }

  def main(args: Array[String]): Unit = {
    val rps = sys.env.getOrElse("SPARK_GRAFT_SOAK_RPS", "50000").toInt
    val secs = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECS", "120").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the hll branch is transformWithState → RocksDB required; the
      // fwm/mavg branches run unchanged on it
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (args.contains("udp")) { udpSoak(spark, rps, secs)
      spark.stop(); return }

    val packets = spark.readStream.format("rate")
      .option("rowsPerSecond", rps).option("numPartitions", 8).load()
      .select(col("timestamp"), col("value"))
      .as[(java.sql.Timestamp, Long)]
      .map { case (ts, i) =>
        (mkPacket(i), ts.getTime / 1000, 1L + i % 4) }
      .toDF("payload", "ts_sec", "src_ip")

    // streaming ingest: constant-memory single-pass decode with the
    // template store persisted across micro-batches (the real exporter
    // pattern — templates every ~60 s, data continuously)
    val flows = NetflowDecoder.decodeStream(packets, "soak")
      .withColumn("ts", to_timestamp(col("ts_sec")))
    val env = FilterEnv.flow(spark)
    val pred = Compiler.filterColumn("proto 6 and src net 10.0.0.0/8", env)
      .fold(e => sys.error(e), identity)
    val filtered = flows.filter(pred)

    // fwm branch: 10 s tumbling windows, octets by src host
    val fwm = Fwm.stream(filtered, env,
      Fwm.Conf("soak", Seq("octets desc", "src host"), timeSec = 10,
        limit = Some(10)))
    val fwmRows = new java.util.concurrent.atomic.AtomicLong
    val q1 = fwm.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        fwmRows.addAndGet(b.count()); () }
      .start()

    // mavg branch: decayed rate per src host, alert sink on threshold
    val input = filtered.select(
      graft.functions.NetFns.ip4str(col("ip4_src_addr")).as("key"),
      (col("ts_sec") * lit(1000000000L)).as("tsNs"),
      col("in_bytes").cast("double").as("v"))
      .as[MavgStream.Input]
    val alerts = MavgStream(input, MavgStream.Conf(
      windowSec = 10, defaultLimits = Seq(10000.0), tickIntervalMs = 1000))
    val notifDir = java.nio.file.Files
      .createTempDirectory("graft_soak_notif").toString
    val sink = new AlertSink(AlertSink.Conf(notifDir, "soak", "m",
      Seq(AlertSink.Limit("lim"))))
    val alertCount = new java.util.concurrent.atomic.AtomicLong
    val q2 = alerts.writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          MavgStream.AlertRow], _: Long) =>
        val evs = b.collect().toSeq
        alertCount.addAndGet(evs.size)
        sink.handle(evs); () }
      .start()

    // hll branch: live distinct sources per dst /16 — the bounded-state
    // DISTINCT (q99's operator) under continuous load; transformWithState
    // needs the RocksDB provider, set at session build in main above
    val hllRows = new java.util.concurrent.atomic.AtomicLong
    val q3 = graft.streaming.StreamingSketch.hllUpdates(
        filtered.withColumn("dst16", expr("ip4_dst_addr DIV 65536"))
          .select("dst16", "ip4_src_addr"),
        "dst16", "ip4_src_addr", 8)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          graft.streaming.StreamingSketch.RegUpd], _: Long) =>
        hllRows.addAndGet(b.count()); () }
      .start()

    val t0 = System.nanoTime()
    Thread.sleep(secs * 1000L)
    val wall = (System.nanoTime() - t0) / 1e9

    def lastState(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Double, Long) = {
      val ps = q.recentProgress.toSeq
      val rate = ps.flatMap(p => Option(p.processedRowsPerSecond))
        .filterNot(_.isNaN)
      val state = ps.reverse.flatMap(_.stateOperators.toSeq.headOption)
        .headOption.map(_.numRowsTotal).getOrElse(-1L)
      (if (rate.isEmpty) 0.0 else rate.sum / rate.size, state)
    }
    val (fwmRate, fwmState) = lastState(q1)
    val (mavgRate, mavgState) = lastState(q2)
    val (hllRate, hllState) = lastState(q3)
    q1.stop(); q2.stop(); q3.stop()

    println(s"""{"soak_secs":$wall,"packets_per_sec_target":$rps,""" +
      s""""fwm_avg_rows_per_sec":$fwmRate,""" +
      s""""fwm_state_rows":$fwmState,"fwm_out_rows":${fwmRows.get},""" +
      s""""mavg_avg_rows_per_sec":$mavgRate,""" +
      s""""mavg_state_keys":$mavgState,""" +
      s""""alert_events":${alertCount.get},""" +
      s""""hll_avg_rows_per_sec":$hllRate,""" +
      s""""hll_state_keys":$hllState,""" +
      s""""hll_register_updates":${hllRows.get}}""")
    spark.stop()
  }
}
