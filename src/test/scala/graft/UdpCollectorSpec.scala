package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.Files

import graft.sources.{NetflowDecoder, UdpCollector}

/** Live UDP → spool → pktdump tail: the socket half of the ingest
  * pipeline (reference scapture.c recvfrom loop). */
class UdpCollectorSpec extends SparkTest {

  private def sendAll(port: Int, pkts: Seq[Array[Byte]]): Unit = {
    val s = new DatagramSocket()
    try {
      val addr = InetAddress.getByName("127.0.0.1")
      pkts.foreach { p =>
        s.send(new DatagramPacket(p, p.length, addr, port))
        Thread.sleep(1) // don't outrun the single receive thread
      }
    } finally s.close()
  }

  private def eventually(deadlineMs: Long = 15000)(cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond) {
      assert(System.currentTimeMillis() - t0 < deadlineMs, "timed out")
      Thread.sleep(20)
    }
  }

  test("datagrams land in the spool and decode end-to-end") {
    val dir = Files.createTempDirectory("udpspool").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(48)
    val c = new UdpCollector(dir.getAbsolutePath, rotateMillis = 200)
    try {
      sendAll(c.localPort, pkts)
      eventually()(c.packetsReceived.get() == 48)
    } finally c.close()
    val df = spark.read.format("pktdump").load(dir.getAbsolutePath)
    assert(df.count() == 48)
    // sender address is recorded as the u32 v4 (loopback)
    assert(df.select("src_ip").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0x7f000001L))
    val flows = NetflowDecoder.decode(df)
    assert(flows.count() == 48)
  }

  test("strict streaming tail across rotation AND collector restart: " +
    "exactly-once, names stay monotone") {
    val dir = Files.createTempDirectory("udpspool2").toFile
    val ckpt = Files.createTempDirectory("udpspool2ckpt").toFile
    dir.deleteOnExit(); ckpt.deleteOnExit()
    val pkts = Queries.v9Packets(48)
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("pktdump")
      .option("strict", "true") // a non-monotone name FAILS the query
      .load(dir.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(b.count()); ()
      }
      .start()
    try {
      val a = new UdpCollector(dir.getAbsolutePath, rotateMillis = 150)
      try {
        sendAll(a.localPort, pkts.take(16))
        eventually()(a.packetsReceived.get() == 16)
        // age-based rotation renames the segment in with no new traffic
        eventually()(dir.listFiles().exists(f =>
          !f.getName.startsWith(".") && f.getName.endsWith(".gpkd")))
      } finally a.close()
      q.processAllAvailable()
      assert(total.get() == 16, s"after collector A: ${total.get()}")

      // a NEW collector on the same spool resumes numbering above the
      // existing segments — strict mode proves no straggler appears
      val b = new UdpCollector(dir.getAbsolutePath, rotateMillis = 150)
      try {
        sendAll(b.localPort, pkts.drop(16))
        eventually()(b.packetsReceived.get() == 32)
      } finally b.close()
      q.processAllAvailable()
      assert(total.get() == 48, s"after collector B: ${total.get()}")

      val names = dir.listFiles().map(_.getName)
        .filter(!_.startsWith(".")).sorted.toSeq
      assert(names == names.distinct, s"duplicate segment names: $names")
      assert(names.size >= 2, s"expected >=2 segments, got $names")
      assert(q.exception.isEmpty, s"strict tail failed: ${q.exception}")
    } finally q.stop()
  }

  test("segment age starts at the first packet: sparse traffic does " +
    "not rotate one-packet files") {
    val dir = Files.createTempDirectory("udpspool4").toFile
    dir.deleteOnExit()
    val c = new UdpCollector(dir.getAbsolutePath, rotateMillis = 400)
    try {
      Thread.sleep(900) // idle longer than the rotation period
      sendAll(c.localPort, Queries.v9Packets(3))
      eventually()(c.packetsReceived.get() == 3)
    } finally c.close()
    // pre-fix: the first packet found the idle segment already 'old'
    // and rotated alone — >= 2 files; now all 3 share one segment
    val files = dir.listFiles().filter(!_.getName.startsWith("."))
    assert(files.length == 1, files.toSeq.toString)
    assert(spark.read.format("pktdump")
      .load(dir.getAbsolutePath).count() == 3)
  }

  test("an orphaned staging segment from a crashed collector is " +
    "recovered, not truncated") {
    val dir = Files.createTempDirectory("udpspool5").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(8).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    graft.sources.PktDump.write(s"$dir/seg-000000000000.gpkd",
      pkts.take(4))
    // a crashed collector's staging file with durable packets
    graft.sources.PktDump.write(s"$dir/.seg-000000000001.gpkd",
      pkts.drop(4))
    val c = new UdpCollector(dir.getAbsolutePath,
      rotateMillis = 60_000)
    try {
      sendAll(c.localPort, Queries.v9Packets(1))
      eventually()(c.packetsReceived.get() == 1)
    } finally c.close()
    val names = dir.listFiles().map(_.getName)
      .filter(!_.startsWith(".")).sorted.toSeq
    // orphan renamed in, new collector numbered ABOVE it
    assert(names == Seq("seg-000000000000.gpkd",
      "seg-000000000001.gpkd", "seg-000000000002.gpkd"), names.toString)
    assert(spark.read.format("pktdump")
      .load(dir.getAbsolutePath).count() == 9)
  }

  test("empty segments are never renamed in; close flushes the tail") {
    val dir = Files.createTempDirectory("udpspool3").toFile
    dir.deleteOnExit()
    // no traffic at all: quiet rotation periods must not spool files
    val c = new UdpCollector(dir.getAbsolutePath, rotateMillis = 100)
    Thread.sleep(400)
    c.close()
    assert(dir.listFiles().count(!_.getName.startsWith(".")) == 0)
    // one packet, closed before the rotation period: flushed by close
    val c2 = new UdpCollector(dir.getAbsolutePath, rotateMillis = 60_000)
    try {
      sendAll(c2.localPort, Queries.v9Packets(1))
      eventually()(c2.packetsReceived.get() == 1)
    } finally c2.close()
    val files = dir.listFiles().filter(!_.getName.startsWith("."))
    assert(files.length == 1, files.toSeq.toString)
    assert(spark.read.format("pktdump")
      .load(dir.getAbsolutePath).count() == 1)
  }

  test("a second collector on the same spool fails fast; the lock frees on close") {
    val dir = Files.createTempDirectory("udpspool4").toFile
    dir.deleteOnExit()
    val c1 = new UdpCollector(dir.getAbsolutePath)
    try {
      val e = intercept[IllegalStateException](
        new UdpCollector(dir.getAbsolutePath))
      assert(e.getMessage.contains("already writing"))
    } finally c1.close()
    // after a clean close a successor takes the spool over normally
    val c2 = new UdpCollector(dir.getAbsolutePath)
    c2.close()
  }

  test("a failed bind releases the spool lock: same-JVM retry succeeds") {
    val dir = Files.createTempDirectory("udpspool5").toFile
    dir.deleteOnExit()
    // occupy a port so the collector's bind (AFTER the lock) throws
    val blocker = new java.net.DatagramSocket(
      new java.net.InetSocketAddress("127.0.0.1", 0))
    try {
      intercept[java.net.BindException](new UdpCollector(
        dir.getAbsolutePath, port = blocker.getLocalPort))
      // before the fix this threw the misleading "already writing"
      // (OverlappingFileLockException from the leaked lock)
      val c = new UdpCollector(dir.getAbsolutePath)
      c.close()
    } finally blocker.close()
  }
}
