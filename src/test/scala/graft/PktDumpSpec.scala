package graft

import java.nio.file.Files

import graft.sources.{NetflowDecoder, PktDump}
import org.apache.spark.sql.functions._

/** pktdump DataSource V2: file-granular splits, column pruning,
  * end-to-end decode parity with the in-memory path. */
class PktDumpSpec extends SparkTest {

  private def writeDumps(nFiles: Int, perFile: Int): String = {
    val dir = Files.createTempDirectory("pktdump").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(nFiles * perFile).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L + i % 4) }
    pkts.grouped(perFile).zipWithIndex.foreach { case (group, f) =>
      PktDump.write(s"$dir/part-$f.gpkd", group)
    }
    dir.getAbsolutePath
  }

  test("reads dumps with one partition per file; schema + values") {
    val dir = writeDumps(nFiles = 4, perFile = 16)
    val df = spark.read.format("pktdump").load(dir)
    assert(df.schema == PktDump.schema)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 64)
    val r = df.orderBy(col("ts_sec").asc).limit(1).collect()(0)
    assert(r.getAs[Long]("ts_sec") == 1700000000L)
    assert(r.getAs[Long]("src_ip") == 1L)
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("column pruning skips payload materialization (plan shows the " +
    "pruned read schema) and still counts correctly") {
    val dir = writeDumps(nFiles = 2, perFile = 8)
    val tsOnly = spark.read.format("pktdump").load(dir)
      .select("ts_sec")
    val plan = tsOnly.queryExecution.executedPlan.toString
    assert(plan.contains("cols=ts_sec"), s"pruning not pushed:\n$plan")
    assert(tsOnly.count() == 16)
    assert(tsOnly.agg(sum("ts_sec")).collect()(0).getLong(0) ==
      (0 until 16).map(1700000000L + _).sum)
  }

  test("decode through the file source matches the in-memory decode") {
    import spark.implicits._
    val dir = writeDumps(nFiles = 4, perFile = 16)
    val viaFile = NetflowDecoder.decode(
        spark.read.format("pktdump").load(dir))
      .select("ts_sec", "in_bytes", "protocol")
      .collect().map(_.toSeq).toSet
    val direct = NetflowDecoder.decode(
        spark.createDataset(Queries.v9Packets(64).zipWithIndex
          .map { case (p, i) => (p, 1700000000L + i, 1L + i % 4) })
          .toDF("payload", "ts_sec", "src_ip"))
      .select("ts_sec", "in_bytes", "protocol")
      .collect().map(_.toSeq).toSet
    assert(viaFile == direct && viaFile.size == 64)
  }

  test("streaming: files rotated into the directory arrive as " +
    "micro-batches, below-watermark names are not double-read") {
    val dir = Files.createTempDirectory("pktdumpstream").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(48).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    PktDump.write(s"$dir/20260101-000000.gpkd", pkts.slice(0, 16))
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("pktdump")
      .load(dir.getAbsolutePath)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.add(b.count()); ()
      }
      .start()
    try {
      q.processAllAvailable()
      // collector convention: stage under a dot name, rename in
      PktDump.write(s"$dir/.staging.gpkd", pkts.slice(16, 48))
      new java.io.File(dir, ".staging.gpkd")
        .renameTo(new java.io.File(dir, "20260101-000500.gpkd"))
      q.processAllAvailable()
      // replay of an already-seen batch interval must not occur
      q.processAllAvailable()
      val seen = counts.toArray(Array.empty[java.lang.Long])
        .map(_.longValue).filter(_ > 0)
      assert(seen.sum == 48, s"got ${seen.toSeq}")
      assert(seen.toSeq == Seq(16L, 32L), s"got ${seen.toSeq}")
    } finally q.stop()
  }

  test("strict mode: a below-watermark rename fails the query instead " +
    "of warn-and-skip (the naming-contract enforcement switch)") {
    val dir = Files.createTempDirectory("pktdumpstrict").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(8).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    PktDump.write(s"$dir/20260101-000500.gpkd", pkts.take(4))
    val q = spark.readStream.format("pktdump")
      .option("strict", "true")
      .load(dir.getAbsolutePath)
      .writeStream
      .format("noop")
      .start()
    try {
      q.processAllAvailable()
      // a straggler named BELOW the established watermark
      PktDump.write(s"$dir/.late.gpkd", pkts.drop(4))
      new java.io.File(dir, ".late.gpkd")
        .renameTo(new java.io.File(dir, "20260101-000000.gpkd"))
      val ex = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      assert(ex.getMessage.contains("strict") ||
        Option(ex.getCause).exists(_.getMessage.contains("strict")),
        s"unexpected failure: $ex")
    } finally q.stop()
  }

  test("streaming decode end-to-end: capture files through " +
    "decodeStream produce the analytic flow rows") {
    val dir = Files.createTempDirectory("pktdumpstream2").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(32).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    PktDump.write(s"$dir/a.gpkd", pkts.slice(0, 16))
    val total = new java.util.concurrent.atomic.AtomicLong
    val src = spark.readStream.format("pktdump")
      .load(dir.getAbsolutePath)
    val flows = NetflowDecoder.decodeStream(src,
      s"pktspec-${System.nanoTime()}")
    val q = flows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(
          b.agg(sum("in_bytes")).collect()(0).getLong(0)); ()
      }
      .start()
    try {
      q.processAllAvailable()
      PktDump.write(s"$dir/b.gpkd", pkts.slice(16, 32))
      q.processAllAvailable()
      // Σ in_bytes = Σ (100+i) for i in 0..31
      assert(total.get() == (0 until 32).map(100L + _).sum)
    } finally q.stop()
  }

  test("a truncated trailing record (collector crash) drops the " +
    "partial tail and keeps the complete records") {
    val dir = Files.createTempDirectory("pktdumptrunc").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(8).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    val f = new java.io.File(dir, "a.gpkd")
    PktDump.write(f.getAbsolutePath, pkts)
    // cut the file mid-way through the LAST record's payload; drop the
    // Hadoop LocalFileSystem checksum sidecar the test writer produced
    // (a real collector's file has none)
    val full = Files.readAllBytes(f.toPath)
    Files.write(f.toPath, java.util.Arrays.copyOf(full, full.length - 5))
    new java.io.File(dir, ".a.gpkd.crc").delete()
    val df = spark.read.format("pktdump").load(dir.getAbsolutePath)
    assert(df.count() == 7) // 8 written, partial 8th dropped
    assert(df.agg(sum("ts_sec")).collect()(0).getLong(0) ==
      (0 until 7).map(1700000000L + _).sum)
  }

  test("streaming offset is monotone: a transiently empty listing " +
    "cannot regress the watermark and re-ingest old names") {
    import graft.sources.PktDumpMicroBatchStream
    val dir = Files.createTempDirectory("pktdumpmono").toFile
    dir.deleteOnExit()
    val pkts = Queries.v9Packets(4).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    val stream = new PktDumpMicroBatchStream(dir.getAbsolutePath,
      PktDump.schema.fieldNames)
    PktDump.write(s"$dir/b.gpkd", pkts)
    val o1 = stream.latestOffset()
    assert(stream.planInputPartitions(stream.initialOffset(), o1)
      .length == 1)
    // retention wipes the directory → listing is empty
    new java.io.File(dir, "b.gpkd").delete()
    new java.io.File(dir, ".b.gpkd.crc").delete()
    val o2 = stream.latestOffset()
    assert(o2.json() == o1.json(), "watermark regressed on empty dir")
    // a BELOW-watermark name appearing later is ignored, not re-read
    PktDump.write(s"$dir/a.gpkd", pkts)
    val o3 = stream.latestOffset()
    assert(stream.planInputPartitions(o1, o3).isEmpty)
    // an ABOVE-watermark name still advances
    PktDump.write(s"$dir/c.gpkd", pkts)
    val o4 = stream.latestOffset()
    assert(stream.planInputPartitions(o3, o4).length == 1)
  }

  test("streaming restart from checkpoint: processed files are not " +
    "re-ingested, new files still arrive") {
    val dir = Files.createTempDirectory("pktdumprestart").toFile
    val ckpt = Files.createTempDirectory("pktdumpckpt").toFile
    dir.deleteOnExit(); ckpt.deleteOnExit()
    val pkts = Queries.v9Packets(48).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("pktdump")
      .load(dir.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        counts.add(b.count()); ()
      }
      .start()
    PktDump.write(s"$dir/a.gpkd", pkts.slice(0, 16))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart against the same checkpoint; file b appears while DOWN
    PktDump.write(s"$dir/b.gpkd", pkts.slice(16, 48))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val seen = counts.toArray(Array.empty[java.lang.Long])
      .map(_.longValue).filter(_ > 0)
    // exactly once each: 16 before restart, 32 after — never 48+16
    assert(seen.toSeq == Seq(16L, 32L), s"got ${seen.toSeq}")
  }

  test("AvailableNow across restarts: each run drains exactly the " +
    "delta since the last checkpoint (pin + restore compose)") {
    val dir = Files.createTempDirectory("pktdumpavailrestart").toFile
    val ckpt = Files.createTempDirectory("pktdumpavailrsck").toFile
    dir.deleteOnExit(); ckpt.deleteOnExit()
    val pkts = Queries.v9Packets(48).zipWithIndex
      .map { case (p, i) => (p, 1700000000L + i, 1L) }
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def runOnce(): Unit = {
      val q = spark.readStream.format("pktdump")
        .load(dir.getAbsolutePath)
        .writeStream
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          counts.add(b.count()); ()
        }
        .start()
      q.awaitTermination() // AvailableNow self-terminates when drained
    }
    PktDump.write(s"$dir/a.gpkd", pkts.slice(0, 16))
    runOnce()
    PktDump.write(s"$dir/b.gpkd", pkts.slice(16, 48))
    runOnce()
    val seen = counts.toArray(Array.empty[java.lang.Long])
      .map(_.longValue).filter(_ > 0)
    assert(seen.toSeq == Seq(16L, 32L), s"got ${seen.toSeq}")
  }

  test("Trigger.AvailableNow flushes watermark-closed Append windows " +
    "in ONE start (SupportsTriggerAvailableNow; r10 q81 regression)") {
    val dir = Files.createTempDirectory("pktdumpavail").toFile
    dir.deleteOnExit()
    // 20 packets over [1700000000, 1700000020) + one sentinel a full
    // window later: the sentinel advances the watermark past both
    // 10-second data windows, whose rows must be in the sink when the
    // query self-terminates — WITHOUT a second start() feeding more
    // data (the plain-MicroBatchStream wrapper never ran that flush)
    val pkts = Queries.v9Packets(21).zipWithIndex.map { case (p, i) =>
      (p, if (i < 20) 1700000000L + i else 1700000030L, 1L)
    }
    PktDump.write(s"$dir/part-0.gpkd", pkts)
    val ckpt = Files.createTempDirectory("pktdumpavailck").toFile
    ckpt.deleteOnExit()
    val q = spark.readStream.format("pktdump")
      .load(dir.getAbsolutePath)
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds")).count()
      .select(unix_timestamp(col("window.start")).as("w"), col("count"))
      .writeStream.format("memory").queryName("pkt_avail")
      .outputMode("append")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      val got = spark.table("pkt_avail").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1700000000L -> 10L, 1700000010L -> 10L),
        s"closed windows must flush before self-termination: $got")
    } finally spark.catalog.dropTempView("pkt_avail")
  }

  test("a non-pktdump file is rejected with a clear error") {
    val dir = Files.createTempDirectory("pktdumpbad").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "bogus.gpkd").toPath,
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("pktdump").load(dir.getAbsolutePath).count()
    }
    assert(e.getMessage != null)
  }
}
