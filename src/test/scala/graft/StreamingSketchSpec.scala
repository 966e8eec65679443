package graft

import graft.operators.Sketches
import graft.streaming.StreamingSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL: cross-batch register merge must reconstruct the
  * batch sketch exactly (same hash columns by construction). */
class StreamingSketchSpec extends SparkTest {

  /** Run batches through hllUpdates, return all emissions per batch. */
  private def runStream(batches: Seq[Seq[(Long, Long)]], p: Int)
      : Seq[Seq[StreamingSketch.RegUpd]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)]
      val upd = StreamingSketch.hllUpdates(
        mem.toDF().toDF("k", "v"), "k", "v", p)
      val perBatch = scala.collection.mutable.ArrayBuffer
        .empty[Seq[StreamingSketch.RegUpd]]
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[
        StreamingSketch.RegUpd]()
      val q = upd.writeStream
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("hllstream").toString)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingSketch.RegUpd],
           _: Long) => b.collect().foreach(seen.add); ()
        }
        .start()
      try batches.foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
        import scala.jdk.CollectionConverters._
        perBatch += seen.asScala.toSeq
        seen.clear()
      } finally q.stop()
      perBatch.toSeq
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def reconstruct(ems: Seq[StreamingSketch.RegUpd]) =
    ems.groupBy(e => (e.key, e.reg))
      .map { case ((k, r), es) => (k, r, es.map(_.rho).max) }.toSet

  test("max over emissions equals the batch register sketch") {
    val batches = Seq(
      (0L until 40L).map(i => (i % 2, i)),
      (20L until 80L).map(i => (i % 2, i)),     // overlaps batch 1
      (0L until 10L).map(i => (1L, i * 1000L)))
    val ems = runStream(batches, p = 4)
    val batchRegs = Sketches.hllRegisters(
      flowDf(Seq("k", "v"), batches.flatten.map(t => Seq(t._1, t._2))),
      Seq("k"), "v", 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue()))
      .toSet
    assert(reconstruct(ems.flatten) == batchRegs)
  }

  test("re-delivered batch emits nothing (max is idempotent)") {
    val a = (0L until 50L).map(i => (i % 3, i))
    val ems = runStream(Seq(a, a), p = 5)
    assert(ems(0).nonEmpty)
    assert(ems(1).isEmpty)
  }

  test("state survives an AvailableNow restart: run 2 emits only true " +
    "increases over run 1's recovered registers") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("hllrestart")
      val ckpt = dir.resolve("ckpt").toString
      val spool = dir.resolve("spool")
      java.nio.file.Files.createDirectory(spool)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType, false)))
      def write(name: String, rows: Seq[(Long, Long)]): Unit =
        flowDf(Seq("k", "v"), rows.map(t => Seq(t._1, t._2)))
          .coalesce(1).write.mode("overwrite")
          .parquet(spool.resolve(name).toString)
      def runOnce(): Seq[StreamingSketch.RegUpd] = {
        val got = new java.util.concurrent.ConcurrentLinkedQueue[
          StreamingSketch.RegUpd]()
        val q = StreamingSketch.hllUpdates(
            spark.readStream.schema(schema)
              .parquet(s"$spool/batch-*"), "k", "v", 5)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[
              StreamingSketch.RegUpd], _: Long) =>
            b.collect().foreach(got.add); () }
          .start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        got.asScala.toSeq
      }
      val a = (0L until 40L).map(i => (i % 2, i))
      write("batch-a", a)
      val em1 = runOnce()
      // batch B overlaps A heavily: most registers are already at max
      // in the RECOVERED state, so a fresh-state run would re-emit them
      val b = (0L until 50L).map(i => (i % 2, i))
      write("batch-b", b)
      val em2 = runOnce()
      val batchRegs = Sketches.hllRegisters(
        flowDf(Seq("k", "v"), (a ++ b).map(t => Seq(t._1, t._2))),
        Seq("k"), "v", 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).longValue())).toSet
      assert(reconstruct(em1 ++ em2) == batchRegs)
      // restart proof: every run-2 emission strictly exceeds run 1's
      // register value (absent = 0) — a recomputed-from-scratch state
      // would re-emit run-1 maxima as "new"
      val r1 = em1.groupBy(e => (e.key, e.reg))
        .view.mapValues(_.map(_.rho).max).toMap
      assert(em2.forall(e => e.rho > r1.getOrElse((e.key, e.reg), 0L)),
        s"run 2 re-emitted non-increases: $em2")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("estimate over merged streaming registers equals the batch estimate") {
    val batches = Seq(
      (0L until 30L).map(i => (0L, i * 7L)),
      (0L until 30L).map(i => (0L, i * 11L)))
    val ems = runStream(batches, p = 6).flatten
    val regDf = flowDf(Seq("k", "reg", "rho"),
      reconstruct(ems).toSeq.map(t => Seq(t._1, t._2, t._3)))
    val streamed = Sketches.estimateFromRegisters(regDf, Seq("k"), 6)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val batch = Sketches.hllEstimate(
      flowDf(Seq("k", "v"), batches.flatten.map(t => Seq(t._1, t._2))),
      Seq("k"), "v", 6)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch) // bit-for-bit: same registers, same fold
  }
}
