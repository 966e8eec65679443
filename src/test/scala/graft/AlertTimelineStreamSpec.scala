package graft

import graft.operators.AlertTimeline
import graft.streaming.AlertTimelineStream
import graft.streaming.AlertTimelineStream.{Event, Tick}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The streaming timeline (event-time timers) must equal the batch
  * replay bit-for-bit — same machine, same grid, any micro-batching,
  * including a stop/restart from the checkpoint mid-trace. */
class AlertTimelineStreamSpec extends SparkTest {

  private val Epoch0 = 1700000000L
  private val NTicks = 20

  /** series rows: (key, idx, v); limit constant 100. Two keys:
    *  - key 1 breaches at ticks 2..5 (started, 3-tick-cadence updates)
    *    then goes quiet → decay → ended after hysteresis;
    *  - key 2 breaches once at tick 10, re-breaches at 13 inside the
    *    hysteresis window (no second started), then ends;
    *  - key 3 never breaches (no events at all). */
  private val series: Seq[(Long, Long, Double)] = Seq(
    (1L, 0L, 40.0), (1L, 2L, 300.0), (1L, 3L, 250.0), (1L, 4L, 260.0),
    (1L, 5L, 270.0), (1L, 9L, 10.0),
    (2L, 10L, 500.0), (2L, 13L, 400.0),
    (3L, 1L, 50.0), (3L, 15L, 60.0))

  private def batchTimeline(): Seq[(Long, Long, String, Double)] = {
    val df = flowDf(Seq("k", "idx", "vv"),
        series.map { case (k, i, v) => Seq(k, i, v.toLong) })
      .select(col("k"), col("idx"), col("vv").cast("double").as("v"),
        lit(100.0).as("lim"))
    AlertTimeline.replay(df, "k", "idx", "v", "lim", nTicks = NTicks,
        windowTicks = 8, back2normTicks = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  private def withRocks[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body
    finally spark.conf.unset(
      "spark.sql.streaming.stateStore.providerClass")
  }

  /** (ts seconds, key, idx, v, lim): ts carries the watermark. */
  private type Row5 = (java.sql.Timestamp, Long, Long, Double, Double)
  private def rows(ticks: Seq[(Long, Long, Double)]): Seq[Row5] =
    ticks.map { case (k, i, v) =>
      (java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(Epoch0 + i)), k, i, v, 100.0)
    }
  /** Sentinel: pushes the watermark past the last tick so the final
    * timers fire; its own tick is outside the grid. */
  private def sentinel: Row5 =
    (java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Epoch0 + NTicks + 1)),
      99L, NTicks.toLong + 1, 0.0, 100.0)

  private def wire(mem: org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[Row5],
      delay: String = "0 seconds"): Dataset[Event] = {
    import spark.implicits._
    val input = mem.toDF()
      .toDF("ts", "key", "idx", "v", "lim")
      .withWatermark("ts", delay)
      .select(col("key"), col("idx"), col("v"), col("lim"))
      .as[Tick]
    AlertTimelineStream(input, NTicks, Epoch0, windowTicks = 8,
      back2normTicks = 2)
  }

  test("streaming == batch replay, any chunking, restart mid-trace") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val expected = batchTimeline()
    assert(expected.nonEmpty) // the scenario must actually alert
    assert(expected.exists(_._3 == "ended"))
    assert(!expected.exists(_._1 == 3L)) // never-breaching key silent

    for (chunkTicks <- Seq(4, 7, NTicks + 2)) withRocks {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Row5]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"atl_stream_$chunkTicks")
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Event]()
      def run(body: => Unit): Unit = {
        val q = wire(mem).writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (b: Dataset[Event], _: Long) =>
            b.collect().foreach(got.add); ()
          }
          .start()
        try body finally q.stop()
      }
      val chunks = series.groupBy(_._2 / chunkTicks).toSeq
        .sortBy(_._1).map(_._2)
      // restart boundary mid-trace: first half of the chunks in run 1
      val (c1, c2) = chunks.splitAt(math.max(1, chunks.length / 2))
      run {
        c1.foreach { c =>
          mem.addData(rows(c): _*)
          spark.streams.active.foreach(_.processAllAvailable())
        }
      }
      run {
        c2.foreach { c =>
          mem.addData(rows(c): _*)
          spark.streams.active.foreach(_.processAllAvailable())
        }
        mem.addData(sentinel)
        spark.streams.active.foreach(_.processAllAvailable())
      }
      val gotSeq = got.toArray(Array.empty[Event])
        .map(e => (e.key, e.t, e.ev, e.value))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(gotSeq == expected,
        s"chunkTicks=$chunkTicks:\n got=$gotSeq\n exp=$expected")
    }
  }

  /** The watermark-completeness argument, PROVEN rather than
    * exercised: rows arrive out of tick order (bounded disorder) under
    * a NONZERO watermark lag, and the timeline must still equal the
    * batch replay bit-for-bit. Disorder bound: each row's delivery
    * rank is `idx + jitter` with jitter ∈ [0, lag-1], so when the
    * batch carrying tick t's row runs, every earlier batch held only
    * rows with idx ≤ t + lag − 1, hence the watermark (maxSeen − lag)
    * is still < t — the contract "no rows for tick t after the
    * watermark passes t" holds by construction, and the timers must
    * not fire tick t before its data is complete. Also asserts the
    * bounded-state claim via the state-store reader: a key whose rows
    * all fall outside the grid never mints a state entry, and the
    * store is EMPTY once the grid completes. */
  test("out-of-order input under a nonzero watermark lag == batch " +
      "replay; state follows live keys") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val expected = batchTimeline()
    val lagTicks = 5
    val rng = new scala.util.Random(13)
    val disordered = series
      .map(r => (r, r._2 + rng.nextInt(lagTicks)))
      .sortBy { case ((k, i, _), rank) => (rank, k, i) }
      .map(_._1)
    assert(disordered != series.sortBy(t => (t._2, t._1)),
      "the permutation must actually disorder the trace")
    withRocks {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Row5]
      val ckpt = java.nio.file.Files.createTempDirectory("atl_ooo")
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Event]()
      val q = wire(mem, delay = s"$lagTicks seconds").writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: Dataset[Event], _: Long) =>
          b.collect().foreach(got.add); ()
        }
        .start()
      def stateKeys(): Set[Long] =
        spark.read.format("statestore")
          .option("stateVarName", "timeline")
          .load(ckpt.toString)
          .select("key.value").as[Long].collect().toSet
      try {
        // an out-of-grid observation for key 99 EARLY in the trace:
        // nothing buffers, no timer is ever armed, so no state entry
        // may be minted for it (the state-leak guard)
        mem.addData((java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(Epoch0)),
          99L, -1L, 0.0, 100.0))
        spark.streams.active.foreach(_.processAllAvailable())
        disordered.grouped(3).foreach { chunk =>
          mem.addData(rows(chunk): _*)
          spark.streams.active.foreach(_.processAllAvailable())
        }
        val mid = stateKeys()
        assert(!mid.contains(99L),
          s"out-of-grid key minted state: $mid")
        assert(mid.nonEmpty, "live keys must hold state mid-trace")
        // sentinel far enough past the grid to clear the lag
        mem.addData((java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(
            Epoch0 + NTicks + lagTicks + 1)),
          99L, NTicks.toLong + 1, 0.0, 100.0))
        spark.streams.active.foreach(_.processAllAvailable())
      } finally q.stop()
      val gotSeq = got.toArray(Array.empty[Event])
        .map(e => (e.key, e.t, e.ev, e.value))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(gotSeq == expected,
        s"disordered:\n got=$gotSeq\n exp=$expected")
      assert(stateKeys().isEmpty,
        "grid complete: every key's state must be cleared")
    }
  }

  /** The sentinel contract travels WITH the operator (not just q109's
    * in-query require): a row filter written between the watermark and
    * the processor is rejected at construction — Catalyst would push
    * it below EventTimeWatermark and drop rows before their event time
    * is sampled. Filtering BEFORE the watermark stays allowed. */
  test("a row filter between watermark and processor is rejected") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row5]
    def base = mem.toDF().toDF("ts", "key", "idx", "v", "lim")
    val postWmFilter = base
      .withWatermark("ts", "0 seconds")
      .filter(col("key") =!= 99L)
      .select(col("key"), col("idx"), col("v"), col("lim"))
      .as[Tick]
    val e = intercept[IllegalArgumentException] {
      AlertTimelineStream(postWmFilter, NTicks, Epoch0)
    }
    assert(e.getMessage.contains("EventTimeWatermark"), e.getMessage)
    // pre-watermark filtering is the caller's explicit semantics
    val preWmFilter = base
      .filter(col("key") =!= 99L)
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("idx"), col("v"), col("lim"))
      .as[Tick]
    AlertTimelineStream(preWmFilter, NTicks, Epoch0) // must construct
  }
}
