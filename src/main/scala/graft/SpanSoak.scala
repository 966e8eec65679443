package graft

import graft.streaming.StreamingSpanDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming span-marker soak (SCALE.md, the r9 streaming-near-dup
  * protocol): drives [[StreamingSpanDedup.markedStarts]] with the TTL
  * enabled against an UNBOUNDED synthetic doc feed whose gram
  * vocabulary grows forever — the exact input that would OOM an
  * un-TTL'd deployment — and samples the state store's row count
  * across batches. The claim under soak: state PLATEAUS at
  * ~(docs/sec × new-grams/doc × ttl) rows instead of growing with the
  * corpus, while marks keep flowing (consecutive docs share gram
  * windows, so duplicates exist at every point of the feed).
  *
  * Feed shape: doc v holds tokens 4v..4v+11 (12 tokens, L=8 → 5
  * windows/doc); doc v+1 overlaps 8 of them, so each doc re-sees 4 of
  * its neighbor's windows (continuous mark traffic) and mints 4 new
  * grams (vocabulary growth ~4·docs — unbounded by construction).
  *
  * env: SPARK_GRAFT_SOAK_SECS (default 60), SPARK_GRAFT_SOAK_DPS
  * (docs/sec, default 2000), SPARK_GRAFT_SOAK_TTL_SECS (default 10;
  * 0 = no TTL, the unbounded control). Prints one JSON line with the
  * state-row series (one sample/sec), docs and marks throughput. */
object SpanSoak {
  def main(args: Array[String]): Unit = {
    val secs = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECS", "60").toInt
    val dps = sys.env.getOrElse("SPARK_GRAFT_SOAK_DPS", "2000").toInt
    val ttlSecs =
      sys.env.getOrElse("SPARK_GRAFT_SOAK_TTL_SECS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", dps).load()
    val docs = rate.select(col("value").as("id"),
      (col("value") * 1000L).as("ts"), // monotone arrival order
      concat_ws(" ", (0 until 12).map(k =>
        concat(lit("w"), (col("value") * 4 + k))): _*).as("text"))
    val marks = StreamingSpanDedup.markedStarts(docs, "id", "ts",
      "text", minTokens = 8,
      ttl = if (ttlSecs > 0)
        Some(java.time.Duration.ofSeconds(ttlSecs)) else None)

    val markCount = new java.util.concurrent.atomic.AtomicLong
    val ckpt = java.nio.file.Files
      .createTempDirectory("spansoak").toString
    val q = marks.toDF().writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(500))
      .foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          markCount.addAndGet(b.count()); ()
      }
      .start()

    val series = Vector.newBuilder[Long]
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < secs) {
      Thread.sleep(1000)
      val rows = Option(q.lastProgress)
        .flatMap(_.stateOperators.headOption)
        .map(_.numRowsTotal).getOrElse(-1L)
      series += rows
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()
    val s = series.result()
    // plateau check: last-third max vs overall max — a TTL'd run's
    // tail stops climbing; the unbounded control keeps setting maxima
    val lastThird = s.drop(2 * s.length / 3)
    println(s"""{"span_soak":{"secs":${math.rint(wall)},""" +
      s""""docs_per_sec":$dps,"ttl_secs":$ttlSecs,""" +
      s""""marks_total":${markCount.get()},""" +
      s""""state_rows_series":${s.mkString("[", ",", "]")},""" +
      s""""state_rows_max":${if (s.isEmpty) -1 else s.max},""" +
      s""""state_rows_last":${s.lastOption.getOrElse(-1L)},""" +
      s""""last_third_min":${if (lastThird.isEmpty) -1
        else lastThird.min},""" +
      s""""expected_unbounded":${4L * dps * secs.toLong}}}""")
    spark.stop()
  }
}
