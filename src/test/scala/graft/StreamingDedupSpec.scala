package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: first arrival emitted, watermark-horizon
  * duplicates suppressed, across microbatch boundaries. */
class StreamingDedupSpec extends SparkTest {

  test("streamingExact suppresses duplicate content across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDF().toDF("sec", "doc_id", "text")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Dedup.streamingExact(src, "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: A, B, A — in-batch duplicate dropped
      mem.addData((100L, 1L, "alpha"), (101L, 2L, "beta"),
        (102L, 3L, "alpha"))
      q.processAllAvailable()
      // batch 2: A again (within horizon) + new C
      mem.addData((150L, 4L, "alpha"), (151L, 5L, "gamma"))
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 5L),
        s"expected first arrivals of alpha/beta/gamma, got $ids")
      // output schema carries the original columns, no helper leftovers
      val cols = spark.table("sdedup").columns.toSet
      assert(!cols.contains("__digest") && !cols.contains("__len"))
    } finally q.stop()
  }

  test("streamingExact re-admits content after the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val src = mem.toDF().toDF("sec", "doc_id", "text")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val out = Dedup.streamingExact(src, "ts", "text", "10 seconds")
    val q = out.writeStream.format("memory").queryName("sdedup2")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((100L, 1L, "alpha"))
      q.processAllAvailable()
      // advance event time far past the horizon, then replay "alpha":
      // its state expired → treated as new content
      mem.addData((500L, 2L, "filler"))
      q.processAllAvailable()
      mem.addData((600L, 3L, "alpha"))
      q.processAllAvailable()
      val ids = spark.table("sdedup2").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids.contains(3L),
        s"alpha must re-admit after horizon expiry, got $ids")
    } finally q.stop()
  }
}
