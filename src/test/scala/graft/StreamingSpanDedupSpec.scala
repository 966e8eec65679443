package graft

import graft.operators.SpanDedup
import graft.streaming.StreamingSpanDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming duplicate-span marking: continuous-ingestion ExactSubstr
  * over the same hashed gram identity as the batch path. */
class StreamingSpanDedupSpec extends SparkTest {
  import scala.jdk.CollectionConverters._

  private def runStream(batches: Seq[Seq[(Long, String)]],
                        minTokens: Int)
      : Seq[StreamingSpanDedup.Mark] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // bracketed like every sibling streaming spec: plain-streaming
    // suites running later in the same JVM must not inherit RocksDB
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(providerConf,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try runStreamInner(batches, minTokens)
    finally spark.conf.unset(providerConf)
  }

  private def runStreamInner(batches: Seq[Seq[(Long, String)]],
                             minTokens: Int)
      : Seq[StreamingSpanDedup.Mark] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val marks = StreamingSpanDedup.markedStarts(
      mem.toDF().toDF("id", "ts", "text"), "id", "ts", "text",
      minTokens)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingSpanDedup.Mark]()
    val ckpt = java.nio.file.Files.createTempDirectory("spandedup")
      .toString
    val q = marks.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamingSpanDedup.Mark],
         _: Long) => b.collect().foreach(got.add); ()
      }
      .start()
    try {
      batches.zipWithIndex.foreach { case (batch, i) =>
        mem.addData(
          batch.map { case (id, t) => (id, i * 1000L + id, t) })
        q.processAllAvailable()
      }
    } finally q.stop()
    got.iterator().asScala.toSeq
  }

  private val corpus = Seq(
    1L -> "a b c d e f g h",
    2L -> "x1 x2 a b c d e f y1",
    3L -> "all fresh words nothing shared here at all ok",
    4L -> "a b c d e f g h") // exact duplicate of doc 1

  test("single-batch replay marks EXACTLY the batch duplicateSpans set") {
    import spark.implicits._
    for (l <- Seq(3, 4)) {
      val streamed = runStream(Seq(corpus), minTokens = l)
        .map(m => (m.id, m.pos)).toSet
      val batchMarks = SpanDedup.duplicateSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", l)
        .collect().flatMap(r =>
          (r.getLong(1) to r.getLong(2) - l + 1)
            .map(p => (r.getLong(0), p)))
        .toSet
      // spans are maximal merges of the marked windows: rebuild spans
      // from the streamed marks and compare span sets instead
      val streamedSpans = SpanDedup.spansFromMarks(
          streamed.toSeq.toDF("doc_id", "pos"), "doc_id", "pos", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val batchSpans = SpanDedup.duplicateSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(streamedSpans == batchSpans,
        s"L=$l: streamed $streamedSpans vs batch $batchSpans")
      // and every streamed mark is one of the batch-marked windows
      assert(streamed.subsetOf(batchMarks),
        s"L=$l: extra marks ${streamed -- batchMarks}")
    }
  }

  test("cross-batch marking: a gram from batch 1 marks its batch-2 copy; " +
    "the first copy stays unmarked") {
    val marks = runStream(Seq(
      Seq(1L -> "p q r s t"),
      Seq(10L -> "z1 p q r s z2")), minTokens = 4)
    // batch 2's windows at pos 2 (p q r s) duplicate batch 1 → marked;
    // doc 1 emitted nothing (it arrived first)
    assert(marks.map(m => (m.id, m.pos)).toSet == Set((10L, 2L)))
  }

  test("randomized differential: streamed spans equal batch duplicateSpans " +
    "on random small-vocab corpora, single-batch and id-ordered splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717L)
    for (trial <- 1 to 4) {
      // dense collisions: 8 docs, 0-14 tokens from a 4-word vocab
      val corpus = (1L to 8L).map(i => i ->
        Seq.fill(rnd.nextInt(15))(
          Seq("a", "b", "c", "d")(rnd.nextInt(4))).mkString(" "))
      val l = 2 + rnd.nextInt(2) // L in {2, 3}
      val batchSpans = SpanDedup.duplicateSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // single batch, and a 2-way split in id order (earlier ids in
      // the earlier batch → first-arrival == batch keep-first)
      val splits = Seq(Seq(corpus),
        Seq(corpus.take(4), corpus.drop(4)))
      splits.foreach { batches =>
        val marks = runStream(batches, minTokens = l)
        val streamedSpans =
          if (marks.isEmpty) Set.empty[(Long, Long, Long)]
          else SpanDedup.spansFromMarks(
              marks.map(m => (m.id, m.pos)).distinct
                .toDF("doc_id", "pos"), "doc_id", "pos", l)
            .collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .toSet
        assert(streamedSpans == batchSpans,
          s"trial $trial L=$l batches=${batches.size} corpus=$corpus: " +
            s"streamed $streamedSpans vs batch $batchSpans")
      }
    }
  }

  test("re-delivery is safe: the stored first is a no-op, a re-delivered " +
    "duplicate re-emits its mark (island merge is idempotent)") {
    val marks = runStream(Seq(
      Seq(1L -> "m n o p"),
      Seq(1L -> "m n o p"),           // re-delivery of the first
      Seq(2L -> "m n o p"),           // true duplicate
      Seq(2L -> "m n o p")), minTokens = 4) // re-delivered duplicate
    val byDoc = marks.groupBy(_.id)
    assert(!byDoc.contains(1L), s"first copy was marked: $marks")
    // doc 2 marked (possibly twice — at-least-once); spans unaffected
    assert(byDoc(2L).map(m => m.pos).toSet == Set(1L))
    import spark.implicits._
    val spans = SpanDedup.spansFromMarks(
        marks.map(m => (m.id, m.pos)).toDF("doc_id", "pos"),
        "doc_id", "pos", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(spans == Seq((2L, 1L, 4L)))
  }
}
