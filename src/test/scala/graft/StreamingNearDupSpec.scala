package graft

import graft.operators.Dedup
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming MinHash near-dup candidates: continuous-ingestion dedup
  * over the same sketch family as the batch path. */
class StreamingNearDupSpec extends SparkTest {

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away"),
    (2L, "the quick brown fox jumps over the lazy dog and walks away"),
    (3L, "completely unrelated text about distributed query engines"),
    (4L, "the quick brown fox jumps over the lazy dog and runs home"),
    (5L, "another unrelated paragraph mentioning parquet and shuffles"))

  private def runStream(batches: Seq[Seq[(Long, String)]],
                        minEst: Double,
                        bands: Int,
                        ttl: Option[java.time.Duration] = None,
                        interBatchSleepMs: Long = 0L)
      : Seq[StreamingNearDup.Cand] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long, String)]
    val cands = StreamingNearDup.candidates(
      mem.toDF().toDF("id", "ts", "text"), "id", "ts", "text",
      shingleK = 2, numHashes = 16, bands = bands, minEst = minEst,
      ttl = ttl)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      StreamingNearDup.Cand]()
    val ckpt = java.nio.file.Files.createTempDirectory("neardup").toString
    def mkQuery(trigger: org.apache.spark.sql.streaming.Trigger) =
      cands.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .trigger(trigger)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamingNearDup.Cand],
           _: Long) => b.collect().foreach(got.add); ()
        }
        .start()
    try {
      if (ttl.isEmpty) {
        val q = mkQuery(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(0))
        try {
          batches.zipWithIndex.foreach { case (batch, i) =>
            mem.addData(
              batch.map { case (id, t) => (id, i * 1000L + id, t) })
            q.processAllAvailable()
          }
        } finally q.stop()
      } else {
        // TimeMode.ProcessingTime schedules housekeeping micro-batches
        // forever (TTL needs the clock to advance), so neither
        // processAllAvailable nor AvailableNow ever settles — instead
        // wait until the engine REPORTS having consumed our input rows
        // (numInputRows over recentProgress), then move on
        val q = mkQuery(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime(100))
        try {
          var total = 0L
          batches.zipWithIndex.foreach { case (batch, i) =>
            if (i > 0 && interBatchSleepMs > 0)
              Thread.sleep(interBatchSleepMs)
            mem.addData(
              batch.map { case (id, t) => (id, i * 1000L + id, t) })
            total += batch.size
            val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
            while (q.recentProgress.map(_.numInputRows).sum < total &&
                System.nanoTime < deadline) Thread.sleep(50)
            assert(q.recentProgress.map(_.numInputRows).sum >= total,
              s"timed out waiting for batch $i to be consumed")
          }
        } finally q.stop()
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got.toArray(Array.empty[StreamingNearDup.Cand]).toSeq
  }

  test("pairs emit across micro-batches; a is always the earlier doc; " +
    "unrelated docs never pair") {
    // bands=8 (rows of 2): all three similar-pair buckets collide for
    // these fixed texts; deterministic ests 0.625 / 0.9375 / 0.5625
    val out = runStream(
      Seq(Seq(docs(0), docs(1), docs(2)), Seq(docs(3), docs(4))),
      minEst = 0.5, bands = 8)
    val pairs = out.map(c => (c.a, c.b)).distinct.sorted
    assert(pairs == Seq((1L, 2L), (1L, 4L), (2L, 4L)), s"got $out")
    // batch-1 pair found within the batch; batch-2 arrivals matched
    // against RESTORED state from batch 1
    assert(out.forall(c => c.est >= 0.5 && c.a < c.b), out.toString)
    assert(!out.exists(c => c.a == 3L || c.b == 3L || c.a == 5L ||
      c.b == 5L), s"unrelated docs paired: $out")
  }

  test("a re-delivered id is compared but not re-stored: emitted pair " +
    "multiset identical to the exactly-once run") {
    val once = runStream(
      Seq(Seq(docs(0), docs(1)), Seq(docs(3))), minEst = 0.5, bands = 8)
    val redelivered = runStream(
      Seq(Seq(docs(0), docs(1)), Seq(docs(0)), Seq(docs(3))),
      minEst = 0.5, bands = 8)
    // no self-pairs from the redelivery, and doc 4's arrivals pair with
    // doc 1 exactly as often as when doc 1 was stored once
    assert(!redelivered.exists(c => c.a == c.b), redelivered.toString)
    assert(redelivered.map(c => (c.a, c.b)).sorted ==
      once.map(c => (c.a, c.b)).sorted,
      s"redelivered=$redelivered once=$once")
  }

  test("a doc with fewer than shingleK words, or NULL text, is dropped " +
    "instead of poisoning the query with an all-NULL signature") {
    // doc 6 ("single") has no 2-shingles; doc 7 has NULL text — both
    // would crash BandRow deserialization if they reached the encoder
    val out = runStream(
      Seq(Seq(docs(0), (6L, "single"), (7L, null)), Seq(docs(3))),
      minEst = 0.5, bands = 8)
    assert(out.map(c => (c.a, c.b)).distinct == Seq((1L, 4L)),
      s"shingle-less docs must be dropped, others still pair: $out")
  }

  test("state TTL: a generous TTL keeps cross-batch pairing; an expired " +
    "TTL forgets batch-1 docs (the bounded-state infinite-feed trade)") {
    // TTL >> test runtime: identical behavior to no-TTL
    val kept = runStream(
      Seq(Seq(docs(0)), Seq(docs(3))), minEst = 0.5, bands = 8,
      ttl = Some(java.time.Duration.ofHours(1)))
    assert(kept.map(c => (c.a, c.b)).distinct == Seq((1L, 4L)),
      s"long TTL must pair across batches: $kept")
    // TTL of 1 ms + a 1.5 s gap: batch-1 state is expired before doc 4
    // arrives, so the (1, 4) pair is never formed
    val expired = runStream(
      Seq(Seq(docs(0)), Seq(docs(3))), minEst = 0.5, bands = 8,
      ttl = Some(java.time.Duration.ofMillis(1)),
      interBatchSleepMs = 1500)
    assert(expired.isEmpty,
      s"expired TTL must forget batch-1 docs: $expired")
  }

  test("property: random corpora under random batch splits stream the " +
    "batch candidate set exactly, as unordered pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    (1 to 2).foreach { round =>
      // clustered corpus: a few base docs plus mutated near-copies, and
      // some short/empty poison docs that must be silently dropped
      val bases = (0 until 3).map(_ =>
        (0 until 8).map(_ => vocab(rnd.nextInt(vocab.size))))
      val corpus = (0 until 14).map { i =>
        val words = bases(rnd.nextInt(bases.size)).map(w =>
          if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else w)
        (i.toLong, words.mkString(" "))
      } ++ Seq((14L, "solo"), (15L, ""))
      // random split into 1-4 batches, random order within the corpus
      val shuffled = rnd.shuffle(corpus)
      val nBatches = 1 + rnd.nextInt(4)
      val batches = shuffled.grouped(
        math.max(1, (shuffled.size + nBatches - 1) / nBatches)).toSeq
      val streamed = runStream(batches, minEst = 0.0, bands = 4)
        .map(c => (math.min(c.a, c.b), math.max(c.a, c.b)))
        .distinct.sorted
      val batch = Dedup.minhashCandidates(
          corpus.toDF("doc_id", "text"), "doc_id", "text",
          shingleK = 2, numHashes = 16, bands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(streamed == batch,
        s"round $round: stream=$streamed batch=$batch " +
          s"(split=${batches.map(_.map(_._1))})")
    }
  }

  test("shingleHashes across a projection boundary keeps ONE md5 per " +
    "shingle in the optimized plan (not one per hash function)") {
    // range-backed source: a LocalRelation of literals would be fully
    // constant-folded away, leaving no md5 in the plan at all
    val df = spark.range(4)
      .select(col("id"), concat(lit("a b c d "), col("id")).as("text"))
      .select(col("id"), Dedup.shingles(col("text"), 2).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), Dedup.shingleHashes(col("__sh")).as("__h"))
      .select(col("id"), Dedup.minhashFromHashes(col("__h"), 16)
        .as("__sig"))
    val plan = df.queryExecution.optimizedPlan.toString
    val md5s = "md5\\(".r.findAllIn(plan).length
    assert(md5s == 1,
      s"expected the single shingleHashes md5 pass, got $md5s in:\n$plan")
    // and the convenience form really does inline 16 of them — the
    // trap the boundary exists to avoid
    val naive = spark.range(4)
      .select(concat(lit("a b c d "), col("id")).as("text"))
      .select(Dedup.minhashSignature(
        Dedup.shingles(col("text"), 2), 16).as("__sig"))
    val naiveMd5s = "md5\\(".r
      .findAllIn(naive.queryExecution.optimizedPlan.toString).length
    assert(naiveMd5s == 16, s"expected 16 inlined md5s, got $naiveMd5s")
  }

  test("minEst = 0 replayed corpus equals the batch candidate set " +
    "(same sketch family, same banding)") {
    import spark.implicits._
    val out = runStream(Seq(docs.take(3), docs.drop(3)), minEst = 0.0,
      bands = 4)
    val streamed = out.map(c => (c.a, c.b)).distinct.sorted
    val batch = Dedup.minhashCandidates(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(streamed == batch,
      s"stream=$streamed batch=$batch (must be identical)")
  }
}
