package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming MinHash near-dup candidates — the continuous-ingestion
  * counterpart of [[graft.operators.Dedup.minhashCandidates]] (a feed
  * of crawled documents deduplicated AS IT ARRIVES, instead of batch
  * re-clustering the whole corpus).
  *
  * Same sketch family as the batch path (word k-shingles → md5-derived
  * MinHash → `bands` concatenated buckets), so with `minEst = 0` the
  * emitted pair set over a replayed corpus is IDENTICAL to the batch
  * candidates AS UNORDERED PAIRS (differentially spec'd): orientation
  * differs when arrival order differs from id order — streaming sets
  * a = the earlier ARRIVAL, batch normalizes a < b by id. Docs with no
  * shingles (< shingleK words, NULL text) are dropped, as in batch.
  * Each arriving doc is compared
  * against every PRIOR doc sharing a band bucket; a pair is emitted as
  * (a = earlier id, b = later id, est), where `est` is the unbiased
  * signature-agreement Jaccard estimate (matching components /
  * numHashes). The batch pipeline verifies candidates with EXACT
  * Jaccard; streaming trades that for sketch-only state — route
  * emitted pairs through `Dedup.jaccardVerify` in a foreachBatch for
  * exactness when the texts are still at hand.
  *
  * Pairs sharing several buckets surface once PER BAND (different
  * state partitions cannot coordinate) — consumers dedup on (a, b),
  * exactly like the batch candidates path's `.distinct()`.
  *
  * State: per-bucket signature lists, ~8·numHashes bytes per doc per
  * band. A hot bucket (boilerplate shingles) grows with the corpus:
  * `maxPerBucket` caps it — past the cap, arrivals still COMPARE
  * against the stored prefix but are not added (recall on pairs wholly
  * past the cap is lost; the warning is logged once per bucket per
  * micro-batch). The re-delivery no-op below covers RETAINED ids only:
  * a doc that arrived past the cap was never stored, so re-delivering
  * it re-emits its pairs — consumers must dedup on (a, b) regardless
  * (band multiplicity already requires it).
  * `ttl` bounds state age for infinite feeds (re-crawls past the TTL
  * re-admit, the [[Dedup.streamingExact]] trade). Operational note:
  * a TTL switches the query to `TimeMode.ProcessingTime`, under which
  * the engine schedules housekeeping micro-batches even with no data
  * (the TTL clock must advance) — set a real trigger interval, and
  * don't wait on `processAllAvailable`/`AvailableNow` quiescence (it
  * never settles; the spec waits on reported `numInputRows` instead).
  */
object StreamingNearDup {

  /** One doc in one band bucket. */
  final case class BandRow(bandKey: String, id: Long, tsNs: Long,
                           sig: Seq[Long])
  /** Stored per-bucket entry. */
  final case class BucketEntry(id: Long, sig: Seq[Long])
  /** Emitted candidate: a arrived before b. */
  final case class Cand(a: Long, b: Long, est: Double)

  class Processor(minEst: Double, maxPerBucket: Int, ttlMs: Option[Long])
      extends StatefulProcessor[String, BandRow, Cand] {

    @transient private var entries: ListState[BucketEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      entries = getHandle.getListState[BucketEntry]("sigs",
        Encoders.product[BucketEntry],
        ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
          .getOrElse(TTLConfig.NONE))

    private def estimate(a: Seq[Long], b: Seq[Long]): Double = {
      var eq = 0
      var i = 0
      while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
      eq.toDouble / a.length
    }

    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[Cand] = {
      val stored = scala.collection.mutable.ArrayBuffer
        .from(entries.get())
      val out = Seq.newBuilder[Cand]
      var warned = false
      // (ts, id) order makes within-batch pairs deterministic
      rows.toSeq.sortBy(r => (r.tsNs, r.id)).foreach { r =>
        // first arrival wins, like streamingExact's
        // dropDuplicatesWithinWatermark: a re-delivered or re-crawled id
        // that is already stored is a complete no-op — comparing it
        // again would re-emit its pairs REVERSED ((b, a) with a the
        // later arrival). Covers RETAINED ids; an id that arrived past
        // the cap re-compares on re-delivery (see class doc)
        if (stored.exists(_.id == r.id)) ()
        else {
          stored.foreach { e =>
            val est = estimate(e.sig, r.sig)
            if (est >= minEst) out += Cand(e.id, r.id, est)
          }
          if (stored.size < maxPerBucket) {
            val e = BucketEntry(r.id, r.sig)
            entries.appendValue(e)
            stored += e
          } else if (!warned) {
            warned = true
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"near-dup bucket $key at maxPerBucket=$maxPerBucket: " +
                "new docs compare but are not retained")
          }
        }
      }
      out.result().iterator
    }
  }

  /** Wire the operator over a streaming doc frame.
    * @param idCol long document id, @param tsCol event-time LONG nanos
    *   (ordering within a micro-batch), @param textCol document text */
  def candidates(docs: DataFrame, idCol: String, tsCol: String,
                 textCol: String, shingleK: Int = 3, numHashes: Int = 16,
                 bands: Int = 4, minEst: Double = 0.0,
                 maxPerBucket: Int = 4096,
                 ttl: Option[java.time.Duration] = None): Dataset[Cand] = {
    require(numHashes % bands == 0, s"$bands bands must divide $numHashes")
    import docs.sparkSession.implicits._
    val rows = numHashes / bands
    // band key layout mirrors Dedup.lshBuckets: "<band>|h_i|h_j|..."
    val bandCols = (0 until bands).map { b =>
      concat_ws("|", lit(b) +:
        (b * rows until (b + 1) * rows)
          .map(j => element_at(col("__sig"), j + 1).cast("string")): _*)
    }
    docs
      .select(col(idCol).cast("long").as("id"),
        col(tsCol).cast("long").as("tsNs"),
        Dedup.shingles(col(textCol), shingleK).as("__sh"))
      // a doc with no shingles (< shingleK words, or NULL text) has an
      // all-NULL signature that would poison the query PERMANENTLY on
      // BandRow deserialization (restart replays the batch and dies
      // again); drop it here — the batch path's explode drops the same
      // docs, so the replay equivalence is preserved
      .filter(size(col("__sh")) > 0)
      // base hashes as their OWN projection: one md5 per shingle total,
      // not one per hash function (see Dedup.shingleHashes)
      .select(col("id"), col("tsNs"),
        Dedup.shingleHashes(col("__sh")).as("__h"))
      .select(col("id"), col("tsNs"),
        Dedup.minhashFromHashes(col("__h"), numHashes).as("__sig"))
      .select(col("id"), col("tsNs"), col("__sig"),
        explode(array(bandCols: _*)).as("bandKey"))
      .select(col("bandKey"), col("id"), col("tsNs"),
        col("__sig").as("sig"))
      .as[BandRow]
      .groupByKey(_.bandKey)
      .transformWithState(
        new Processor(minEst, maxPerBucket, ttl.map(_.toMillis)),
        // state TTL needs a clock; otherwise stay time-mode-free
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
