package graft.streaming

import graft.operators.SpanDedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming exact duplicate-SPAN marking — the continuous-ingestion
  * counterpart of [[graft.operators.SpanDedup.duplicateSpans]] (a feed
  * of crawled documents whose repeated L-token windows are flagged AS
  * THEY ARRIVE, instead of batch re-marking the whole corpus).
  *
  * Same gram identity as the batch path — THE SAME
  * `SpanDedup.gramOccurrences` explode and 128-bit (xxhash64,
  * salted-xxhash64) key — so a replayed corpus marks the identical
  * window set (differentially spec'd against `duplicateSpans`). State
  * is keyed per gram hash and holds only the FIRST occurrence seen
  * (~20 bytes per distinct gram): a later arrival of the same gram
  * emits a mark for itself, and the first occurrence stays unmarked —
  * the streaming rendition of the batch keep-first policy, with
  * "first" meaning first ARRIVAL (equal to the batch (id, pos) order
  * whenever ids arrive in order; within one micro-batch occurrences
  * are sorted by (ts, id, pos), so a single-batch replay is EXACTLY
  * batch keepFirst). Re-delivered occurrences of the stored first are
  * a no-op (at-least-once safe); re-delivery of an already-marked
  * occurrence re-emits its mark — downstream island-merging
  * ([[SpanDedup.spansFromMarks]]) is idempotent over duplicates, so
  * consumers need no extra dedup.
  *
  * A document's marks all land in its arrival micro-batch (the explode
  * and the marking happen inside one query), so span assembly is
  * per-batch work with no cross-batch state: route the emitted marks
  * through `SpanDedup.spansFromMarks` (e.g. in foreachBatch) to get
  * maximal spans, or store raw marks and merge at read time.
  *
  * `ttl` bounds state age for infinite feeds — grams older than the
  * horizon re-admit unmarked, the exact
  * [[graft.operators.Dedup.streamingExact]] trade, and the same
  * ProcessingTime-mode operational note applies (housekeeping
  * micro-batches run even with no data; don't wait on AvailableNow
  * quiescence under a TTL).
  *
  * FULL-DRAIN ASSUMPTION: marks are emitted lazily and the stored
  * "first" advances AS the output iterator is drained (a displacement
  * per state write), so the state is only guaranteed to hold the
  * batch keep-first winner once the runtime has drained a key's whole
  * iterator. Spark's transformWithState operator always drains each
  * key's iterator before committing the state store version, so this
  * holds under every sink; but do NOT interpose a short-circuiting
  * operator (e.g. `limit`) between [[markedStarts]] and the sink — a
  * plan that stops consuming mid-key would commit a partial-batch
  * minimum as the stored first. Route marks straight to the sink (or
  * through foreachBatch) and cut downstream. */
object StreamingSpanDedup {

  /** One gram occurrence: the 128-bit gram key + its location. */
  final case class Occ(gh1: Long, gh2: Long, id: Long, tsNs: Long,
                       pos: Int)
  /** The stored first occurrence of a gram. */
  final case class First(id: Long, pos: Int)
  /** Emitted mark: window at `pos` of document `id` duplicates an
    * earlier-seen gram. */
  final case class Mark(id: Long, pos: Long)

  class Processor(ttlMs: Option[Long])
      extends StatefulProcessor[(Long, Long), Occ, Mark] {

    @transient private var first: ValueState[First] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      first = getHandle.getValueState[First]("first",
        Encoders.product[First],
        ttlMs.map(ms => TTLConfig(java.time.Duration.ofMillis(ms)))
          .getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: (Long, Long),
        rows: Iterator[Occ],
        timerValues: TimerValues): Iterator[Mark] = {
      // ONE streaming pass, no sort, no buffering of input OR output:
      // a boilerplate gram repeated millions of times per batch lands
      // on one task (the skew the batch marker's doc warns about), so
      // neither side may materialize — marks are emitted lazily as
      // the runtime drains the returned iterator, which drives the
      // input iterator one row at a time (constant memory per key).
      // With a stored first, every row except its re-delivery marks
      // regardless of order and no state write happens at all. With
      // empty state, track the running (ts, id, pos)-min — the batch
      // keep-first winner — marking each displaced candidate as it
      // loses; the state write happens ON EACH DISPLACEMENT (expected
      // O(log n) writes for a gram with n same-batch occurrences, not
      // O(n)), so the stored value is correct-so-far at every point
      // of output consumption and exactly the batch keep-first winner
      // once the batch's rows are drained. A single-batch replay
      // still reproduces the batch (id, pos) keep-first exactly.
      Option(first.get()) match {
        case Some(f) =>
          rows.collect {
            case r if f.id != r.id || f.pos != r.pos => // re-delivery
              Mark(r.id, r.pos.toLong)                  // is a no-op
          }
        case None =>
          new Iterator[Mark] {
            private var best: Occ = null
            private var pending: Mark = null
            private def advance(): Unit =
              while (pending == null && rows.hasNext) {
                val r = rows.next()
                if (best == null) {
                  best = r
                  first.update(First(best.id, best.pos))
                } else if (r.id == best.id && r.pos == best.pos) {
                  () // same-batch re-delivery of the current winner
                } else if (Ordering[(Long, Long, Int)].lt(
                  (r.tsNs, r.id, r.pos),
                  (best.tsNs, best.id, best.pos))) {
                  pending = Mark(best.id, best.pos.toLong)
                  best = r
                  first.update(First(best.id, best.pos))
                } else pending = Mark(r.id, r.pos.toLong)
              }
            override def hasNext: Boolean = { advance(); pending != null }
            override def next(): Mark = {
              advance()
              if (pending == null) throw new NoSuchElementException
              val m = pending; pending = null; m
            }
          }
      }
    }
  }

  /** Wire the marker over a streaming doc frame.
    * @param idCol long document id, @param tsCol event-time LONG nanos
    *   (ordering within a micro-batch), @param textCol document text */
  def markedStarts(docs: DataFrame, idCol: String, tsCol: String,
                   textCol: String, minTokens: Int,
                   ttl: Option[java.time.Duration] = None)
      : Dataset[Mark] = {
    require(minTokens >= 2, s"minTokens=$minTokens out of [2,∞)")
    import docs.sparkSession.implicits._
    SpanDedup.gramOccurrences(
        docs.select(col(idCol).cast("long").as("id"),
          col(tsCol).cast("long").as("tsNs"), col(textCol).as("text")),
        "id", "text", minTokens, exactGrams = false,
        carryCols = Seq("tsNs"))
      .select(col("gh1"), col("gh2"), col("id"), col("tsNs"),
        col("pos").cast("int").as("pos"))
      .as[Occ]
      .groupByKey(r => (r.gh1, r.gh2))
      .transformWithState(
        new Processor(ttl.map(_.toMillis)),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
