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
  * quiescence under a TTL). */
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
      // ONE streaming pass, no sort, no Occ buffering: a boilerplate
      // gram repeated millions of times per batch lands on one task
      // (the skew the batch marker's doc warns about), so this must
      // not materialize the iterator. With a stored first, every row
      // except its re-delivery marks regardless of order. With empty
      // state, track the running (ts, id, pos)-min — the batch
      // keep-first winner — marking each displaced candidate as it
      // loses; a single-batch replay still reproduces the batch
      // (id, pos) keep-first exactly.
      val stored = Option(first.get())
      val out = Seq.newBuilder[Mark]
      var best: Occ = null
      rows.foreach { r =>
        stored match {
          case Some(f) =>
            if (f.id != r.id || f.pos != r.pos) // stored-first
              out += Mark(r.id, r.pos.toLong)   // re-delivery: no-op
          case None =>
            if (best == null) best = r
            else if (r.id == best.id && r.pos == best.pos)
              () // same-batch re-delivery of the current winner
            else if (Ordering[(Long, Long, Int)].lt(
              (r.tsNs, r.id, r.pos), (best.tsNs, best.id, best.pos))) {
              out += Mark(best.id, best.pos.toLong)
              best = r
            } else out += Mark(r.id, r.pos.toLong)
        }
      }
      if (stored.isEmpty && best != null)
        first.update(First(best.id, best.pos))
      out.result().iterator
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
