package graft.streaming

import graft.streaming.AlertMachine._
import graft.streaming.MavgStream.{AlertRow, Conf, Input, LimStateS}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` variant of the mavg processor: the
  * SAME semantics as [[MavgStream]] by construction — both delegate to
  * [[MavgStream.step]] (fold, hot-reloadable limit resolution,
  * per-section hysteresis, lifecycle, Gone-pruning, retirement) — but
  * with PER-KEY timers, the exact primitive the reference's dedicated
  * underlimit scanner thread emulates (monit-objects-mavg-under.c:
  * every key must tick even when silent). flatMapGroupsWithState only
  * offers a per-group timeout reset by any activity; the TWS API
  * registers explicit timers that fire independently of data, giving
  * the silent-key tick the natural Spark-native shape. Exactly one
  * timer chain runs per live key (handleInputRows only registers when
  * none is outstanding), and a retired key's chain stops with it.
  */
class MavgTwsProcessor(conf: Conf)
    extends StatefulProcessor[String, Input, AlertRow] {
  import MavgTwsProcessor.{LimEntry, TwsState}

  @transient private var state: ValueState[TwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    // state is Avro-encoded: flat product types only (no Map columns)
    state = getHandle.getValueState[TwsState]("mavg",
      Encoders.product[TwsState], TTLConfig.NONE)
  }

  /** Shared-core step ([[MavgStream.step]] — identical fold, limit
    * resolution incl. the hot-reloadable providers, lifecycle, pruning
    * and retirement semantics as the flatMapGroupsWithState variant).
    * @return retire: the caller decides timer re-arming from it */
  private def foldAndCheck(key: String, rows: Seq[Input],
                           nowNsIfTick: Option[Long])
      : (Iterator[AlertRow], Boolean) = {
    val st = Option(state.get()).getOrElse(
      TwsState(0.0, Long.MinValue, Seq.empty))
    val lims0: Map[Int, LimState] =
      st.lims.map(e => e.idx -> MavgTwsProcessor.fromS(e.s)).toMap
    val (n, tLast, lims, events, retire) =
      MavgStream.step(conf, key, rows, st.n, st.tLast, lims0, nowNsIfTick)
    if (retire) state.clear()
    else state.update(TwsState(n, tLast,
      lims.toSeq.sortBy(_._1).map { case (i, s) =>
        LimEntry(i, MavgTwsProcessor.toS(s)) }))
    (events.iterator, retire)
  }

  override def handleInputRows(key: String, inputRows: Iterator[Input],
      timerValues: TimerValues): Iterator[AlertRow] = {
    val rows = inputRows.toSeq
    val (out, retire) = foldAndCheck(key, rows, None)
    // per-key timer: the silent-key tick (underlimit scanner cadence).
    // Register ONLY when none is outstanding — an unconditional register
    // here would mint one self-perpetuating timer chain per data batch
    // (each expiry re-registers in handleExpiredTimer), growing the
    // timer column-family without bound.
    if (conf.tickIntervalMs > 0 && !retire &&
        !getHandle.listTimers().hasNext)
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + conf.tickIntervalMs)
    out
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[AlertRow] = {
    val (out, retire) = foldAndCheck(key, Nil,
      Some(timerValues.getCurrentProcessingTimeInMs() * 1_000_000L))
    // continue the (single) tick chain only while the key is live —
    // a retired key's chain ends here and new data restarts it
    if (conf.tickIntervalMs > 0 && !retire)
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + conf.tickIntervalMs)
    out
  }
}

object MavgTwsProcessor {
  /** Avro-friendly flat state (the TWS state encoder rejects MapType). */
  final case class LimEntry(idx: Int, s: LimStateS)
  final case class TwsState(n: Double, tLast: Long, lims: Seq[LimEntry])

  private[streaming] def toS(s: LimState): LimStateS =
    LimStateS(s.state match {
      case New => 0; case Update => 1; case AlmostGone => 2; case Gone => 3
    }, s.timeLastNs, s.timeDumpNs, s.timeBack2NormNs, s.value, s.limit,
      s.back2normNs)

  private[streaming] def fromS(s: LimStateS): LimState =
    LimState(s.state match {
      case 0 => New; case 1 => Update; case 2 => AlmostGone; case _ => Gone
    }, s.timeLast, s.timeDump, s.timeB2n, s.value, s.limit, s.b2n)

  /** Wire over a keyed input stream with the TWS operator. */
  def apply(input: Dataset[Input], conf: Conf): Dataset[AlertRow] = {
    import input.sparkSession.implicits._
    val timeMode =
      if (conf.tickIntervalMs > 0) TimeMode.ProcessingTime()
      else TimeMode.None()
    input
      .groupByKey(_.key)
      .transformWithState(new MavgTwsProcessor(conf),
        timeMode, OutputMode.Append())
  }
}
