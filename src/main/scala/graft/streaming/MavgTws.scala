package graft.streaming

import graft.streaming.AlertMachine._
import graft.streaming.MavgStream.{AlertRow, Conf, Input, LimStateS}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` variant of the mavg processor: same
  * decay/limit/lifecycle semantics as [[MavgStream]], but with
  * PER-KEY timers — the exact primitive the reference's dedicated
  * underlimit scanner thread emulates (monit-objects-mavg-under.c:
  * every key must tick even when silent). flatMapGroupsWithState only
  * offers a per-group timeout reset by any activity; the TWS API
  * registers explicit timers that fire independently of data, giving
  * the silent-key tick the natural Spark-native shape.
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

  private def foldAndCheck(key: String, rows: Seq[Input],
                           nowNsIfTick: Option[Long]): Iterator[AlertRow] = {
    val windowNs = conf.windowSec * 1_000_000_000L
    val b2nNs = conf.back2normSec * 1_000_000_000L
    val limitVals = conf.limits.getOrElse(key, conf.defaultLimits)

    var st = Option(state.get()).getOrElse(
      TwsState(0.0, Long.MinValue, Seq.empty))
    var lims: Map[Int, LimState] =
      st.lims.map(e => e.idx -> MavgTwsProcessor.fromS(e.s)).toMap
    val out = Seq.newBuilder[AlertRow]
    var nowNs = nowNsIfTick.getOrElse(0L)

    rows.sortBy(r => (r.tsNs, r.v)).foreach { r =>
      val dt = (r.tsNs - st.tLast).toDouble
      val n =
        if (st.tLast == Long.MinValue || dt >= windowNs) r.v
        else st.n - dt / windowNs * st.n + r.v
      st = st.copy(n = n, tLast = r.tsNs)
      nowNs = r.tsNs
      limitVals.zipWithIndex.foreach { case (limit, i) =>
        val perSec = n / conf.windowSec
        val breach = if (conf.isOver) perSec >= limit else perSec <= limit
        if (breach)
          lims += i -> onBreach(lims.get(i), r.tsNs, perSec, limit, b2nNs)
      }
    }

    if (nowNs > 0L) {
      lims = lims.map { case (i, s0) =>
        val (s1, evs) = onTick(s0, nowNs, windowNs, conf.isOver)
        evs.foreach { e =>
          val (nm, v) = e match {
            case Started(v0, _) => ("start", v0)
            case Updated(v0)    => ("update", v0)
            case Ended(v0)      => ("end", v0)
          }
          out += AlertRow(key, i, nm, v, s1.limit, nowNs)
        }
        i -> s1
      }
      if (!conf.isOver && rows.nonEmpty) {
        limitVals.zipWithIndex.foreach { case (limit, i) =>
          if (!lims.contains(i)) {
            val perSec = st.n / conf.windowSec
            if (perSec <= limit)
              lims += i -> onBreach(None, nowNs, perSec, limit, b2nNs)
          }
        }
      }
    }

    state.update(TwsState(st.n, st.tLast,
      lims.toSeq.sortBy(_._1).map { case (i, s) =>
        LimEntry(i, MavgTwsProcessor.toS(s)) }))
    out.result().iterator
  }

  override def handleInputRows(key: String, inputRows: Iterator[Input],
      timerValues: TimerValues): Iterator[AlertRow] = {
    val rows = inputRows.toSeq
    // per-key timer: the silent-key tick (underlimit scanner cadence)
    if (conf.tickIntervalMs > 0)
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + conf.tickIntervalMs)
    foldAndCheck(key, rows, None)
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[AlertRow] = {
    if (conf.tickIntervalMs > 0)
      getHandle.registerTimer(
        timerValues.getCurrentProcessingTimeInMs() + conf.tickIntervalMs)
    foldAndCheck(key, Nil,
      Some(timerValues.getCurrentProcessingTimeInMs() * 1_000_000L))
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
