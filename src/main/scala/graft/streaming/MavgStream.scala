package graft.streaming

import graft.streaming.AlertMachine._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming mavg: per-key decaying average + threshold alerting as a
  * Structured Streaming stateful operator.
  *
  * The reference runs this in the capture threads (decay-update per
  * arrival, monit-objects-mavg.c:887-1030) plus a 100 ms act thread for
  * the alert lifecycle and a 1 s underlimit scanner
  * (monit-objects-mavg-act.c:569-592, monit-objects-mavg-under.c:315-343).
  * Here all three collapse into one keyed stateful processor:
  *  - arrivals fold the decay recurrence in event order;
  *  - every limit is checked per arrival (val/T vs limit);
  *  - the lifecycle machine ([[AlertMachine]]) advances on every batch and
  *    on processing-time timeouts, which also cover the underlimit case
  *    ("silent key" detection needs ticks without data — the reason the
  *    reference has a dedicated scanner thread, SURVEY.md §7.4).
  *
  * State per key is O(#limits); the state store scales out with the
  * shuffle partitioning of the key column.
  */
object MavgStream {

  /** One flow contribution: group key (pre-concatenated), event-time ns,
    * measure value (already scale×sampling-rate adjusted). */
  final case class Input(key: String, tsNs: Long, v: Double)

  /** Encoder-friendly flat state. */
  final case class LimStateS(state: Int, timeLast: Long, timeDump: Long,
                             timeB2n: Long, value: Double, limit: Double,
                             b2n: Long)
  final case class KeyState(n: Double, tLast: Long,
                            lims: Map[Int, LimStateS])

  final case class AlertRow(key: String, limitIdx: Int, event: String,
                            value: Double, limit: Double, timeNs: Long)

  final case class Conf(
      windowSec: Long = 5L,       // reference monit-objects.h:12
      limits: Map[String, Seq[Double]] = Map.empty,
      defaultLimits: Seq[Double] = Seq.empty,
      back2normSec: Long = 30L,   // reference monit-objects.h:14
      isOver: Boolean = true,
      /** hot-reloadable per-key limits file; when set it overrides
        * `limits` and a file edit takes effect on the NEXT micro-batch
        * without restarting the query (reference SIGHUP +
        * mavg_limits_update bank swap, monit-objects-mavg.c:756-774) */
      limitsProvider: Option[graft.config.Reloadable[
        Map[String, Seq[Double]]]] = None,
      /** per-overlimit-section limits files, aligned with
        * `defaultLimits` indices — each section resolves its threshold
        * independently (its file's value for the key, else that
        * section's default), matching the reference's one-file-per-
        * mavg_limit layout (CONFIG.md:438-469). Takes precedence over
        * `limitsProvider`/`limits` when non-empty. */
      limitsProviders: Seq[Option[graft.config.Reloadable[
        Map[String, Seq[Double]]]]] = Nil,
      /** processing-time tick for silent keys (reference's 1 s underlimit
        * scanner cadence). <= 0 disables the timer: lifecycle then only
        * advances on arrivals — right for batch replays and tests, where
        * wall-clock ticks against event-time data would churn forever. */
      tickIntervalMs: Long = 1000L)

  private def toS(s: LimState): LimStateS =
    LimStateS(s.state match {
      case New => 0; case Update => 1; case AlmostGone => 2; case Gone => 3
    }, s.timeLastNs, s.timeDumpNs, s.timeBack2NormNs, s.value, s.limit,
      s.back2normNs)

  private def fromS(s: LimStateS): LimState =
    LimState(s.state match {
      case 0 => New; case 1 => Update; case 2 => AlmostGone; case _ => Gone
    }, s.timeLast, s.timeDump, s.timeB2n, s.value, s.limit, s.b2n)

  /** Wire the stateful processor over a keyed input stream. */
  def apply(input: Dataset[Input], conf: Conf): Dataset[AlertRow] = {
    import input.sparkSession.implicits._
    val timeout =
      if (conf.tickIntervalMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, AlertRow](
        OutputMode.Append, timeout)(process(conf))
  }

  /** The per-key update function (public for deterministic testing). */
  def process(conf: Conf)(
      key: String, rows: Iterator[Input],
      state: GroupState[KeyState]): Iterator[AlertRow] = {
    val windowNs = conf.windowSec * 1_000_000_000L
    val b2nNs = conf.back2normSec * 1_000_000_000L
    val limitVals: Seq[Double] =
      if (conf.limitsProviders.nonEmpty)
        // per-section resolution: a key row in one section's file never
        // silences the OTHER sections' checks
        conf.defaultLimits.zipWithIndex.map { case (d, i) =>
          conf.limitsProviders.lift(i).flatten
            .flatMap(_.get().get(key)).flatMap(_.headOption).getOrElse(d)
        }
      else {
        val limitsMap = conf.limitsProvider match {
          case Some(r) => r.get()
          case None    => conf.limits
        }
        limitsMap.getOrElse(key, conf.defaultLimits)
      }

    var st = state.getOption.getOrElse(KeyState(0.0, Long.MinValue, Map.empty))
    var lims: Map[Int, LimState] =
      st.lims.map { case (i, s) => i -> fromS(s) }
    val out = Seq.newBuilder[AlertRow]
    var nowNs = 0L

    if (state.hasTimedOut) {
      nowNs = state.getCurrentProcessingTimeMs() * 1_000_000L
    } else {
      // fold arrivals in event order (decay recurrence per arrival,
      // reference mavg_recalc monit-objects-mavg.c:571-593)
      val sorted = rows.toSeq.sortBy(r => (r.tsNs, r.v))
      sorted.foreach { r =>
        val dt = (r.tsNs - st.tLast).toDouble
        val n =
          if (st.tLast == Long.MinValue || dt >= windowNs) r.v
          else st.n - dt / windowNs * st.n + r.v
        st = st.copy(n = n, tLast = r.tsNs)
        nowNs = r.tsNs
        // limit check per arrival (mavg_limits_check:535-569)
        limitVals.zipWithIndex.foreach { case (limit, i) =>
          val perSec = n / conf.windowSec
          val breach = if (conf.isOver) perSec >= limit else perSec <= limit
          if (breach) {
            lims += i -> onBreach(lims.get(i), r.tsNs, perSec, limit, b2nNs)
          }
        }
      }
    }

    // lifecycle tick (reference act thread)
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
      // underlimit of silent keys: even with no arrivals the decayed value
      // eventually crosses the limit — tested on the timeout path
      if (!conf.isOver && !state.hasTimedOut) {
        limitVals.zipWithIndex.foreach { case (limit, i) =>
          if (!lims.contains(i)) {
            val perSec = st.n / conf.windowSec
            if (perSec <= limit)
              lims += i -> onBreach(None, nowNs, perSec, limit, b2nNs)
          }
        }
      }
    }

    state.update(KeyState(st.n, st.tLast,
      lims.map { case (i, s) => i -> toS(s) }))
    if (conf.tickIntervalMs > 0) state.setTimeoutDuration(conf.tickIntervalMs)
    out.result().iterator
  }
}
