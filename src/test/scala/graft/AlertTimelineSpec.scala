package graft

import graft.operators.AlertTimeline
import org.apache.spark.sql.functions._

/** Operator plumbing for the batch alert-timeline replay (the machine
  * itself is modeled in AlertMachineSpec; q82 oracle-checks the
  * composition): grid bucketing, per-key isolation, gap decay, restart
  * cycles, and input hygiene. */
class AlertTimelineSpec extends SparkTest {

  private def replay(rows: Seq[(Long, Long, Long, Long)], n: Int = 32) =
    AlertTimeline.replay(
      flowDf(Seq("k", "i", "v", "lim"),
        rows.map(r => Seq(r._1, r._2, r._3, r._4))),
      "k", "i", "v", "lim", nTicks = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSeq.sortBy(e => (e._1, e._2))

  test("full lifecycle: started at breach tick, updated on the 3-tick " +
    "cadence with decayed values, ended after 2-tick hysteresis") {
    val ev = replay(Seq((1L, 4L, 100L, 50L)))
    // breach at t=4 (v=100 > 50): started; decay 100*(1-k/8) ticks
    // after: t=7 decayed 62.5 (>50, update), updated fires (cadence 3);
    // t=8 50.0 -> almost (b2n=8); t=10 updated 25.0; t=11 > 8+2: ended
    assert(ev == Seq(
      (1L, 4L, "started", 100.0),
      (1L, 7L, "updated", 62.5),
      (1L, 10L, "updated", 25.0),
      (1L, 11L, "ended", 12.5)))
  }

  test("keys are independent and a re-breach after gone restarts") {
    val ev = replay(Seq(
      (1L, 2L, 100L, 50L), (1L, 20L, 80L, 50L), // key 1: two episodes
      (2L, 5L, 999L, 900L)))                    // key 2: its own episode
    val k1 = ev.filter(_._1 == 1L)
    assert(k1.count(_._3 == "started") == 2, s"restart expected: $k1")
    assert(k1.count(_._3 == "ended") == 2)
    assert(ev.filter(_._1 == 2L).map(_._3).contains("started"))
    // episodes don't bleed: second start is at t=20 with the new value
    assert(k1.exists(e => e._2 == 20L && e._3 == "started" &&
      e._4 == 80.0))
  }

  test("sub-limit traffic never alerts; rows outside the grid are " +
    "ignored; multiple rows per (key, idx) sum before the compare") {
    assert(replay(Seq((1L, 3L, 49L, 50L))).isEmpty)
    assert(replay(Seq((1L, -5L, 999L, 50L), (1L, 999L, 999L, 50L)))
      .isEmpty)
    // two rows of 30 at one tick sum to 60 > 50 -> alert
    val summed = replay(Seq((1L, 3L, 30L, 50L), (1L, 3L, 30L, 50L)))
    assert(summed.headOption.exists(e => e._3 == "started" &&
      e._4 == 60.0))
  }

  test("replay is a distributed group-by (no collect): plan has an " +
    "exchange on the key and the output survives repartitioned input") {
    val df = flowDf(Seq("k", "i", "v", "lim"),
      (0 until 64).map(j => Seq(j.toLong % 8, 4L, 100L, 50L)))
      .repartition(7)
    val out = AlertTimeline.replay(df, "k", "i", "v", "lim", nTicks = 8)
    assert(out.queryExecution.executedPlan.toString.contains("Exchange"))
    // 8 keys x (started at 4, updated at 7): order-insensitive check
    val got = out.collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.count(_._2 == "started") == 8)
  }
}
