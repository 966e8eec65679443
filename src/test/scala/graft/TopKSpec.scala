package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkTest {

  private def agg = flowDf(
    Seq("time", "key", "octets"),
    Seq(
      Seq(0L, 1L, 100L), Seq(0L, 2L, 90L), Seq(0L, 3L, 80L),
      Seq(0L, 4L, 70L), Seq(0L, 5L, 60L),
      Seq(600L, 1L, 50L), Seq(600L, 2L, 40L)))

  test("topNOthers: head rows + NULL-key residual per window " +
    "(monit-objects-fwm.c:404-481)") {
    val out = TopK.topNOthers(agg, Seq("time"), Seq("key"), Seq("octets"),
      Seq(col("octets").desc, col("key").asc), 3)
      .orderBy(col("time"), col("key").isNull.cast("int"), col("octets").desc)
      .collect()
    // window 0: top-3 (100,90,80) + others 70+60=130 with NULL key
    val w0 = out.filter(_.getLong(0) == 0L)
    assert(w0.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(1L), Some(2L), Some(3L), None))
    assert(w0.last.getLong(2) == 130L)
    // window 600: only 2 rows → no others row
    val w600 = out.filter(_.getLong(0) == 600L)
    assert(w600.length == 2 && w600.forall(!_.isNullAt(1)))
  }

  test("topNOthers global (no partition) with empty tail") {
    val out = TopK.topNOthers(agg.filter(col("time") === 600), Seq.empty,
      Seq("time", "key"), Seq("octets"), Seq(col("octets").desc), 5)
      .collect()
    assert(out.length == 2) // under the limit → no residual row
  }

  test("topNOthersGlobal ≡ topNOthers(no partition), distributed head") {
    val rnd = new scala.util.Random(7)
    // 120 keys, distinct octet values so the sort order is total
    val rows = rnd.shuffle((1L to 120L).toList).zipWithIndex.map {
      case (k, i) => Seq(k, 10000L - i * 3L)
    }
    val df = flowDf(Seq("key", "octets"), rows)
    val sort = Seq(col("octets").desc, col("key").asc)
    for (n <- Seq(1, 10, 119, 120, 500)) {
      val viaWindow = TopK.topNOthers(df, Seq.empty, Seq("key"),
        Seq("octets"), sort, n).collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toSet
      val global = TopK.topNOthersGlobal(df, Seq("octets"),
        sort, n)
      assert(global.collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toSet == viaWindow,
        s"n=$n")
      if (n == 10) {
        // the head is localCheckpoint'd inside topNOthersGlobal, so its
        // plan is sealed there — assert the shape Spark gives that
        // expression: a distributed bounded-heap take, not a sort
        val headPlan = df.orderBy(sort: _*).limit(n)
          .queryExecution.executedPlan.toString
        assert(headPlan.contains("TakeOrderedAndProject"),
          "global head must be a distributed bounded-heap take")
        assert(!global.queryExecution.executedPlan.toString
          .contains("Window"),
          "the global form must not move all rows into one window task")
      }
    }
  }

  test("topNOthersGlobal: an all-NULL tail measure yields a NULL " +
    "others measure (window-form parity); topPctCutGlobal rejects " +
    "NULL / negative measures with a clear error") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    def df(rows: Seq[(Long, java.lang.Long)]) = spark.createDataFrame(
      rows.map { case (k, v) => Row(k, v) }.asJava,
      StructType(Seq(StructField("k", LongType, false),
        StructField("v", LongType, true))))
    val nullTail = df(Seq(1L -> java.lang.Long.valueOf(5L),
      2L -> null, 3L -> null))
    val sort = Seq(col("v").desc, col("k").asc)
    val window = TopK.topNOthers(nullTail, Seq.empty, Seq("k"), Seq("v"),
      sort, 1).collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    val global = TopK.topNOthersGlobal(nullTail, Seq("v"),
      sort, 1).collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(global.toSet == window.toSet)
    assert(global.toSet == Set((Some(1L), Some(5L)), (None, None)))
    val e1 = intercept[IllegalArgumentException](
      TopK.topPctCutGlobal(nullTail, "v", 50.0, Seq(col("k").asc)))
    assert(e1.getMessage.contains("non-NULL"))
    val e2 = intercept[IllegalArgumentException](
      TopK.topPctCutGlobal(df(Seq(1L -> java.lang.Long.valueOf(-3L))),
        "v", 50.0, Seq(col("k").asc)))
    assert(e2.getMessage.contains("non-negative"))
  }

  test("topPctCutGlobal ≡ topPctCut(no partition): banded refinement, " +
    "zeros, single-band degenerate, never-reached target") {
    val rnd = new scala.util.Random(11)
    val spread = (1L to 150L).map(k =>
      Seq(k, rnd.nextInt(1 << rnd.nextInt(20)).toLong))
    val flat = (1L to 40L).map(k => Seq(k, 64L))         // one band only
    val zeros = (1L to 30L).map(k => Seq(k, if (k % 3 == 0) 0L else k))
    for ((rows, what) <- Seq((spread, "spread"), (flat, "flat"),
        (zeros, "zeros"))) {
      val df = flowDf(Seq("k", "v"), rows)
      for (pct <- Seq(0.0, 10.0, 50.0, 90.0, 99.9, 100.0, 150.0)) {
        val exact = TopK.topPctCut(df, Seq.empty, "v", pct,
          Seq(col("k").asc)).select("k")
          .collect().map(_.getLong(0)).toSet
        val banded = TopK.topPctCutGlobal(df, "v", pct, Seq(col("k").asc))
          .select("k").collect().map(_.getLong(0)).toSet
        assert(banded == exact, s"$what pct=$pct")
      }
    }
  }

  test("topPctCutGlobal ≡ topPctCut on randomized heavy-tailed data " +
    "with huge magnitudes and random pcts (band-edge fuzz)") {
    val rnd = new scala.util.Random(1729)
    for (trial <- 1 to 5) {
      // heavy-tailed: magnitudes spanning 2^0 .. 2^40, duplicates
      // common (ties exercise the tieBreak across the band boundary)
      val rows = (1L to 80L).map { k =>
        val mag = rnd.nextInt(41)
        Seq(k, (1L << mag) + rnd.nextInt(3).toLong - 1L)
      }
      val df = flowDf(Seq("k", "v"), rows)
      val pct = rnd.nextDouble() * 120.0
      val exact = TopK.topPctCut(df, Seq.empty, "v", pct,
        Seq(col("k").asc)).select("k")
        .collect().map(_.getLong(0)).toSet
      val banded = TopK.topPctCutGlobal(df, "v", pct, Seq(col("k").asc))
        .select("k").collect().map(_.getLong(0)).toSet
      assert(banded == exact, s"trial=$trial pct=$pct")
    }
  }

  test("topPctCut keeps rows until cumulative reaches pct " +
    "(classification.c:524-619)") {
    val df = flowDf(Seq("k", "v"),
      Seq(Seq(1L, 50L), Seq(2L, 30L), Seq(3L, 15L), Seq(4L, 5L)))
    // total=100; 90%: cum-excl 0,50,80,95 → keep k=1,2,3
    val out = TopK.topPctCut(df, Seq.empty, "v", 90.0, Seq(col("k").asc))
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L))
    // 50%: cum-excl 0,50 → keep only k=1 (50 < 50 is false for k=2)
    val out50 = TopK.topPctCut(df, Seq.empty, "v", 50.0, Seq(col("k").asc))
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(out50 == Seq(1L))
  }
}

/** FIXTURES.md §4 golden: {"fields": ["octets desc","src host"],
  * "limit": 5, "time": 10} → per 10s window top-5 + NULL-key others
  * (STEP-BY-STEP.md:383-402, monit-objects-fwm.c:404-481). */
class FwmGoldenSpec extends SparkTest {
  test("fwm golden: top-5 by octets + others row per 10s window") {
    import graft.filter.FilterEnv
    import graft.operators.Fwm
    import org.apache.spark.sql.functions.col
    // 7 hosts in window [0,10), 2 in window [10,20)
    val rows = (1 to 7).map(h =>
      Seq(3L, 167772160L + h, 1000L * (8 - h), 1L)) ++
      Seq(Seq(12L, 167772161L, 50L, 1L), Seq(13L, 167772162L, 40L, 1L))
    val flows = flowDf(
      Seq("ts_sec", "ip4_src_addr", "in_bytes", "sampling_rate"), rows)
    val env = FilterEnv.flow(spark)
    val out = Fwm.batch(flows, env,
      Fwm.Conf("by_src", Seq("octets desc", "src host"),
        timeSec = 10, limit = Some(5)),
      samplingRate = Some(col("sampling_rate"))).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2)))
    val w0 = out.filter(_._1 == 0L)
    // top-5: hosts 1..5 with 7000..3000, then others = 2000+1000
    assert(w0.take(5).map(_._3).toSeq ==
      Seq(7000L, 6000L, 5000L, 4000L, 3000L))
    assert(w0.take(5).forall(_._2.isDefined))
    assert(w0.last == ((0L, None, 3000L))) // NULL-key residual
    assert(w0.length == 6)
    // window [10,20): under the limit → no others row
    val w10 = out.filter(_._1 == 10L)
    assert(w10.length == 2 && w10.forall(_._2.isDefined))
  }
}
