package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTest {

  private def values(n: Int, distinct: Int) = flowDf(
    Seq("grp", "v"),
    (0 until n).map(i => Seq((i % 2).toLong, (i % distinct).toLong)))

  // ------------------------------------------------------------------ HLL

  test("hllRegisters: at most m rows per key, rho in [1, W+1]") {
    val p = 6
    val regs = Sketches.hllRegisters(values(5000, 1200), Seq("grp"), "v", p)
      .collect()
    val m = 1 << p
    assert(regs.length <= 2 * m)
    assert(regs.forall { r =>
      val reg = r.getLong(1); val rho = r.getInt(2)
      reg >= 0 && reg < m && rho >= 1 && rho <= 60 - p + 1
    })
  }

  test("hllEstimate: within 3σ of the true cardinality (σ=1.04/√m)") {
    val p = 8 // m=256 → σ ≈ 6.5%
    for (distinct <- Seq(500, 2000, 10000)) {
      val df = values(distinct * 2, distinct) // every value seen twice
      val est = Sketches.hllEstimate(df, Seq.empty, "v", p)
        .collect()(0).getDouble(1)
      val err = math.abs(est - distinct) / distinct
      assert(err < 3 * 1.04 / math.sqrt(1 << p),
        s"distinct=$distinct est=$est err=$err")
    }
  }

  test("hllEstimate: duplicate-insensitive and deterministic") {
    val p = 8
    val once = values(1000, 1000)
    val thrice = values(3000, 1000)
    val a = Sketches.hllEstimate(once, Seq.empty, "v", p).collect()(0)
    val b = Sketches.hllEstimate(thrice, Seq.empty, "v", p).collect()(0)
    assert(a.getDouble(1) == b.getDouble(1)) // bit-identical
    assert(a.getLong(0) == b.getLong(0))
  }

  test("hllEstimate per key matches per-key global runs") {
    val p = 5
    val df = values(4000, 700)
    val byKey = Sketches.hllEstimate(df, Seq("grp"), "v", p)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for (g <- Seq(0L, 1L)) {
      val solo = Sketches.hllEstimate(
        df.filter(col("grp") === g), Seq.empty, "v", p)
        .collect()(0).getDouble(1)
      assert(byKey(g) == solo)
    }
  }

  test("hllEstimateCorrected: linear counting fixes the small range, " +
    "leaves the large range raw") {
    val p = 8 // m=256; raw HLL is known-biased below ~2.5m = 640
    val m = 1 << p
    // small range: n ≪ m — the corrected estimate must beat raw
    for (distinct <- Seq(5, 40, 120)) {
      val r = Sketches.hllEstimateCorrected(
        values(distinct * 2, distinct), Seq.empty, "v", p).collect()(0)
      val (nObs, est, corr) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
      assert(nObs < m && est <= 2.5 * m) // the branch actually took
      // ~1 ulp tolerance: Catalyst's ln and the JVM's may differ in
      // the last bit — the very reason the corrected column is outside
      // the bit-exact oracle contract
      val model = m * math.log(m.toDouble / (m - nObs))
      assert(math.abs(corr - model) <= math.abs(model) * 1e-12)
      val errCorr = math.abs(corr - distinct) / distinct
      assert(errCorr < 0.15, s"distinct=$distinct corr=$corr")
      assert(errCorr <= math.abs(est - distinct) / distinct + 1e-9,
        s"correction must not be worse than raw: $est vs $corr")
    }
    // large range: past the crossover the raw estimate passes through
    val big = Sketches.hllEstimateCorrected(
      values(20000, 10000), Seq.empty, "v", p).collect()(0)
    assert(big.getDouble(2) == big.getDouble(1))
  }

  test("hllCorrect: saturated registers (n_obs = m) pass raw through") {
    // est below crossover but zero empty registers → ln(m/0) undefined;
    // the n_obs < m guard must keep the raw estimate
    val df = flowDf(Seq("n_obs", "est"), Seq(Seq(16L, 10L)))
    val out = df.select(Sketches.hllCorrect(
      col("n_obs"), col("est").cast("double"), 4).as("c")).collect()(0)
    assert(out.getDouble(0) == 10.0)
  }

  // ------------------------------------------------------------ Count-Min

  test("cmsSketch: bounded size; total mass = input weight per row j") {
    val df = values(3000, 40)
    val sk = Sketches.cmsSketch(df, "v", 4, 64).collect()
    assert(sk.length <= 4 * 64)
    val mass = sk.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert((0 until 4).forall(j => mass(j) == 3000L))
  }

  test("cmsEstimate: never under-counts; exact when width is ample") {
    val df = values(3000, 40) // 40 distinct keys, 75 hits each
    val cands = df.select(col("v")).distinct()
    val est = Sketches.cmsEstimate(
      Sketches.cmsSketch(df, "v", 4, 4096), cands, "v", 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.size == 40 && est.values.forall(_ >= 75L))
    // 40 keys into 4×4096 cells: overwhelmingly collision-free
    assert(est.values.count(_ == 75L) >= 38)
  }

  test("cmsEstimate: unseen candidate estimates 0 or collision mass") {
    val df = values(100, 10)
    val cands = flowDf(Seq("v"), Seq(Seq(999L)))
    val est = Sketches.cmsEstimate(
      Sketches.cmsSketch(df, "v", 4, 4096), cands, "v", 4, 4096)
      .collect()(0).getLong(1)
    assert(est >= 0L && est <= 100L)
  }

  test("cmsHeavyHitters: finds exactly the heavy keys (ample width)") {
    // key 0 appears 600×, keys 1..20 appear 20× each
    val rows = (0 until 600).map(_ => Seq(0L, 0L)) ++
      (1 to 20).flatMap(k => (0 until 20).map(_ => Seq(0L, k.toLong)))
    val df = flowDf(Seq("grp", "v"), rows)
    val cands = df.select(col("v")).distinct()
    val hh = Sketches.cmsHeavyHitters(df, "v", 4, 4096, 100L, cands)
      .collect()
    assert(hh.map(_.getLong(0)).toSeq == Seq(0L))
    assert(hh(0).getLong(1) == 600L)
  }

  test("cms weighted: estimates sum the weight column") {
    val df = values(200, 4).withColumn("wt", col("v") + 1)
    val cands = df.select(col("v")).distinct()
    val est = Sketches.cmsEstimate(
      Sketches.cmsSketch(df, "v", 4, 4096, weight = col("wt")),
      cands, "v", 4, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 50 rows per value, weight v+1
    assert((0 to 3).forall(v => est(v.toLong) == 50L * (v + 1)))
  }

  // ------------------------------------------------------- exact quantiles

  test("quantilesByValue matches sort-based order statistics") {
    val rnd = new scala.util.Random(11)
    val raw = (0 until 2001).map(_ => rnd.nextInt(300).toLong)
    val df = flowDf(Seq("grp", "v"), raw.map(v => Seq(0L, v)))
    val bps = Seq(0, 2500, 5000, 9500, 10000)
    val got = Sketches.quantilesByValue(df, Seq("grp"), "v", bps)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val sorted = raw.sorted
    for (bp <- bps) {
      val k = bp.toLong * (sorted.length - 1) / 10000 // 0-based index
      assert(got(bp.toLong) == sorted(k.toInt), s"bp=$bp")
    }
  }

  test("quantilesByValue: per-key partitions are independent") {
    val df = flowDf(Seq("grp", "v"),
      (1L to 9L).map(v => Seq(0L, v)) ++ (1L to 5L).map(v => Seq(1L, v * 10)))
    val got = Sketches.quantilesByValue(df, Seq("grp"), "v", Seq(5000))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 5000L)) == 5L)  // median of 1..9
    assert(got((1L, 5000L)) == 30L) // median of 10,20,30,40,50
  }

  test("quantilesByValue: global (no key) form") {
    val df = flowDf(Seq("v"), (1L to 100L).map(v => Seq(v)))
    val got = Sketches.quantilesByValue(df, Seq.empty, "v", Seq(9900))
      .collect()
    assert(got.length == 1 && got(0).getLong(1) == 99L)
  }

  test("NULL values contribute to neither the HLL estimate nor quantiles") {
    // flowDf columns are nullable; null slots encode as NULL
    val rows: Seq[Seq[Long]] =
      (1L to 50L).map(v => Seq(0L, v)) :+ Seq(0L, -1L)
    val df = flowDf(Seq("k", "v"), rows)
      .withColumn("v", when(col("v") === -1L, lit(null)).otherwise(col("v")))
    val clean = flowDf(Seq("k", "v"), (1L to 50L).map(v => Seq(0L, v)))
    // HLL: the null row must change nothing (countDistinct semantics);
    // unfiltered it poisoned the whole key's fold to NULL
    val a = Sketches.hllEstimate(df, Seq("k"), "v", 6)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = Sketches.hllEstimate(clean, Seq("k"), "v", 6)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b && a.head._1 > 0)
    // quantiles: the null row is not part of the population (and would
    // otherwise shift every cumulative count under Spark's NULLS FIRST)
    val qa = Sketches.quantilesByValue(df, Seq("k"), "v", Seq(0, 10000))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(qa == Map(0L -> 1L, 10000L -> 50L))
  }

  test("cmsEstimate tolerates candidate columns named j/c/cnt") {
    val df = flowDf(Seq("v"), (1L to 30L).map(v => Seq(v % 3)))
    val sk = Sketches.cmsSketch(df, "v", 2, 64)
    val cands = df.distinct()
      .withColumn("cnt", lit(7L)) // collides with the sketch schema
    val est = Sketches.cmsEstimate(sk, cands, "v", 2, 64)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(est == Map(0L -> 10L, 1L -> 10L, 2L -> 10L))
  }
}
