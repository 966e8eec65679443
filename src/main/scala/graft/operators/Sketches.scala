package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-memory sketches: the 100 TB-scale substitutes for exact
  * DISTINCT counting, exact frequency tables and exact global sorts.
  *
  * The reference computes these exactly because a single collector sees
  * a bounded window (DISTINCT fields in fwm keys, monit-objects-fwm.c;
  * the `mfreq` most-frequent-value attribute, filter.c); at cluster
  * scale the exact forms shuffle the full key cardinality. Each sketch
  * here reduces that to a fixed-size state with map-side combine:
  *
  *  - [[hllRegisters]]/[[hllEstimate]]: HyperLogLog (Flajolet et al.,
  *    AofA 2007) — distinct cardinality in m = 2^p registers; shuffle
  *    is ≤ keys·m rows regardless of input.
  *  - [[cmsSketch]]/[[cmsEstimate]]: Count-Min (Cormode & Muthukrishnan,
  *    J.Alg 2005) — frequency over-estimates in a d×w integer grid;
  *    heavy hitters without a full groupBy over the raw keys.
  *  - [[quantilesByValue]]: exact discrete quantiles via the distinct
  *    VALUE DOMAIN — the window runs over distinct values, never rows,
  *    so percentile-of-length style queries stay distributed.
  *
  * DETERMINISM (the oracle contract of Queries.scala): every hash is
  * md5-derived with literal salts, every sum is either pure integer or
  * a canonically-ordered left-fold of exact doubles, so DuckDB replays
  * the sketch bit-for-bit — the estimates themselves are asserted, not
  * just their error bounds.
  */
object Sketches {

  /** 60-bit nonnegative hash: the md5 15-hex-digit prefix. Mirrors the
    * DuckDB replay `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    * THE shared load-bearing hash of the oracle contract — Dedup's
    * SimHash tokens and Curation's stratified ranks use this same
    * definition, so a change here must move the replay idiom in every
    * oracle in lockstep. */
  private[graft] def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  // ------------------------------------------------------------------ HLL

  /** HLL alpha_m bias constant (the published table; single source of
    * truth for the oracle SQL literal too). */
  def hllAlpha(p: Int): Double = {
    val m = 1 << p
    m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
  }

  /** Row-level register assignment: (reg, rho) column pair for one
    * value — the shared derivation of the batch [[hllRegisters]] and
    * the streaming [[graft.streaming.StreamingSketch]] (identical
    * columns on both paths, so batch/stream equivalence is by
    * construction, not by re-implementation).
    *
    * The 60-bit hash splits into p register-index bits (`reg = h % m`)
    * and W = 60−p payload bits; `rho` = leading zeros of the payload
    * within its W-bit field, plus one (1..W+1). */
  private[graft] def hllRegRho(value: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val bigW = 60 - p
    val h = hash60(value.cast("string"))
    val w = shiftright(h, p) // h >= 0: exact floor(h / 2^p)
    val rho = when(w === 0L, lit(bigW + 1))
      .otherwise(lit(bigW + 1) - length(bin(w)))
    (h % (1L << p), rho)
  }

  /** Per-(key, register) max run length: `keyCols* + (reg, rho)`.
    *
    * The groupBy is the ENTIRE shuffle: partial max aggregation
    * combines map-side, and at most keys·m rows cross the wire however
    * large the input is. */
  def hllRegisters(df: DataFrame, keyCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(!keyCols.exists(Set("reg", "rho")),
      s"keyCols collide with the output columns: $keyCols")
    val (reg, rho) = hllRegRho(col(valueCol), p)
    // a NULL value must contribute no register (countDistinct ignores
    // NULLs); unfiltered, md5(NULL)'s NULL rho would poison the whole
    // key's estimate fold downstream
    df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+ reg.as("reg") :+ rho.as("rho")): _*)
      .groupBy((keyCols.map(col) :+ col("reg")): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** HLL raw estimate per key: `keyCols* + (n_obs, est)`.
    *
    * est = alpha_m · m² / (Σ_observed 2^−rho + (m − n_obs)); the
    * observed terms are folded in register order (sort_array over the
    * (reg, rho) structs), each term an EXACT double (1/2^rho, rho ≤ 57),
    * so the result is bit-reproducible by any engine folding the same
    * order. No small/large-range correction here: ln() is
    * transcendental and engine-dependent — callers that want the
    * linear-counting correction apply it on (n_obs, est) driver-side. */
  def hllEstimate(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  p: Int): DataFrame =
    estimateFromRegisters(hllRegisters(df, keyCols, valueCol, p),
      keyCols, p)

  /** The estimate over an already-built register frame
    * (`keyCols* + (reg, rho)`, one row per observed register) — split
    * out so the streaming path can estimate over merged state. */
  def estimateFromRegisters(regs: DataFrame, keyCols: Seq[String],
                            p: Int): DataFrame = {
    require(!keyCols.exists(Set("arr", "n_obs", "est")),
      s"keyCols collide with internal columns: $keyCols")
    val m = 1 << p
    val alpha = hllAlpha(p)
    val m2 = m.toDouble * m.toDouble
    val arr = sort_array(collect_list(struct(col("reg"), col("rho"))))
    val grouped =
      if (keyCols.isEmpty) regs.agg(arr.as("arr"))
      else regs.groupBy(keyCols.map(col): _*).agg(arr.as("arr"))
    grouped.select(
      (keyCols.map(col) :+
        size(col("arr")).cast(LongType).as("n_obs") :+
        expr(
          s"""CAST($alpha AS DOUBLE) * CAST($m2 AS DOUBLE) /
              (aggregate(arr, CAST(0 AS DOUBLE), (acc, x) ->
                 acc + CAST(1 AS DOUBLE) /
                       CAST(shiftleft(CAST(1 AS BIGINT), x.rho) AS DOUBLE))
               + CAST($m - size(arr) AS DOUBLE))""").as("est")): _*)
  }

  /** Small-range (linear-counting) correction over a raw estimate —
    * the published estimator's other branch: when the raw estimate
    * falls below the 2.5·m crossover and empty registers remain,
    * cardinality is better estimated by m·ln(m / V) with V = the
    * count of EMPTY registers (Flajolet et al. §4; V = m − n_obs
    * here). Packaged as a column over (n_obs, est) so production
    * callers get the corrected estimator without re-deriving the
    * branch, while [[hllEstimate]]'s raw value stays the bit-exact
    * oracle contract (ln is transcendental — engine-dependent in its
    * last bits, so the corrected column is deliberately NOT part of
    * the DuckDB hash compare). */
  def hllCorrect(nObs: Column, est: Column, p: Int): Column = {
    val m = (1 << p).toDouble
    when(est <= lit(2.5 * m) && nObs < (1 << p),
        lit(m) * log(lit(m) / (lit(m) - nObs.cast("double"))))
      .otherwise(est)
  }

  /** [[hllEstimate]] plus the corrected estimator:
    * `keyCols* + (n_obs, est, est_corrected)`. */
  def hllEstimateCorrected(df: DataFrame, keyCols: Seq[String],
                           valueCol: String, p: Int): DataFrame =
    hllEstimate(df, keyCols, valueCol, p)
      .withColumn("est_corrected",
        hllCorrect(col("n_obs"), col("est"), p))

  // ------------------------------------------------------------ Count-Min

  /** Row-j cell index for a value — Kirsch–Mitzenmacher: ONE md5 per
    * value, rows derived as (h1 + j·h2) mod width from two 40-bit
    * digest slices (h2 forced odd for a full-period stride), the same
    * k-from-2 construction as the Bloom probe
    * ([[Contamination.bloomContamination]]). All per-j cells of one
    * value share the digest subexpression, so codegen CSE computes the
    * md5 once per row however many rows deep the sketch is (the old
    * md5("j|v") form paid one digest per (j, value)).
    * h1 + 7·h2 < 2^44 — exact in BIGINT in both engines. */
  private[graft] def cmsCell(v: Column, j: Int, width: Int): Column = {
    val h1 = conv(substring(md5(v), 1, 10), 16, 10).cast(LongType)
    val h2 = conv(substring(md5(v), 11, 10), 16, 10)
      .cast(LongType) * 2 + 1
    pmod(h1 + lit(j.toLong) * h2, lit(width.toLong))
  }

  /** Count-Min sketch: `(j, c, cnt)`, at most depth·width rows.
    *
    * One explode (depth struct cells per row) then a single integer
    * groupBy-sum — map-side combine collapses each partition to the
    * d·w grid before the shuffle, so the wire cost is constant in the
    * input size. `weight` defaults to 1 per row (counts). */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int, width: Int,
                weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth=$depth out of [1,8]")
    require(width >= 16, s"width=$width too small")
    val v = col(valueCol).cast("string")
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("j"), cmsCell(v, j, width).as("c"))): _*)
    df.select(explode(cells).as("cell"), weight.cast(LongType).as("w"))
      .groupBy(col("cell.j").as("j"), col("cell.c").as("c"))
      .agg(sum(col("w")).as("cnt"))
  }

  /** Point estimates for a candidate set: `candidates* + est` where
    * est = min_j sketch[j][h_j(v)] (the classic CMS over-estimate;
    * 0 for values the sketch never saw).
    *
    * The sketch (≤ d·w rows) is broadcast, so estimating any number of
    * candidates is a narrow map-side join — THE point of the structure:
    * frequency answers at 100 TB without re-scanning or re-shuffling
    * the raw data. */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  valueCol: String, depth: Int, width: Int): DataFrame = {
    require(!candidates.columns.exists(Set("cell", "est")),
      "candidate columns collide with the internal/output names " +
        s"cell/est: ${candidates.columns.toSeq}")
    val v = col(valueCol).cast("string")
    val cells = array((0 until depth).map(j =>
      struct(lit(j).as("j"), cmsCell(v, j, width).as("c"))): _*)
    val keyCols = candidates.columns.map(col).toSeq
    // rename the sketch side before joining: a candidate column named
    // j/c/cnt would otherwise make the post-join references ambiguous
    val sk = sketch.select(col("j").as("__skj"), col("c").as("__skc"),
      col("cnt").as("__skcnt"))
    candidates
      .select((keyCols :+ explode(cells).as("cell")): _*)
      .join(broadcast(sk),
        col("cell.j") === col("__skj") && col("cell.c") === col("__skc"),
        "left")
      .groupBy(keyCols: _*)
      .agg(min(coalesce(col("__skcnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters: candidates whose CMS estimate meets `threshold`.
    * Guaranteed superset of the true heavy hitters (CMS never
    * under-counts); `candidates` bounds the answer domain (a bounded
    * dimension like ports, or an externally-sampled key list). */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, depth: Int,
                      width: Int, threshold: Long,
                      candidates: DataFrame,
                      weight: Column = lit(1L)): DataFrame = {
    val sk = cmsSketch(df, valueCol, depth, width, weight)
    cmsEstimate(sk, candidates, valueCol, depth, width)
      .filter(col("est") >= threshold)
  }

  // ------------------------------------------------------- exact quantiles

  /** Exact discrete quantiles over the VALUE DOMAIN: one row per
    * (key, bp) with the bp/10000-quantile of `valueCol`.
    *
    * k-th order statistic with k = ⌊bp·(n−1)/10000⌋ + 1 (bp 0 → min,
    * 10000 → max, 5000 on odd n → the middle element) — pure integer
    * arithmetic, so the DuckDB replay is exact.
    *
    * Scale shape: groupBy(value) first, so the window's cumulative sum
    * runs over DISTINCT values per key — never over raw rows. Right for
    * bounded/low-cardinality domains (lengths, ports, scores); for
    * unbounded real domains, pre-bucket the value to a fixed resolution
    * before calling (the quantile is then exact at that resolution). */
  def quantilesByValue(df: DataFrame, keyCols: Seq[String],
                       valueCol: String, bps: Seq[Int]): DataFrame = {
    require(bps.nonEmpty && bps.forall(b => b >= 0 && b <= 10000),
      s"bps must be in [0,10000]: $bps")
    require(!(keyCols :+ valueCol).exists(Set("bp", "q_value")),
      s"keyCols/valueCol collide with the output columns: " +
        s"$keyCols/$valueCol")
    // NULL values are not part of any quantile population (and Spark's
    // NULLS-FIRST vs DuckDB's NULLS-LAST default would silently shift
    // every cumulative count if they were let through)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy((keyCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOrd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(valueCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__total", sum(col("__cnt")).over(wAll))
      .withColumn("bp", explode(array(bps.map(b => lit(b.toLong)): _*)))
      .withColumn("__k", expr("((bp * (__total - 1)) DIV 10000) + 1"))
    cum.filter(col("__cum") >= col("__k"))
      .groupBy((keyCols.map(col) :+ col("bp")): _*)
      .agg(min(col(valueCol)).as("q_value"))
  }
}
