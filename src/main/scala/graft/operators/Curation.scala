package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data curation operators: deterministic split assignment and
  * sequence packing — the bookkeeping a corpus pipeline runs after
  * dedup/filtering and before training.
  *
  * Both are pure column/window expressions (no UDFs, no shuffles beyond
  * the declared window), and both are deterministic functions of the
  * data so any engine reproduces them (md5 buckets, integer sums).
  */
object Curation {

  /** Stable hash bucket in [0, 100): first 4 md5 hex chars of the id
    * rendered as an integer, mod 100. Engine-independent (md5 is), and
    * independent of partitioning/row order — a doc keeps its split
    * across reshards, appends and reruns, which is the property that
    * matters for held-out sets. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100

  /** Deterministic train/val/test assignment from percentage weights
    * (must sum to 100), e.g. `Seq("train" -> 90, "val" -> 5,
    * "test" -> 5)`. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split weights must sum to 100")
    val b = hashBucket(col(idCol))
    val thresholds = splits.scanLeft(0)(_ + _._2).tail
    val cases = splits.zip(thresholds).map { case ((name, _), hi) =>
      (b < hi, name)
    }
    val splitCol = cases.tail.foldLeft(
      when(cases.head._1, cases.head._2)) {
      case (acc, (cond, name)) => acc.when(cond, name)
    }
    df.withColumn("split", splitCol)
  }

  /** Deterministic source mixing: admit each group's rows at a target
    * rate (basis points, 0..10000) — the reweighting step that
    * downsamples over-represented sources before training. A row is
    * admitted iff its stable sampling bucket < the group's rate;
    * unlisted groups use defaultBp.
    *
    * The bucket comes from md5 hex chars 5..10 (24 bits, mod 10000) —
    * disjoint from [[hashBucket]]'s chars 1..4, so admission is
    * independent of split assignment (a biased interaction between
    * sampling and held-out splits is the classic silent mixing bug).
    * Like the split, admission is a pure function of the id: stable
    * across reshards/appends/reruns, and raising a rate strictly grows
    * the sample (nested samples — a 20% sample contains the 10% one).
    * Pure column expression: no shuffle, fully pushdown-friendly. */
  def mixSample(df: DataFrame, idCol: String, groupCol: String,
                rateBp: Map[String, Long],
                defaultBp: Long = 10000L): DataFrame = {
    require(rateBp.values.forall(r => r >= 0 && r <= 10000) &&
      defaultBp >= 0 && defaultBp <= 10000, "rates are basis points")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 5, 6),
      16, 10).cast("long") % 10000
    val rate = rateBp.toSeq.sortBy(_._1)
      .foldRight(lit(defaultBp): Column) { case ((g, r), acc) =>
        when(col(groupCol) === g, lit(r)).otherwise(acc)
      }
    df.filter(bucket < rate)
  }

  /** Exactly-n-per-stratum deterministic sample: keep each stratum's n
    * smallest (md5(id), id) rows, emitting `sample_rank` (1..n).
    *
    * Properties (SketchesSpec-style oracle q100 + CurationSpec):
    *  - deterministic and order/partition independent (md5 rank);
    *  - NESTED: rank ≤ k of an n-sample IS the k-sample (shrinking an
    *    eval set keeps it a subset — same property hashBucket gives
    *    splits);
    *  - strata smaller than n keep all their rows.
    *
    * Scale shape: the naive plan sorts every stratum end-to-end for a
    * window rank. With `prune = true` (default) a hash threshold cuts
    * first: stratum sizes are a tiny broadcast aggregate, and rows with
    * hash above ~4n/s · 2⁶⁰ cannot be among the n smallest except with
    * vanishing probability (Chernoff: P < e^(−1.125·n) per stratum), so
    * the window sees ~4n rows per stratum instead of s. Losslessness is
    * not probabilistic though: strata whose surviving count falls short
    * of min(n, s) — md5 adversaries, if they existed — are re-ranked
    * UNPRUNED through the fallback union, so the result is always
    * exactly the n smallest; the oracle replays the naive rank and must
    * hash-match the pruned plan. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       n: Int, prune: Boolean = true): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    val h = Sketches.hash60(col(idCol).cast("string"))
    def rank(in: DataFrame): DataFrame = {
      val w = Window.partitionBy(col(strataCol))
        .orderBy(col("__h").asc, col(idCol).asc)
      in.withColumn("sample_rank", row_number().over(w))
        .filter(col("sample_rank") <= n)
    }
    val base = df.withColumn("__h", h)
    val out =
      if (!prune) rank(base)
      else {
        val sizes = base.groupBy(col(strataCol))
          .agg(count(lit(1)).as("__s"))
        // threshold ≈ 4n/s of the 2^60 hash space; no prune when the
        // stratum is within 4n anyway (threshold saturates)
        val thr = when(col("__s") <= 4L * n, lit(Long.MaxValue))
          .otherwise((lit(1L << 60) / col("__s")) * lit(4L * n))
        // equi-joins below drop NULL-keyed rows; a NULL stratum is
        // still a stratum in the window path, so rank it directly
        val nullStratum = base.filter(col(strataCol).isNull)
        val survivors = base
          .join(broadcast(sizes), strataCol)
          .filter(col("__h") <= thr)
        // exactness guard: a stratum must keep min(n, s) rows through
        // the prune or it re-ranks unpruned (never lossy, only slower).
        // Anchor on `sizes`, not on the survivors: a stratum whose
        // EVERY row hashed above the threshold has no survivor group
        // at all and must still be caught (coalesce its count to 0)
        val short = broadcast(sizes)
          .join(survivors.groupBy(col(strataCol))
            .agg(count(lit(1)).as("__c")), Seq(strataCol), "left")
          .filter(coalesce(col("__c"), lit(0L)) <
            least(lit(n.toLong), col("__s")))
          .select(col(strataCol))
        rank(survivors.join(broadcast(short), Seq(strataCol),
            "left_anti").drop("__s"))
          .unionByName(rank(base.join(broadcast(short), Seq(strataCol),
            "left_semi")))
          .unionByName(rank(nullStratum))
      }
    // using-joins in the pruned path reorder columns; pin the contract
    out.select((df.columns.map(col) :+ col("sample_rank")): _*)
  }

  /** Deterministic corpus shuffle + reshard — the "global shuffle"
    * every training run needs (examples must reach the data loader in
    * an order uncorrelated with collection order, reproducibly). The
    * permutation key is md5(seed:id): engine- and partitioning-
    * independent, so the same (corpus, seed) yields the same order on
    * any cluster — and changing the seed is a fresh epoch permutation.
    * Output: `shard` (md5-bucketed, balanced in expectation) and
    * `seq` (1-based position within the shard by key order). ONE
    * shuffle on shard + per-shard sort; shards bound the sort width,
    * so pick shards ≈ cluster write parallelism at 100 TB (each shard
    * sorts corpus/shards rows — never a global sort).
    *
    * The bucket draws 48 key bits (12 hex digits) before the mod: a
    * 16-bit draw had up to ~1.6% systematic imbalance for
    * non-power-of-two shard counts (2^16 mod s leftover buckets);
    * 48 bits cap that bias at s/2^48 — unmeasurable at any s. Output
    * names must be FREE in the input — silently overwriting a
    * pre-existing `shard`/`seq` column would corrupt the caller's
    * data, so that's a require. */
  def shuffleShards(df: DataFrame, idCol: String, seed: Long,
                    shards: Int): DataFrame = {
    require(shards >= 1, s"shards=$shards must be positive")
    val taken = df.columns.toSet
      .intersect(Set("shard", "seq", "__key"))
    require(taken.isEmpty,
      s"shuffleShards output columns already exist in the input: " +
        s"${taken.toSeq.sorted.mkString(", ")} — rename them first")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val shard = conv(substring(key, 1, 12), 16, 10)
      .cast(LongType) % shards
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("__key", key)
      .withColumn("shard", shard)
      .withColumn("seq", row_number().over(w).cast(LongType))
      .drop("__key")
  }

  /** Greedy sequence packing: within each group (e.g. a (lang, shard)
    * pair), walk rows in id order accumulating token counts; a row's
    * bin is `floor(preceding_cumulative / budget)` — bin b holds the
    * rows whose preceding total lies in [b·budget, (b+1)·budget), so
    * every bin except a group's last holds ≥ budget tokens and bins
    * overflow by at most one document (the streaming packer's
    * contract).
    *
    * Scale note: one window sort per group — group by (key, hash shard)
    * at corpus scale so no single group serializes; packing quality is
    * unaffected since bins never span groups. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
                    budget: Long, groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol).asc)
    df.withColumn("toks", tokensCol)
      .withColumn("__cum", sum(col("toks")).over(w))
      .withColumn("bin", expr(s"(__cum - toks) div $budget"))
      .drop("__cum")
  }
}
