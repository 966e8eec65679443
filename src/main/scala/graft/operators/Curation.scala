package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
