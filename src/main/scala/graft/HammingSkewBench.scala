package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication control for [[Dedup.hammingPairs]]' `maxBucket` skew
  * guard (SCALE.md) — the Hamming analog of SemanticDedupBench's
  * `skew` mode: the adversarial input banding cannot fix is a BLOB of
  * identical signatures (a blank-media corpus slice — every blank
  * image aHashes to the same 64 bits), which concentrates one bucket
  * in EVERY band and makes the band join emit nBands·n²/2 candidate
  * rows no matter how the bits are banded. With `maxBucket` the blob's
  * buckets are excluded and pair work is bounded by cap² per bucket.
  *
  * The measured corpus: `n` rows holding ONE identical signature (the
  * blob) + `n/6` background rows in planted near-dup pairs — ids
  * sharing floor(id/2) get the same base signature except the low bit
  * (distance 1), so consecutive even/odd ids pair and the one or two
  * ids whose floor(id/2) partner falls outside the background range
  * stay unpaired (~n/12 pairs total; the run reports the exact
  * count). The capped run's recall on NON-degenerate pairs is then
  * observable: every planted pair survives the cap (their buckets are
  * cold), while the blob's n²/2 blank-vs-blank pairs — the least
  * informative output — are the only loss. Reports uncapped vs capped
  * wall time and output rows; uncapped cost is quadratic in the blob,
  * capped is linear.
  *
  * args: [n] (blob rows, default 10000). env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_RUNS as the other bench mains. */
object HammingSkewBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(10000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // blob: ids [1, n] all signature 0 (the blank-media hash).
    // background: ids [n+1, n+n/6] in planted pairs — consecutive ids
    // share a base signature except the low bit (distance 1), bases
    // spread over the full 64 bits so their buckets stay cold.
    val blob = spark.range(1, n + 1)
      .select(col("id"), lit(0L).as("sig"))
    val bg = spark.range(n + 1, n + n / 6 + 1)
      .select(col("id"),
        (xxhash64((col("id") / 2).cast("long")).bitwiseAND(lit(-2L)))
          .bitwiseOR(col("id") % 2).as("sig"))
    val corpus = blob.unionByName(bg).localCheckpoint()

    def once(cap: Option[Long]): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = Dedup.hammingPairs(corpus, "id", "sig", bits = 64,
        maxDist = 3, maxBucket = cap, materializeSlim = false).count()
      ((System.nanoTime() - t0) / 1e9, pairs)
    }
    val out = Seq("uncapped" -> None, "cap64" -> Some(64L)).map {
      case (name, cap) =>
        once(cap) // warmup
        val rs = (1 to runs).map(_ => once(cap))
        val med = rs.map(_._1).sorted.apply(runs / 2)
        s""""$name":{"sec":${math.rint(med * 1000) / 1000},""" +
          s""""pairs":${rs.head._2}}"""
    }
    println(s"""{"mode":"hamming_skew","blob":$n,"runs":$runs,""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
