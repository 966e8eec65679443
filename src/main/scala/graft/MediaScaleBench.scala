package graft

import graft.operators.{ConnectedComponents, Curation, Dedup, Multimodal}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-bound slope for the q131 media pipeline (aHash fingerprint →
  * capped banded Hamming pairs → CC resolve → deterministic reshard),
  * which the oracled query runs over a FIXED 18-image harness corpus.
  * Here the corpus replicates: each replica r re-derives the 9 source
  * images from a replica-distinct generator seed (encodeTestImage is
  * analytic in its seed) and plants the same exact re-ingest duplicate
  * under id+100 — so every replica contributes the identical planted
  * dup structure while its PIXELS (hence aHashes) differ, and the
  * pipeline's per-stage cost can be read against corpus size.
  *
  * What the sweep is expected to show (recorded in SCALE.md):
  *  - decode+hash is embarrassingly linear (per-image ImageIO work);
  *  - the banded join is linear only while band buckets stay sparse.
  *   64-bit signatures cut into maxDist+1 = 7 bands leave ~9 bits per
  *   band value; pseudo-random hashes therefore SATURATE the ~512-value
  *   band space at a few thousand images (mean bucket > 1), after
  *   which uncapped pair candidates grow quadratically and the cap=8
  *   guard starts excluding buckets wholesale. maxDist=3 (4 bands,
  *   16 bits each, 65,536 values) pushes saturation out by two orders
  *   of magnitude — the knob a 100 TB deployment turns (tighter
  *   distance budget per banding level, or hierarchical prefilter),
  *   measured here as the control.
  *
  * args: replica counts (default: 10 100 1000; 18 images each). env
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS as the other bench mains;
  * SPARK_GRAFT_MEDIA_DIMSCALE (default 16) multiplies the generator
  * image dimensions — at the default the corpus is 128–256 × 80–240
  * px, so the 16×16-grid wide hash averages ≥40 pixels per cell and
  * its precision is measured above the ≤16×15-px thumbnail-collision
  * floor r19 measured at (SCALE.md; dimScale 1 reproduces the r19
  * thumbnail table). */
object MediaScaleBench {

  private val srcs = Seq(4L, 10L, 16L, 22L, 34L, 40L, 46L, 52L, 58L)

  /** R replicas of the q131-shaped corpus (id space r*1000+{i,
    * i+100}; replica 0 at dimScale 1 IS q131's). Payload generation
    * (not a pipeline stage) is excluded from timing via
    * localCheckpoint. */
  def corpus(s: SparkSession, replicas: Long, dimScale: Int): DataFrame = {
    import s.implicits._
    s.range(0L, replicas).as[Long]
      .flatMap { r =>
        srcs.flatMap { i =>
          val p = Multimodal.encodeTestImage(i + 61L * r, dimScale)
          Seq((r * 1000L + i, p), (r * 1000L + i + 100L, p))
        }
      }
      .toDF("img_id", "payload")
      .repartition(32)
      .localCheckpoint()
  }

  def main(args: Array[String]): Unit = {
    val scales =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(10L, 100L, 1000L)
    val dimScale = sys.env.get("SPARK_GRAFT_MEDIA_DIMSCALE")
      .flatMap(_.toIntOption).filter(s => s >= 1 && s <= 64)
      .getOrElse(16)
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

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def median(xs: Seq[Double]): Double =
      math.rint(xs.sorted.apply(xs.length / 2) * 1000) / 1000

    val rows = scales.map { r =>
      val imgs = corpus(spark, r, dimScale)
      val n = imgs.count()

      // stage 1: decode + aHash (the per-image data-bound term)
      val hashSec = median((0 to runs).map(_ =>
        timed(Multimodal.withAHash(imgs, "payload")
          .select(col("img_id"), col("ahash")).count())._1).tail)

      // band-bucket saturation diagnostic: how many (band, value)
      // buckets exceed the q131 cap (those pair only via cold bands)
      val sig = Multimodal.withAHash(imgs, "payload")
        .select(col("img_id"), col("ahash"))
        .where(col("ahash").isNotNull).localCheckpoint()
      def hotBuckets(maxDist: Int, cap: Long): Long =
        sig.select(posexplode(array(
            Dedup.bandColumns(col("ahash"), 64, maxDist): _*))
          .as(Seq("band", "bv")))
          .groupBy(col("band"), col("bv"))
          .agg(count(lit(1)).as("n")).where(col("n") > cap).count()

      // stage 2 + full pipeline: the all-pairs join (q123's contract)
      // vs the connectivity-equivalent edge set (q131's wiring since
      // hammingEdges landed), each at the q131 cap; plus the
      // maxDist=3 control (wider bands, later saturation)
      def sweep(maxDist: Int, edgesOp: Boolean)
          : (Double, Long, Double, Long) = {
        def pairs =
          if (edgesOp) Dedup.hammingEdges(
            Multimodal.withAHash(imgs, "payload"), "img_id", "ahash",
            bits = 64, maxDist = maxDist, maxBucket = Some(8L))
          else Dedup.hammingPairs(
            Multimodal.withAHash(imgs, "payload"), "img_id", "ahash",
            bits = 64, maxDist = maxDist, maxBucket = Some(8L))
        val pr = (0 to runs).map(_ => timed(pairs.count())).tail
        val (fullSecs, survivors) = (0 to runs).map { _ =>
          timed {
            val surv = ConnectedComponents.resolve(
              imgs, "img_id", pairs, "a", "b")
            Curation.shuffleShards(surv.select(col("img_id")),
              "img_id", seed = 7L, shards = 4).count()
          }
        }.tail.unzip
        (median(pr.map(_._1)), pr.head._2, median(fullSecs),
          survivors.head)
      }
      def block(tag: String, maxDist: Int, edgesOp: Boolean): String = {
        val (p, np, f, s) = sweep(maxDist, edgesOp)
        s""""$tag":{"pairs_sec":$p,"pairs":$np,"full_sec":$f,""" +
          s""""survivors":$s,"hot_buckets":${hotBuckets(maxDist, 8L)}}"""
      }

      // the WIDE (256-bit, 16×16) signature through hammingEdgesWide —
      // the entropy fix for the saturation the 64-bit rows measure;
      // ground truth: only planted exact dups should merge (replica
      // pixels differ), so survivors near images − valid planted
      // pairs is the precision reading
      def wideBlock(maxDist: Int): String = {
        def edges = Dedup.hammingEdgesWide(
          Multimodal.withAHashWide(imgs, "payload"), "img_id",
          "ahash_w", bits = 256, maxDist = maxDist,
          maxBucket = Some(8L))
        val pr = (0 to runs).map(_ => timed(edges.count())).tail
        val (fullSecs, survivors) = (0 to runs).map { _ =>
          timed {
            val surv = ConnectedComponents.resolve(
              imgs, "img_id", edges, "a", "b")
            Curation.shuffleShards(surv.select(col("img_id")),
              "img_id", seed = 7L, shards = 4).count()
          }
        }.tail.unzip
        val sig = Multimodal.withAHashWide(imgs, "payload")
          .select(col("img_id"), col("ahash_w"))
          .where(col("ahash_w").isNotNull).localCheckpoint()
        val hot = sig.select(posexplode(array(
            Dedup.bandColumnsWide(col("ahash_w"), 256, maxDist): _*))
          .as(Seq("band", "bv")))
          .groupBy(col("band"), col("bv"))
          .agg(count(lit(1)).as("n")).where(col("n") > 8L).count()
        s""""d${maxDist}_wide_edges":{"pairs_sec":${median(pr.map(_._1))},""" +
          s""""pairs":${pr.head._2},""" +
          s""""full_sec":${median(fullSecs)},""" +
          s""""survivors":${survivors.head},"hot_buckets":$hot}"""
      }

      // planted ground truth: every DECODABLE source contributes
      // exactly one exact duplicate that must drop (corrupt seeds —
      // (i+61r) % 7 == 0 — hash NULL on both copies, so both survive
      // by contract); survivors − ideal is the PRECISION reading
      // (over-merge mass), 0 = perfect
      val planted = (0L until r).map(rep =>
        srcs.count(i => (i + 61L * rep) % 7 != 0).toLong).sum
      // the VERIFIED wide pipeline (q147's composition): digest stars
      // (byte-identity) → banded pairs over digest reps → pixel-level
      // luma-grid verify → CC → reshard. The verify kills the hash's
      // ~10⁻⁵/pair near-collisions on distinct images; its ground
      // truth is ideal_survivors_byteid (byte-identical payloads ARE
      // duplicates under this contract — the generator's corrupt stub
      // is ONE payload shared by every corrupt seed, so those images
      // correctly collapse to one survivor, unlike the hash contract
      // where NULL signatures never pair)
      def verifiedBlock(maxDist: Int): String = {
        val (fullSecs, survivors) = (0 to runs).map { _ =>
          timed {
            val surv = Multimodal.perceptualDedup(imgs, "img_id",
              "payload", maxDist = maxDist, maxBucket = Some(8L),
              verifyMaxAvgDiff = Some(8L))
            Curation.shuffleShards(surv.select(col("img_id")),
              "img_id", seed = 7L, shards = 4).count()
          }
        }.tail.unzip
        s""""d${maxDist}_wide_verified":{"full_sec":${median(fullSecs)},""" +
          s""""survivors":${survivors.head}}"""
      }

      // byte-identity contract ideal: corrupt seeds all emit the SAME
      // 4-byte stub payload — 2 images per corrupt src-instance, one
      // shared digest group across ALL of them → 1 survivor
      val corruptImgs = 2L * (9L * r - planted)
      val idealByteId = (n - planted) -
        (if (corruptImgs > 0) corruptImgs - 1 else 0)
      s"""{"replicas":$r,"images":$n,"ideal_survivors":${n - planted},""" +
        s""""ideal_survivors_byteid":$idealByteId,""" +
        s""""hash_sec":$hashSec,""" +
        (Seq(block("d6_pairs", 6, edgesOp = false),
          block("d6_edges", 6, edgesOp = true),
          block("d3_pairs", 3, edgesOp = false)) :+
          wideBlock(6) :+ wideBlock(3) :+ verifiedBlock(3))
          .mkString(",") + "}"
    }
    println(s"""{"mode":"media_scale","runs":$runs,""" +
      s""""dim_scale":$dimScale,"rows":[""" +
      rows.mkString(",") + "]}")
    spark.stop()
  }
}
