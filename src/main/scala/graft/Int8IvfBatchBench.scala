package graft

import graft.operators.Similarity
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Batched persisted-int8-IVF search (q135's
  * [[Similarity.searchInt8IvfIndexBatch]]) vs the per-query
  * [[Similarity.searchInt8IvfIndex]] driver loop, at panel sizes
  * {5, 50} — the measurement VERDICT r18 asked for alongside the
  * operator. The loop pays one driver round-trip + one probe collect
  * + one job per query (linear in panel size by construction); the
  * batch is ONE plan whose probe collect is bounded by |centroids|
  * and whose only panel-size-dependent term is the (q_id, cid)
  * broadcast and the per-(q_id, id) partial dots. Results are
  * bit-equal (IvfLifecycleSpec); this main measures the wall. */
object Int8IvfBatchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint()
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 16, iters = 2).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("i8ivfbb").toFile
    dir.deleteOnExit()
    Similarity.buildInt8IvfIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", dir.getAbsolutePath)

    def median(xs: Seq[Double]): Double =
      math.rint(xs.sorted.apply(xs.length / 2) * 1000) / 1000
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rows = Seq(5L, 50L).map { panel =>
      val q = emb.filter(col("vec_id") < panel).localCheckpoint()
      def batch(): Unit = {
        Similarity.searchInt8IvfIndexBatch(spark, dir.getAbsolutePath,
          q, "vec_id", "embedding", nprobe = 4, k = 10).count(); ()
      }
      def loop(): Unit =
        (0L until panel).foreach { id =>
          Similarity.searchInt8IvfIndex(spark, dir.getAbsolutePath,
            emb.filter(col("vec_id") === id), "embedding",
            nprobe = 4, k = 10).count(); ()
        }
      batch(); loop() // codegen warm
      val b = median((1 to runs).map(_ => timed(batch())))
      val l = median((1 to runs).map(_ => timed(loop())))
      s"""{"panel":$panel,"batch_sec":$b,"loop_sec":$l}"""
    }
    println(s"""{"mode":"int8_ivf_batch","sf":"$sfDir","nprobe":4,""" +
      s""""k":10,"runs":$runs,"rows":[${rows.mkString(",")}]}""")

    // ---- the PROBE-STAGE wall: flat vs two-level at many centroids.
    // The flat batch form scores |panel|·|centroids| (query, centroid)
    // cosines before its window cut. Two honest findings shape this
    // bench: (1) WindowGroupLimit + the centroid broadcast make that
    // stage COMPUTE-bound map-side (top-nprobe collapses per map
    // partition before the shuffle), so the wall is the dot-product
    // count, not shuffled rows — it only dominates once
    // |panel|·|centroids| reaches ~10⁸; (2) on UNSTRUCTURED (uniform
    // random) vectors coarse cells carry no information and two-level
    // agreement collapses — IVF's own worst case, one level up. So
    // the bench uses CLUSTERED vectors (64 true centers + jitter, the
    // shape real embeddings have) and a 16,384-centroid index:
    // flat scores 8192·16384 ≈ 1.3·10⁸ pairs; two-level scores
    // 8192·64 cells + ~8192·8·256 in-cell candidates (~8× fewer).
    // `agree` = fraction of flat top-k pairs the two-level search
    // also returns (the probe-approximation cost, measured).
    def center(cNum: Column, j: Int) =
      (pmod(hash(cNum * 7919 + lit(j * 104729)), lit(1000))
        .cast("double") / 500.0) - 1.0
    def synthClustered(n: Long, base: Long, jitter: Double) =
      spark.range(n).select(col("id") + base as "vec_id",
        array((0 until 64).map(j =>
          (center(col("id") % 64, j) + lit(jitter) *
            ((pmod(hash(col("id") * 31 + lit(j * 1000003 + base)),
              lit(1000)).cast("double") / 500.0) - 1.0))
            .cast("float")): _*).as("embedding"))
    val corpus2 = synthClustered(20000, 1000000, 0.15).localCheckpoint()
    val cents2 = synthClustered(16384, 2000000, 0.15)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .localCheckpoint()
    val coarse2 = synthClustered(64, 0, 0.0) // the true centers
      .select(col("vec_id").as("gid"), col("embedding").as("gv"))
      .localCheckpoint()
    val panel2 = synthClustered(8192, 4000000, 0.15).localCheckpoint()
    val dir2 = java.nio.file.Files.createTempDirectory("i8tlb").toFile
    dir2.deleteOnExit()
    Similarity.buildInt8IvfIndex(corpus2, "vec_id", "embedding",
      cents2, "cid", "cv", dir2.getAbsolutePath)
    Similarity.addCoarseLevel(spark, dir2.getAbsolutePath, coarse2,
      "gid", "gv")
    def flat2() = Similarity.searchInt8IvfIndexBatch(spark,
      dir2.getAbsolutePath, panel2, "vec_id", "embedding",
      nprobe = 4, k = 10)
    def two2() = Similarity.searchInt8IvfIndexBatchTwoLevel(spark,
      dir2.getAbsolutePath, panel2, "vec_id", "embedding",
      nprobeCoarse = 8, nprobe = 4, k = 10)
    flat2().count(); two2().count() // warm
    val fb = median((1 to runs).map(_ => timed { flat2().count(); () }))
    val tb = median((1 to runs).map(_ => timed { two2().count(); () }))
    val flatSet = flat2().select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoSet = two2().select("q_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = math.rint(10000.0 * (flatSet & twoSet).size /
      flatSet.size) / 10000
    println(s"""{"mode":"int8_ivf_two_level_probe","centroids":16384,""" +
      s""""coarse":64,"panel":8192,"nprobe_coarse":8,"nprobe":4,""" +
      s""""k":10,"runs":$runs,"flat_sec":$fb,"two_level_sec":$tb,""" +
      s""""agree":$agree}""")
    spark.stop()
  }
}
