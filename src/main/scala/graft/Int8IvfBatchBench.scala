package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
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
    spark.stop()
  }
}
