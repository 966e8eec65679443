package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall + wall-time comparison of the int8 IVF index (q130's
  * [[Similarity.int8IvfTopK]]) against the f32 IVF search (q43/q58's
  * [[Similarity.ivfTopK]]) at matched nprobe, on the sf1.0 replica set
  * (SCALE.md). Ground truth per query is the exact f32 cosine top-10
  * over the whole corpus, so both curves carry their full end-to-end
  * error: pruning loss (shared) + quantization loss (int8 only). The
  * index-size column is the point of the trade — the int8 lists hold
  * dim bytes/vector vs f32's 4·dim — and the recall column shows what
  * that 4× buys back. Centroids come from the integer-exact k-means
  * trainer (the q58 composition), queries are a fixed panel, so every
  * number is a deterministic constant of the dataset. */
object Int8IvfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_sf1.0")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (dim, topK) = (64, 10)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint() // one scan; the bench times search, not IO
    val n = emb.count()
    // default panel targets the sf1.0 replica set; pass explicit query
    // ids to run over a different corpus (e.g. the REAL testdata
    // embeddings — clustered, not uniform — where cluster margins are
    // thin and quantization loss would actually show)
    val queries =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(0L, 7L, 42L, 1048576L + 3L, 2097152L + 11L)
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 16, iters = 2).localCheckpoint()

    def truthFor(qId: Long): Set[Long] =
      Similarity.topK(emb.filter(col("vec_id") =!= qId), "vec_id",
          "embedding", emb.filter(col("vec_id") === qId), "embedding",
          topK)
        .collect().map(_.getLong(0)).toSet
    val truth = queries.map(q => q -> truthFor(q)).toMap

    // the deployment shape: the int8 index is BUILT ONCE (a persisted
    // parquet artifact in production — q73's pattern), searches touch
    // only the index; exclude-self is handled post-search so the
    // index is truly query-independent
    val index = Similarity.int8IvfIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv").localCheckpoint()

    def run(int8: Boolean, np: Int): (Double, Double) = {
      def once(): (Double, Int) = {
        val t0 = System.nanoTime()
        val hits = queries.map { qId =>
          val qf = emb.filter(col("vec_id") === qId)
          val got =
            (if (int8)
              Similarity.int8IvfSearch(index, "vec_id",
                cents, "cid", "cv", np, qf, "embedding", topK + 1)
            else
              Similarity.ivfTopK(
                emb.filter(col("vec_id") =!= qId), "vec_id",
                "embedding", cents, "cid", "cv", np, qf, "embedding",
                topK))
            .collect().map(_.getLong(0)).filter(_ != qId).take(topK)
            .toSet
          (got & truth(qId)).size
        }.sum
        ((System.nanoTime() - t0) / 1e9, hits)
      }
      once() // warmup (codegen for this plan shape)
      val rs = (1 to 3).map(_ => once())
      val med = rs.map(_._1).sorted.apply(1)
      val recall = math.rint(
        rs.head._2.toDouble / (queries.size * topK) * 1000) / 1000
      (recall, math.rint(med * 1000) / 1000)
    }

    // the standard compensation for quantization-rank inversions at
    // thin cluster margins: OVER-FETCH with the integer dot (3k+1
    // candidates), then exact f32 re-rank of just that short list —
    // the re-rank touches ≤ 3k+1 rows, so its cost is independent of
    // corpus size. Since r20 this runs THROUGH THE OPERATOR OPTION
    // ([[Similarity.Refine]] on IvfLifecycle.search — r19 directive
    // #3) over the persisted artifact, not a hand-built re-join, so
    // the recorded recall is the API's, with the self-hit absorbed by
    // requesting k+1 and dropping the query id post-search (the same
    // exclude-self convention as the int8 run above).
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_i8ivf_bench").toFile
    idxDir.deleteOnExit()
    Similarity.buildInt8IvfIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", idxDir.getAbsolutePath)
    def rerankRecall(np: Int): Double = {
      val hits = queries.map { qId =>
        val got = Similarity.IvfLifecycle.search(Similarity.IvfInt8,
            spark, idxDir.getAbsolutePath,
            emb.filter(col("vec_id") === qId), "embedding",
            nprobe = np, k = topK + 1,
            refine = Some(Similarity.Refine(overfetch = 3 * topK + 1,
              vectors = Some((emb, "vec_id", "embedding")))))
          .collect().map(_.getLong(0)).filter(_ != qId).take(topK)
          .toSet
        (got & truth(qId)).size
      }.sum
      math.rint(hits.toDouble / (queries.size * topK) * 1000) / 1000
    }

    val rows = Seq(1, 2, 4, 8, 16).map { np =>
      val (r32, t32) = run(int8 = false, np)
      val (r8, t8) = run(int8 = true, np)
      val rr = rerankRecall(np)
      println(s"""{"nprobe":$np,"recall_f32":$r32,"sec_f32":$t32,""" +
        s""""recall_int8":$r8,"sec_int8":$t8,"recall_int8_rerank":$rr}""")
      (np, r32, t32, r8, t8, rr)
    }
    println(s"""{"sf":"$sfDir","vectors":$n,"k":16,""" +
      s""""index_bytes_f32":${n * dim * 4},""" +
      s""""index_bytes_int8":${n * dim},""" +
      s""""curve":${rows.map { case (np, r32, t32, r8, t8, rr) =>
        s"""{"nprobe":$np,"recall_f32":$r32,"sec_f32":$t32,""" +
          s""""recall_int8":$r8,"sec_int8":$t8,""" +
          s""""recall_int8_rerank":$rr}"""
      }.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
