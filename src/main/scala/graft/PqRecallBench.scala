package graft

import graft.operators.Similarity
import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Recall-vs-nprobe curve for raw-codes vs residual-codes IVF-PQ
  * (SCALE.md): quantifies when the residual opt-in is worth it, at the
  * sweep's sf1.0 replica scale (20 K vectors — ten shifted universes
  * of the sf0.1 set). Ground truth per query is the exact integer
  * squared-L2 top-10 over the SAME quantization the index uses (the
  * metric ADC approximates); recall@10 is averaged over a fixed query
  * panel. Everything is md5-seeded and integer-exact, so these numbers
  * are deterministic constants of the dataset, not statistics.
  */
object PqRecallBench {
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

    val (dim, scale, topK) = (64, 1000000L, 10)
    val (coarseK, coarseIters, m, pqK, pqIters) = (16, 2, 8, 16, 2)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = Seq(0L, 7L, 42L, 1048576L + 3L, 2097152L + 11L)

    def sq(a: org.apache.spark.sql.Column,
           b: org.apache.spark.sql.Column) = GraftBridge.toColumn(
      graft.functions.VecSqDistLongExpr(
        GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
    val vq = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), x =>
        floor(x * lit(scale.toDouble)).cast(LongType)).as("v"))

    def exactTop(qId: Long): Set[Long] = {
      val qv = vq.filter(col("id") === qId).select(col("v").as("qv"))
      vq.join(broadcast(qv))
        .select(col("id"), sq(col("v"), col("qv")).as("d"))
        .orderBy(col("d").asc, col("id").asc)
        .limit(topK).collect().map(_.getLong(0)).toSet
    }
    val truth = queries.map(q => q -> exactTop(q)).toMap

    def recall(residual: Boolean, nprobe: Int): Double = {
      val hits = queries.map { q =>
        val got =
          (if (residual)
            Similarity.ivfPqSearchResidual(emb, "vec_id", "embedding",
              coarseK, coarseIters, m, pqK, pqIters, nprobe, q, dim,
              topK, scale)
          else
            Similarity.ivfPqSearch(emb, "vec_id", "embedding",
              coarseK, coarseIters, m, pqK, pqIters, nprobe, q, dim,
              topK, scale))
          .collect().map(_.getLong(0)).toSet
        (got & truth(q)).size
      }.sum
      math.rint(hits.toDouble / (queries.size * topK) * 1000) / 1000
    }

    val nprobes = Seq(1, 2, 4, 8)
    val rows = nprobes.map { np =>
      val (r0, r1) = (recall(residual = false, np),
        recall(residual = true, np))
      println(s"""{"nprobe":$np,"recall_raw":$r0,""" +
        s""""recall_residual":$r1}""")
      (np, r0, r1)
    }
    println(s"""{"sf":"$sfDir","queries":${queries.size},""" +
      s""""coarseK":$coarseK,"m":$m,"pqK":$pqK,""" +
      s""""curve":${rows.map { case (np, r0, r1) =>
        s"""{"nprobe":$np,"raw":$r0,"residual":$r1}"""
      }.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
