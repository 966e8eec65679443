package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Residual IVF-PQ vs raw-vector IVF-PQ: the recall differential on
  * the test embeddings (everything is md5-seeded and integer-exact, so
  * these recalls are DETERMINISTIC constants of the testdata, not
  * statistics — pinned outright). */
class ResidualPqSpec extends SparkTest {

  private val Dim = 64
  private val Scale = 1000000L
  private val TopK = 10

  test("residual codes recall >= raw codes recall; both find the top") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    // exact reference: integer squared-L2 over the SAME quantization
    // the index uses (the metric ADC approximates)
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * Scale).toLong).toArray)
      .toMap
    val q = vecs(0L)
    val exact = vecs.toSeq.map { case (id, v) =>
      val d = v.zip(q).map { case (a, b) =>
        val dd = a - b; dd * dd }.sum
      (d, id)
    }.sorted.take(TopK).map(_._2).toSet

    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).toSeq
    val raw = ids(Similarity.ivfPqSearch(emb, "vec_id", "embedding",
      coarseK = 8, coarseIters = 2, m = 8, pqK = 16, pqIters = 2,
      nprobe = 2, queryId = 0L, dim = Dim, topK = TopK))
    val res = ids(Similarity.ivfPqSearchResidual(emb, "vec_id",
      "embedding", coarseK = 8, coarseIters = 2, m = 8, pqK = 16,
      pqIters = 2, nprobe = 2, queryId = 0L, dim = Dim, topK = TopK))

    assert(raw.size == TopK && res.size == TopK)
    val recallRaw = raw.count(exact) / TopK.toDouble
    val recallRes = res.count(exact) / TopK.toDouble
    info(s"recall@$TopK exact-metric: raw=$recallRaw residual=$recallRes")
    // measured across {nprobe 2/4/8} × {pqK 8/16}: residual ≥ raw in
    // every config, strictly better in half — this config (2 probes,
    // 16 codes) shows the differential at its clearest: 0.3 vs 0.5
    assert(recallRes > recallRaw,
      s"residual recall $recallRes !> raw $recallRaw")
    assert(recallRes >= 0.5, s"residual recall regressed: $recallRes")
    // both must at least find the query itself
    assert(res.contains(0L) && raw.contains(0L))
  }
}
