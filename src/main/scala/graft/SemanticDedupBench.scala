package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Adjudication control for [[Similarity.semanticDedup]] (SCALE.md):
  * the operator's scale claim is that the quadratic pair comparison is
  * confined to single clusters, making k the knob that bounds the
  * work — so this sweeps k at two data scales and reports wall time
  * and kept counts. With k fixed while data grows 10×, per-cluster
  * population grows 10× and intra-cluster pairs ~100× (the expected
  * superlinear shape); scaling k with the corpus restores ~linear
  * cost — the SemDeDup deployment rule (k≈10⁵ at web scale), here
  * demonstrated rather than asserted.
  *
  * env SPARK_GRAFT_SF_DIR selects the embeddings table; args are the
  * k values to sweep (default 4 16 64). iters=2, minSim=0.3 (q114's
  * setting, so the k=4 row anchors to the oracled query).
  *
  * `skew <n>` mode instead measures the maxCompare skew guard on the
  * adversarial input k cannot fix: n IDENTICAL vectors — every
  * centroid ties, assignment tie-breaks to one cid, ONE cluster holds
  * everything and the exact pair join is n²/2 rows no matter what k
  * says. Reports uncapped vs maxCompare=16 wall time and kept counts
  * (both keep exactly id 1 — the blob case is provably exact under
  * any cap ≥ 1).
  */
object SemanticDedupBench {

  private def skewRun(spark: SparkSession, n: Long, runs: Int): Unit = {
    import org.apache.spark.sql.functions._
    val df = spark.range(1, n + 1)
      .select(col("id").as("vec_id"),
        array((lit(1f) +: Seq.fill(7)(lit(0f))): _*).as("embedding"))
    def once(cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
        k = 8, iters = 1, minSim = 0.9, maxCompare = cap).count()
      ((System.nanoTime() - t0) / 1e9, kept)
    }
    val out = Seq("uncapped" -> Int.MaxValue, "cap16" -> 16).map {
      case (name, cap) =>
        once(cap) // warmup
        val rs = (1 to runs).map(_ => once(cap))
        val med = rs.map(_._1).sorted.apply(runs / 2)
        s""""$name":{"sec":${math.rint(med * 1000) / 1000},""" +
          s""""kept":${rs.head._2}}"""
    }
    println(s"""{"mode":"skew","vectors":$n,"runs":$runs,""" +
      out.mkString(",") + "}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val skewN: Option[Long] =
      if (args.headOption.contains("skew"))
        Some(args.lift(1).flatMap(_.toLongOption).getOrElse(10000L))
      else None
    val ks =
      if (skewN.isDefined || args.isEmpty) Seq(4, 16, 64)
      else args.toSeq.map(a => a.toIntOption.getOrElse(
        sys.error(s"k values must be integers, got '$a' " +
          "(space-separated, e.g.: 4 16 64)")))
    require(ks.nonEmpty && ks.forall(_ >= 1), s"bad k sweep: $ks")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    skewN.foreach { n =>
      skewRun(spark, n, runs); spark.stop(); return }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val out = ks.map { k =>
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val kept = Similarity.semanticDedup(emb, "vec_id", "embedding",
          k = k, iters = 2, minSim = 0.3).count()
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      once() // warmup (JIT + codegen for this k's plan)
      val rs = (1 to runs).map(_ => once())
      val med = rs.map(_._1).sorted.apply(runs / 2)
      val kept = rs.head._2
      s""""k$k":{"sec":${math.rint(med * 1000) / 1000},"kept":$kept}"""
    }
    println(s"""{"sf":"$sfDir","vectors":$n,"runs":$runs,""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
