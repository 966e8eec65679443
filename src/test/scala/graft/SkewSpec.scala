package graft

import org.apache.spark.sql.functions._

/** Pins the engine behavior SCALE.md leans on for skewed keys: AQE's
  * OptimizeSkewedJoin splits a hot join partition at runtime, so the
  * operators here don't hand-roll salting for equi-joins. Thresholds
  * are lowered to make the optimization fire at spec sizes — the
  * ASSERTION (skew=true in the final adaptive plan) is what matters,
  * not the absolute sizes. */
class SkewSpec extends SparkTest {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // enough partitions that the hot one towers over the MEDIAN —
      // with the suite default of 2, the median IS the hot partition
      // and the factor test can never flag it
      "spark.sql.shuffle.partitions" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 60k facts on ONE hot key + a uniform tail; dimension covers all
      val facts = spark.range(0, 66000).select(
        when(col("id") < 60000, 0L).otherwise(col("id") % 100).as("k"),
        concat(lit("payload-"), col("id")).as("pad"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("d"))
      val joined = facts.join(dim, "k")
      // materialize THIS queryExecution (count() would plan its own
      // and leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 66000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must have split the hot partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("media-dedup maxBucket cap: the q123/q128 corpus' largest band " +
    "bucket stays under the call-site cap, so capped == uncapped") {
    import graft.operators.{Dedup, Multimodal}
    // the REAL production pieces, not replicas: the q123/q128/q131
    // corpus, the call sites' cap value, and hammingPairs' own band
    // split — so corpus growth or a banding change fails HERE before
    // it can silently drop pairs at the oracled call sites
    val corpus = Queries.imageDedupCorpus(spark)
    val cap = Queries.mediaMaxBucket.get
    val sig = Multimodal.withAHash(corpus, "payload")
    val maxBucket = sig
      .select(posexplode(
        array(Dedup.bandColumns(col("ahash"), 64, 6): _*))
        .as(Seq("band", "bv")))
      .groupBy(col("band"), col("bv")).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(maxBucket <= cap,
      s"corpus' hottest band bucket grew to $maxBucket — the media " +
        s"call sites' maxBucket=$cap would now drop pairs and drift " +
        "from the oracle")
    val uncapped = Dedup.hammingPairs(sig, "img_id", "ahash", 64, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    val capped = Dedup.hammingPairs(sig, "img_id", "ahash", 64, 6,
        maxBucket = Queries.mediaMaxBucket)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    assert(capped == uncapped)
    assert(uncapped.nonEmpty)
  }
}
