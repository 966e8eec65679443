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
}
