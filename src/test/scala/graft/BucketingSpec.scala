package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: one shuffle at write time, zero at every
  * join after — plan-asserted, result-checked against the plain join. */
class BucketingSpec extends SparkTest {

  /** Scratch database + the co-bucketed tables (once per suite). */
  private lazy val db: String = {
    val loc = java.nio.file.Files.createTempDirectory("graft_bucket")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bucket_db " +
      s"LOCATION '${loc.toUri}'")
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/orders.parquet"),
      "graft_bucket_db.orders_b", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/lineitem.parquet"),
      "graft_bucket_db.lineitem_b", Seq("l_orderkey"), 8)
    "graft_bucket_db"
  }

  /** Run body with broadcast joins off — at sf0.001 every join would
    * otherwise broadcast and the merge-join property under test never
    * appears (at archive scale neither side broadcasts, which is the
    * regime bucketing exists for). */
  private def noBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  private def bucketJoin() = spark.table(s"$db.lineitem_b")
    .join(spark.table(s"$db.orders_b"),
      col("l_orderkey") === col("o_orderkey"))
    .groupBy(col("o_orderpriority"))
    .agg(sum(col("l_quantity")).as("qty"))

  test("equi-join of co-bucketed tables has no join-side exchange") {
    noBroadcast {
      val joined = bucketJoin()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the ONLY exchange is the aggregation's — the join reads
      // co-located buckets directly
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected only the groupBy exchange:\n$plan")

      // identical result to the plain (shuffled) join
      val dir = "/root/testdata/sf0.001"
      val plain = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == plain)
    }
  }

  test("legacy outputOrdering conf + one file per bucket also drops the sorts") {
    // modern Spark re-sorts buckets at read by default (reporting the
    // stored order would serialize multi-file buckets); with exactly
    // one file per bucket — which writeBucketed's repartition
    // guarantees — the legacy conf restores fully sort-free merge joins
    noBroadcast {
      spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      try {
        val plan = bucketJoin().queryExecution.executedPlan.toString
        val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSection.contains("Sort "),
          s"sorted buckets must feed the merge join directly:\n$plan")
      } finally spark.conf.unset(
        "spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("equality filter on the bucket key prunes to one bucket's files") {
    // the planner falls back to a plain scan ("disabled by query
    // planner") for join-free queries unless auto-bucketed-scan is off;
    // pruning only applies to a bucketed read
    spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val key = spark.table(s"$db.orders_b")
        .select(col("o_orderkey")).head().getLong(0)
      val one = spark.table(s"$db.orders_b")
        .filter(col("o_orderkey") === key)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning missing:\n$plan")
      assert(one.count() >= 1)
    } finally spark.conf.unset(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("mismatched bucket counts re-shuffle (the property is fragile)") {
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet"), s"$db.orders_b4",
      Seq("o_orderkey"), 4)
    noBroadcast {
      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b4"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // one side must re-exchange (or coalesce) — pinning this
      // documents WHY writeBucketed callers must agree on the count
      assert("Exchange hashpartitioning".r.findAllIn(plan).nonEmpty ||
        plan.contains("coalesced"), plan)
    }
  }
}
