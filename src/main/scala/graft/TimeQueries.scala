package graft

import org.apache.spark.sql.SparkSession

/** Driver-order timing control: re-time a named subset of the contract
  * queries, in the given order, inside one JVM with the SAME session
  * shape as [[Bench]] — the adjudication tool for a driver-bench
  * number that contradicts its local measurement (VERDICT r11's q47:
  * 10.36 s in BENCH_r11 vs 3.47 s local median on unchanged code).
  *
  * Usage: `runMain graft.TimeQueries q45_dup_clusters q46_dedup_resolve
  * q47_dedup_pipeline` with `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_RUNS` /
  * `SPARK_GRAFT_CPUS` as for Bench. Prints every raw sample plus the
  * median per query, and the physical-plan exchange-reuse counts
  * (`Exchange` vs `ReusedExchange` occurrences) so a lost
  * reuse-exchange — the one plan regression that multiplies this
  * pipeline family's cost — is visible without reading the full plan.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQueries <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    // (timing-control tool only — Bench owns the recorded defaults)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    args.foreach { n =>
      require(SparkEntry.queries.contains(n), s"unknown query $n") }

    // same warmup as Bench: tables + one query through the whole stack
    Seq("lineitem", "orders", "customer", "part", "events", "documents")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet")
        .limit(1).collect())
    SparkEntry.queries("q01_fwm_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      var lastPlan = ""
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // collect() drives THIS QueryExecution so its AdaptiveSparkPlan
        // finalizes — the noop write above executes a sibling plan we
        // can't introspect; runtime exchange reuse (AQE) only shows in
        // a FINAL plan, never in the static formatted one
        df.collect()
        lastPlan = df.queryExecution.executedPlan.toString
        dt
      }
      val med = times.sorted.apply(times.size / 2)
      val nEx = "Exchange hashpartitioning".r.findAllIn(lastPlan).size
      val nReuse = "ReusedExchange".r.findAllIn(lastPlan).size
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) println(lastPlan)
      println(f"TIMEQ $name%-24s median=$med%7.3f s  runs=" +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]") +
        s"  exchanges=$nEx reused=$nReuse")
    }
    spark.stop()
  }
}
