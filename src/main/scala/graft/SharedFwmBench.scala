package graft

import graft.config.MoConfig
import graft.filter.FilterEnv
import graft.flow.TestFlowView
import graft.operators.{Fwm, SharedFwm}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication control for the shared-scan fwm pass (SCALE.md): times
  * an N-section MO tree two ways on SPARK_GRAFT_SF_DIR —
  * [[SharedFwm.batchAll]] (one scan, one shuffle) vs the N
  * [[Fwm.aggregate]] jobs it replaces — and prints one JSON line with
  * the medians and the speedup. SYMMETRIC by construction: both sides
  * time scan + aggregate only (no per-section orderBy/top-N finishing
  * on either — the finish is aggregate-sized work that `slice` applies
  * identically on top of either path), and the separate path runs
  * through one union so both sides pay a single action's fixed cost.
  *
  * `args(0)` = section count (default 3 — the q111 tree, for
  * continuity with the r13 table). Widths beyond 3 cycle a pool of
  * key fields × {octets, packets} across the root and a proto-filtered
  * child, exercising the superset-struct dispatch at realistic MO-tree
  * width (reference deployments run many MOs; the superset widens with
  * key diversity, so codegen behavior at 8–16 sections is the claim to
  * verify, not assume).
  */
object SharedFwmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    require(width >= 1, s"width must be >= 1, got $width")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val env = FilterEnv.flow(spark)
    val tree =
      if (width == 3)
        // the q111 tree, verbatim — keeps the table comparable
        MoConfig.MonitoringObject(
          name = "all", filter = "",
          fwm = Seq(
            MoConfig.FwmSection("hourly", Seq("octets desc", "proto"),
              timeSec = 3600, limit = None, extended = false),
            MoConfig.FwmSection("pkts2h", Seq("packets desc", "dst as"),
              timeSec = 7200, limit = None, extended = false)),
          mavg = Nil, classification = Nil,
          children = Seq(MoConfig.MonitoringObject(
            name = "tcp", filter = "proto 6",
            fwm = Seq(MoConfig.FwmSection("tcp_hourly",
              Seq("octets desc", "src port"), timeSec = 3600,
              limit = None, extended = false)),
            mavg = Nil, classification = Nil, children = Nil)))
      else {
        // wide tree: cycle distinct (key, measure, window) combos —
        // every key field widens the superset struct
        val keys = Seq("src host", "dst host", "src port", "dst port",
          "proto", "src as", "dst as", "src ifidx")
        def sec(i: Int) = MoConfig.FwmSection(s"s$i",
          Seq(s"${if (i % 2 == 0) "octets" else "packets"} desc",
            keys(i % keys.size)),
          timeSec = if (i % 3 == 2) 7200 else 3600,
          limit = None, extended = false)
        val onRoot = (width + 1) / 2
        MoConfig.MonitoringObject(
          name = "all", filter = "",
          fwm = (0 until onRoot).map(sec),
          mavg = Nil, classification = Nil,
          children = Seq(MoConfig.MonitoringObject(
            name = "tcp", filter = "proto 6",
            fwm = (onRoot until width).map(sec),
            mavg = Nil, classification = Nil, children = Nil)))
      }
    val secs = SharedFwm.sections(tree, env)
    require(secs.size == width, s"built ${secs.size} sections, want $width")

    def flows = TestFlowView.load(spark, sfDir)
    def shared(): Unit =
      SharedFwm.batchAll(flows, env, secs,
          samplingRate = Some(col("sampling_rate")))
        .write.format("noop").mode("overwrite").save()
    // the per-section select RETAINS the first aggregate column ("m"):
    // projecting (section, time) alone lets Catalyst column-prune the
    // sum expressions out of the baseline's HashAggregate, making the
    // separate side compute LESS than real per-section work and
    // biasing the reported speedup low (ADVICE r14). Every bench
    // section's measures are LongType (octets/packets), so the union
    // stays schema-consistent.
    // measure names are per-section constants — resolved ONCE here so
    // the timed body contains only plan construction and execution
    val measureOf: Map[String, String] = secs.map(s => s.conf.name ->
      Fwm.compile(s.conf).fold(e => sys.error(e), identity)
        .aggrs.head.sqlName).toMap
    def separate(): Unit =
      secs.map { s =>
        Fwm.aggregate(flows.filter(s.pred), env, s.conf,
            samplingRate = Some(col("sampling_rate")))
          .select(lit(s.conf.name).as("section"), col("time"),
            col(measureOf(s.conf.name)).as("m"))
      }.reduce(_ unionByName _)
        .write.format("noop").mode("overwrite").save()

    // warmup both paths (JIT, codegen, parquet footers)
    shared(); separate()
    def med(body: () => Unit): Double = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }.sorted
      math.rint(ts(ts.size / 2) * 1000) / 1000
    }
    val tShared = med(shared _)
    val tSeparate = med(separate _)
    println(s"""{"sf":"$sfDir","sections":${secs.size},""" +
      s""""shared_scan_sec":$tShared,"separate_scans_sec":$tSeparate,""" +
      s""""speedup":${math.rint(tSeparate / tShared * 100) / 100},""" +
      s""""runs":$runs}""")
    spark.stop()
  }
}
