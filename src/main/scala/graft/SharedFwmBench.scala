package graft

import graft.config.MoConfig
import graft.filter.FilterEnv
import graft.flow.TestFlowView
import graft.operators.{Fwm, SharedFwm}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication control for the shared-scan fwm pass (SCALE.md): times
  * q111's 3-section MO tree two ways on SPARK_GRAFT_SF_DIR —
  * [[SharedFwm.batchAll]] (one scan, one shuffle) vs the three
  * [[Fwm.batch]] jobs it replaces — and prints one JSON line with the
  * medians and the speedup. The separate path is run through one union
  * so both sides pay a single action's fixed cost.
  */
object SharedFwmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
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
    val tree = MoConfig.MonitoringObject(
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
    val secs = SharedFwm.sections(tree, env)

    def flows = TestFlowView.load(spark, sfDir)
    def shared(): Unit =
      SharedFwm.batchAll(flows, env, secs,
          samplingRate = Some(col("sampling_rate")))
        .write.format("noop").mode("overwrite").save()
    def separate(): Unit =
      secs.map(s => Fwm.batch(flows.filter(s.pred), env, s.conf,
          samplingRate = Some(col("sampling_rate")))
          .select(lit(s.conf.name).as("section"), col("time")))
        .reduce(_ unionByName _)
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
