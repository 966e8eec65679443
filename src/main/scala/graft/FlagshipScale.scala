package graft

import graft.filter.FilterEnv
import graft.flow.TestFlowView
import graft.operators.Fwm
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flagship throughput vs data size (SCALE.md): the Bench flagship
  * replay (filter → weekly fwm window agg → top-10) at growing
  * replication factors in ONE session — the direct evidence that the
  * flagship plan's flows/s HOLDS as the input grows, i.e. the plan is
  * scan-bound with a fixed agg state (10 groups × windows), not
  * superlinear in anything. rep=100 at sf0.1 pushes 10 M events
  * through the exact Bench plan. args: rep values (default 10 30
  * 100); env SPARK_GRAFT_CPUS, SPARK_GRAFT_RUNS. */
object FlagshipScale {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(10, 30, 100)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nEvents = spark.read.parquet(s"$sfDir/events.parquet").count()
    val env = FilterEnv.flow(spark)
    val one = TestFlowView.load(spark, sfDir)
    val rows = reps.map { rep =>
      def once(): Double = {
        val big = Seq.fill(rep)(one).reduce(_ union _)
        val t0 = System.nanoTime()
        Fwm.batch(big, env,
            Fwm.Conf("weekly", Seq("octets desc", "src host"),
              timeSec = 604800, limit = Some(10)),
            samplingRate = Some(col("sampling_rate")))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (codegen for this union width)
      val best = (1 to runs).map(_ => once()).min
      val fps = nEvents * rep / best
      println(s"""{"rep":$rep,"events":${nEvents * rep},""" +
        s""""sec":${math.rint(best * 1000) / 1000},""" +
        s""""flows_per_sec":${math.rint(fps)}}""")
      (rep, best, fps)
    }
    println(s"""{"flagship_scale":${rows.map { case (r, s, f) =>
      s"""{"rep":$r,"sec":${math.rint(s * 1000) / 1000},""" +
        s""""fps":${math.rint(f)}}"""
    }.mkString("[", ",", "]")},"events_base":$nEvents}""")
    spark.stop()
  }
}
