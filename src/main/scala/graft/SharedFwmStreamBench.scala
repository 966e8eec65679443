package graft

import graft.config.MoConfig
import graft.filter.FilterEnv
import graft.flow.TestFlowView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Adjudication control for the STREAMING shared-scan fwm
  * ([[graft.operators.SharedFwm.streamGroup]], q112): replays a spool
  * of parquet chunks through (a) ONE shared-group query for an
  * N-section MO tree vs (b) the N per-section queries
  * ([[graft.streaming.Pipeline.build]]) they replace, and prints wall
  * time plus TOTAL SOURCE ROWS READ from each path's query progress.
  *
  * The structural claim the numbers pin: N per-section queries each
  * re-read the whole stream (N× source rows, N state stores, N
  * watermark estates); the shared group reads it once. At 100 TB/day
  * ingest the source read IS the cost, so this ratio — not wall time
  * on a warm 60 K-row spool — is the scale story; wall time is
  * reported for the fixed-cost picture (per-query startup + per-batch
  * state commits).
  *
  * `args(0)` = section count (default 3), sections share one 3600 s
  * window (streamGroup's contract — one window length per query).
  */
object SharedFwmStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val width = args.headOption.flatMap(_.toIntOption).getOrElse(3)
    require(width >= 1, s"width must be >= 1, got $width")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val env = FilterEnv.flow(spark)

    // spool: the flow view as 8 mtime-ordered parquet chunks with a
    // TimestampType ts — the q112 harness shape at sf scale
    val base = java.nio.file.Files
      .createTempDirectory("sharedfwm_stream").toFile
    val spool = new java.io.File(base, "spool"); spool.mkdirs()
    val flows0 = TestFlowView.load(spark, sfDir)
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withColumn("chunk", pmod(col("ts_sec"), lit(8)))
    (0 until 8).foreach { c =>
      val tmp = new java.io.File(base, s"stage-$c")
      flows0.filter(col("chunk") === c).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(spool, f"chunk-$c%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1_700_000_000_000L + c * 60_000L)
    }
    val schema = spark.read.parquet(spool.getAbsolutePath).schema
    def stream: DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(spool.getAbsolutePath)

    val keys = Seq("src host", "dst host", "src port", "dst port",
      "proto", "src as", "dst as", "src ifidx")
    def sec(i: Int) = MoConfig.FwmSection(s"s$i",
      Seq(s"${if (i % 2 == 0) "octets" else "packets"} desc",
        keys(i % keys.size)),
      timeSec = 3600, limit = None, extended = false)
    val onRoot = (width + 1) / 2
    val tree = MoConfig.MonitoringObject(
      name = "all", filter = "",
      fwm = (0 until onRoot).map(sec), mavg = Nil, classification = Nil,
      children = Seq(MoConfig.MonitoringObject(
        name = "tcp", filter = "proto 6",
        fwm = (onRoot until width).map(sec),
        mavg = Nil, classification = Nil, children = Nil)))

    val runSeq = new java.util.concurrent.atomic.AtomicInteger
    /** Run `plans` as concurrent AvailableNow queries; wall secs +
      * total source rows read across all of them. */
    def drive(plans: Seq[DataFrame]): (Double, Long) = {
      val r = runSeq.incrementAndGet()
      val t0 = System.nanoTime()
      val qs = plans.zipWithIndex.map { case (p, i) =>
        p.writeStream.outputMode(OutputMode.Append)
          .option("checkpointLocation",
            new java.io.File(base, s"ckpt-$r-$i").getAbsolutePath)
          .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
          .trigger(Trigger.AvailableNow())
          .start()
      }
      qs.foreach(_.awaitTermination())
      val rows = qs.map(_.recentProgress.map(_.numInputRows).sum).sum
      qs.foreach(_.stop())
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    def shared(): (Double, Long) = {
      val groups = graft.streaming.Pipeline.buildSharedFwm(
        tree, stream, env)
      require(groups.size == 1, s"one window group expected: $groups")
      drive(Seq(groups.head.combined))
    }
    def separate(): (Double, Long) = {
      val (branches, _) = graft.streaming.Pipeline.build(
        tree, stream, env, mavgTickMs = 0L)
      require(branches.size == width)
      drive(branches.map(_.windowed))
    }

    shared(); separate() // warmup (JIT, codegen, parquet footers)
    def med(body: () => (Double, Long)): (Double, Long) = {
      val xs = (1 to runs).map(_ => body())
      (math.rint(xs.map(_._1).sorted.apply(runs / 2) * 1000) / 1000,
        xs.head._2)
    }
    val (tS, rowsS) = med(shared _)
    val (tN, rowsN) = med(separate _)
    println(s"""{"sf":"$sfDir","sections":$width,""" +
      s""""shared_sec":$tS,"separate_sec":$tN,""" +
      s""""shared_source_rows":$rowsS,""" +
      s""""separate_source_rows":$rowsN,""" +
      s""""source_read_ratio":${
        math.rint(rowsN.toDouble / rowsS * 100) / 100},""" +
      s""""speedup":${math.rint(tN / tS * 100) / 100},""" +
      s""""runs":$runs}""")
    spark.stop()
  }
}
