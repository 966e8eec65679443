package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Adjudication control for the template snapshot store (SCALE.md):
  * measures what persisting the NetFlow template/sampling store costs
  * per micro-batch, for each persistence mode of
  * [[graft.sources.NetflowDecoder.decodeStream]]:
  *
  *   - `none`  — no templatesDir (in-memory store only; the floor)
  *   - `local` — bare path (java.io + atomic rename)
  *   - `hfs`   — `file:` URI (the Hadoop FileSystem route a cluster
  *               uses for hdfs:// / s3a:// shared stores; local disk
  *               underneath, so the delta over `local` is the Hadoop
  *               FS API itself, not network)
  *
  * Each mode replays B micro-batches of K self-contained v9 packets
  * (template + record per packet; 512 template ids × K/512 exporters,
  * so K distinct store keys) through one streaming query into the
  * noop sink; the store grows with template revisions and is
  * re-persisted at every micro-batch task end — the worst-case write
  * cadence. Reports per-mode medians and the per-batch overhead vs
  * `none`.
  */
object TemplateStoreBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    val batches = args.headOption.flatMap(_.toIntOption).getOrElse(16)
    val perBatch =
      args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // A REALISTIC template estate, not q40's single-tid toy: 512
    // template ids × (perBatch/512) exporters = perBatch distinct
    // store keys, and each batch re-announces every template at a NEW
    // epoch — so the store carries a full epoch history (capped at 8)
    // and the persisted snapshot is hundreds of KB, the size class a
    // busy multi-exporter collector actually accumulates.
    def u16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def u32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def pkt(i: Int, epoch: Long): Array[Byte] = {
      val tid = 256 + (i % 512)
      val header = u16(9) ++ u16(2) ++ u32(0) ++ u32(epoch) ++
        u32(i) ++ u32(1)
      val tmpl = u16(0) ++ u16(20) ++ u16(tid) ++ u16(3) ++
        u16(1) ++ u16(4) ++ u16(4) ++ u16(1) ++ u16(8) ++ u16(4)
      val rec = u32(100L + i) ++
        Array[Byte]((if (i % 2 == 0) 6 else 17).toByte) ++
        u32(0x0a000000L + i % 16)
      val data = u16(tid) ++ u16(4 + rec.length) ++ rec
      header ++ tmpl ++ data
    }
    def batchRows(b: Int): Seq[(Array[Byte], Long, Long)] =
      (0 until perBatch).map { i =>
        val epoch = 1700000000L + b * 3600L + i
        (pkt(i, epoch), epoch, (i / 512).toLong)
      }
    val allBatches = (0 until batches).map(batchRows)

    def run(templatesDir: Option[String]): Double = {
      val ns = s"tsb-${System.nanoTime()}"
      val mem = MemoryStream[(Array[Byte], Long, Long)]
      val flows = graft.sources.NetflowDecoder.decodeStream(
        mem.toDF().toDF("payload", "ts_sec", "src_ip").repartition(4),
        ns, templatesDir = templatesDir)
      val q = flows.writeStream.format("noop")
        .queryName(s"tsb${System.nanoTime()}")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .start()
      val t0 = System.nanoTime()
      try {
        allBatches.foreach { rows =>
          mem.addData(rows: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val t = (System.nanoTime() - t0) / 1e9
      graft.sources.NetflowDecoder.clearStreamCache(ns)
      t
    }

    def med(mk: () => Option[String]): Double = {
      val ts = (1 to runs).map(_ => run(mk())).sorted
      math.rint(ts(ts.size / 2) * 1000) / 1000
    }
    def freshDir(): String = java.nio.file.Files
      .createTempDirectory("tsb_store").toString

    // warmup EVERY mode's code path: the persistence branches carry
    // their own one-time costs (FileSystem/FileContext class load,
    // persistence-path JIT) that must not land in a measured run
    run(None)
    run(Some(freshDir()))
    run(Some("file:" + freshDir()))
    val tNone = med(() => None)
    val localDir = freshDir()
    val tLocal = med(() => Some(freshDir()))
    val tHfs = med(() => Some("file:" + freshDir()))
    // store size: one persisted run's files
    run(Some(localDir))
    val bytes = Option(new java.io.File(localDir).listFiles())
      .toSeq.flatten.filter(_.getName.endsWith(".tmpl"))
      .map(_.length).sum
    def perBatchMs(t: Double) =
      math.rint((t - tNone) / batches * 100000) / 100
    println(s"""{"batches":$batches,"packets_per_batch":$perBatch,""" +
      s""""partitions":4,"none_sec":$tNone,"local_sec":$tLocal,""" +
      s""""hfs_sec":$tHfs,""" +
      s""""local_overhead_ms_per_batch":${perBatchMs(tLocal)},""" +
      s""""hfs_overhead_ms_per_batch":${perBatchMs(tHfs)},""" +
      s""""snapshot_bytes":$bytes,"runs":$runs}""")
    spark.stop()
  }
}
