package graft

import graft.config.MoConfig
import graft.filter.FilterEnv
import graft.streaming.{ExtStatsGate, MavgStream, Pipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class PipelineSpec extends SparkTest {

  test("ext-stats gate: alerts open/close extended windows " +
    "(monit-objects-mavg-act.c:192-227)") {
    val gate = new ExtStatsGate
    assert(!gate.isActive("ext"))
    gate.applyAlerts(
      Seq(MavgStream.AlertRow("k", 0, "start", 1.0, 1.0, 0L)),
      Map(0 -> Seq("ext")))
    assert(gate.isActive("ext"))
    gate.applyAlerts(
      Seq(MavgStream.AlertRow("k", 0, "update", 1.0, 1.0, 0L)),
      Map(0 -> Seq("ext")))
    assert(gate.isActive("ext")) // updates don't close
    gate.applyAlerts(
      Seq(MavgStream.AlertRow("k", 0, "end", 0.0, 1.0, 0L)),
      Map(0 -> Seq("ext")))
    assert(!gate.isActive("ext"))
  }

  test("mo.conf → streaming pipeline end-to-end: fwm windows close, " +
    "mavg alerts fire") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mo = MoConfig.parse("mo1", """{
      "filter": "proto 6",
      "fwm": [
        {"name": "w", "fields": ["octets desc", "proto"], "time": 10},
        {"extended": true, "name": "ext",
         "fields": ["octets", "src host"], "time": 10}
      ],
      "mavg": [
        {"name": "m", "time": 5, "fields": ["src host", "octets"],
         "overlimit": [{"name": "lim", "default": [100]}]}
      ]
    }""")

    val mem = MemoryStream[(Timestamp, Long, Long, Long)]
    val flows = mem.toDS()
      .toDF("ts", "protocol", "ip4_src_addr", "in_bytes")
    val env = FilterEnv.flow(spark)
    val (fwms, mavgs) = Pipeline.build(mo, flows, env, mavgTickMs = 0L)
    assert(fwms.map(_.section.name) == Seq("w", "ext"))
    assert(mavgs.map(_.section.name) == Seq("m"))

    val gate = new ExtStatsGate
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    val q1 = fwms.head.windowed.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch(Pipeline.fwmBatchWriter(fwms.head, gate) { finished =>
        finished.select("time", "proto", "octets").collect()
          .foreach(r => collected.synchronized {
            collected += ((r.getLong(0), r.getLong(1), r.getLong(2)))
          })
      }).start()
    val extRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = fwms(1).windowed.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch(Pipeline.fwmBatchWriter(fwms(1), gate) { finished =>
        extRows.synchronized { extRows += finished.count() }
      }).start()
    val q3 = mavgs.head.alerts.writeStream
      .format("memory").queryName("pipe_alerts")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: Long) = new Timestamp(s * 1000)
      // tcp flows, src a very loud (rate > 100/s), one udp flow filtered
      mem.addData((ts(1), 6L, 10L, 3000L), (ts(2), 6L, 11L, 5L),
        (ts(3), 17L, 12L, 9999L))
      Seq(q1, q2, q3).foreach(_.processAllAvailable())
      mem.addData((ts(25), 6L, 10L, 1L)) // advance watermark past 10
      Seq(q1, q2, q3).foreach(_.processAllAvailable())
      mem.addData((ts(26), 6L, 10L, 1L)) // flush the closed window
      Seq(q1, q2, q3).foreach(_.processAllAvailable())

      // fwm: window [0,10) has only tcp rows (udp filtered by the MO)
      val w0 = collected.filter(_._1 == 0L)
      assert(w0.map(_._3).sum == 3005L, s"got $collected")
      assert(w0.forall(_._2 == 6L))
      // extended section stayed gated off → its writer saw nothing
      assert(extRows.forall(_ == 0L) || extRows.isEmpty)
      // mavg: src 10 pushed 3000 bytes in 5s window → 600/s ≥ 100 alert
      val alerts = spark.table("pipe_alerts")
        .as[MavgStream.AlertRow].collect()
      assert(alerts.exists(a => a.event == "start" && a.key == "10"))
      assert(!alerts.exists(a => a.key == "11" && a.event == "start"))
      // feeding the start alert into the gate opens the ext section
      gate.applyAlerts(alerts.toSeq, Map(0 -> Seq("ext")))
      assert(gate.isActive("ext"))
    } finally { q1.stop(); q2.stop(); q3.stop() }
  }
}
