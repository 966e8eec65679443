package graft

import graft.sources.{KafkaIngest, NetflowDecoder}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Kafka glue: the standard kafka-source schema projected onto the
  * decoder contract, batch + streaming (cross-batch template store).
  * Kafka-shaped frames are synthesized (the connector jar is not on
  * the classpath, and the glue only depends on its OUTPUT schema). */
class KafkaIngestSpec extends SparkTest {

  private def bytes(parts: Any*): Array[Byte] = Wire.bytes(parts: _*)

  // v9: header(version count uptime unix seq srcId), template 256 =
  // in_bytes(1,4) proto(4,1), one data record
  private def hdr(unix: Long, seq: Long) = bytes(9, 1, 0L, unix, seq, 7L)
  private val tmpl = hdr(100L, 1L) ++ bytes(0, 16, 256, 2, 1, 4, 4, 1)
  private def dataPkt(unix: Long, seq: Long, octets: Long, proto: Byte) =
    hdr(unix, seq) ++ bytes(256, 9, octets, proto)

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType, true),
    StructField("value", BinaryType, true),
    StructField("topic", StringType, true),
    StructField("partition", IntegerType, true),
    StructField("offset", LongType, true),
    StructField("timestamp", TimestampType, true),
    StructField("timestampType", IntegerType, true)))

  private def kafkaDf(rows: Seq[(Array[Byte], Array[Byte], Long)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, v, sec), i) =>
        Row(k, v, "netflow", 0, i.toLong,
          if (sec < 0) null else Timestamp.from(
            java.time.Instant.ofEpochSecond(sec)),
          0)
      }.asJava, kafkaSchema)
  }

  test("packets: value->payload, timestamp->ts_sec, key[0:4]->src_ip " +
    "unsigned; null/short key and null timestamp degrade gracefully") {
    val key = Array(255.toByte, 0.toByte, 0.toByte, 1.toByte, 9.toByte)
    val rows = kafkaDf(Seq(
      (key, bytes(1, 2), 1700000000L),          // 5-byte key: first 4 used
      (null, bytes(3, 4), 1700000001L),         // null key
      (Array[Byte](1, 2), bytes(5, 6), -1L)))   // short key + null ts
    val got = KafkaIngest.packets(rows, fallbackTsSec = 42L)
      .collect().map(r => (r.getAs[Array[Byte]]("payload").toSeq,
        r.getLong(1), r.getLong(2)))
    assert(got(0) == (bytes(1, 2).toSeq, 1700000000L, 0xFF000001L),
      "4278190081 proves the u32 key read is unsigned")
    assert(got(1) == (bytes(3, 4).toSeq, 1700000001L, 0L))
    assert(got(2) == (bytes(5, 6).toSeq, 42L, 0L))
  }

  test("batch decode: archived-topic replay; the exporter key SCOPES " +
    "the template store (another exporter's tid 256 must not decode)") {
    val exporter = Array[Byte](10, 0, 0, 99)
    val stranger = Array[Byte](10, 0, 0, 77)
    val df = kafkaDf(Seq(
      (exporter, dataPkt(150L, 3L, 5555L, 6), 150L), // data BEFORE tmpl:
      (exporter, tmpl, 100L),                        // order-independent
      (stranger, dataPkt(150L, 9L, 1111L, 6), 150L))) // no template
    val out = NetflowDecoder.decode(KafkaIngest.packets(df).coalesce(1))
      .select("ts_sec", "in_bytes", "protocol").collect()
    assert(out.toSeq == Seq(Row(150L, 5555L, 6L)),
      "only the keyed exporter's record decodes: " + out.toSeq)
  }

  test("streaming decode: template in batch 1 decodes batch 2's " +
    "data-only packets via the cross-batch store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Array[Byte], Array[Byte], Long)]
    // MemoryStream tuple -> the kafka output shape
    val kafkaShaped = mem.toDF().toDF("key", "value", "sec").select(
      col("key"), col("value"), lit("netflow").as("topic"),
      lit(0).as("partition"), lit(0L).as("offset"),
      timestamp_seconds(col("sec")).cast(TimestampType).as("timestamp"),
      lit(0).as("timestampType"))
    val ns = s"kafka-spec-${System.nanoTime()}"
    NetflowDecoder.clearStreamCache(ns)
    val out = KafkaIngest.decodeStream(kafkaShaped, ns)
      .select("ts_sec", "in_bytes", "protocol")
    val q = out.writeStream.format("memory").queryName("kafka_sink")
      .outputMode("append").start()
    try {
      val exporter = Array[Byte](10, 0, 0, 99)
      mem.addData((exporter, tmpl, 100L))
      q.processAllAvailable()
      mem.addData((exporter, dataPkt(150L, 3L, 7777L, 17), 150L),
        (exporter, dataPkt(151L, 4L, 8888L, 6), 151L))
      q.processAllAvailable()
      val got = spark.table("kafka_sink").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((150L, 7777L, 17L), (151L, 8888L, 6L)),
        s"cross-batch template store must decode data-only batch: $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView("kafka_sink")
      NetflowDecoder.clearStreamCache(ns)
    }
  }
}
