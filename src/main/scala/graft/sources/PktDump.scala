package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `pktdump` — a DataSource V2 for raw capture-dump FILES, the batch
  * ingest path SURVEY §2.1 maps the reference's live UDP loop onto
  * (scapture.c:104-173 `recvfrom` → here, one rotated dump file per
  * collector period). Reading dumps directly removes the
  * "preprocess to parquet first" step: `spark.read.format("pktdump")
  * .load(dir)` → (payload, ts_sec, src_ip) → NetflowDecoder/
  * SflowDecoder.
  *
  * On-disk format (little-endian-free — all big-endian, like the wire):
  * magic "GPKD" + u32 version(1), then per packet
  * [u32 payloadLen][u64 tsSec][u32 srcIp][payload]. Writing happens
  * collector-side ([[PktDump.write]] is the test/reference writer).
  *
  * Split model: ONE PARTITION PER FILE. Records are variable-length
  * with no sync markers, so an intra-file split cannot find a record
  * boundary without a scan; collectors rotate dumps by period/exporter
  * anyway, so file-granularity is the natural parallelism at scale —
  * and it keeps each exporter's template announcements in the same
  * partition as its data records (the template-locality contract of
  * NetflowDecoder.decode). Column pruning is honored: un-requested
  * payloads are skipped, not materialized (a ts-only count never
  * allocates packet bytes).
  */
object PktDump {
  val MAGIC = 0x47504b44 // "GPKD"
  val VERSION = 1

  val schema: StructType = StructType(Seq(
    StructField("payload", BinaryType, nullable = false),
    StructField("ts_sec", LongType, nullable = false),
    StructField("src_ip", LongType, nullable = false)))

  /** Reference writer (collector-side / tests): one dump file. */
  def write(path: String,
            packets: Seq[(Array[Byte], Long, Long)]): Unit = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(MAGIC)
      out.writeInt(VERSION)
      packets.foreach { case (payload, ts, src) =>
        out.writeInt(payload.length)
        out.writeLong(ts)
        out.writeInt(src.toInt)
        out.write(payload)
      }
    } finally out.close()
  }
}

/** Registered as short name `pktdump` via META-INF/services. */
class PktDumpSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pktdump"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PktDump.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PktDumpTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

class PktDumpTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"pktdump($path)"
  override def schema(): StructType = PktDump.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new PktDumpScanBuilder(
      Option(path).getOrElse(options.get("path")))
}

class PktDumpScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PktDump.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PktDumpScan(path, required)
}

class PktDumpScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"pktdump $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName
          .startsWith(".") && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString).sorted
      else Array(p.toString)
    files.map(f => PktDumpPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PktDumpReaderFactory(required.fieldNames)
}

case class PktDumpPartition(file: String) extends InputPartition

class PktDumpReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PktDumpReader(
      partition.asInstanceOf[PktDumpPartition].file, fields)
}

class PktDumpReader(file: String, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val needPayload = fields.contains("payload")
  private val in: DataInputStream = {
    val p = new Path(file)
    val s = new DataInputStream(p.getFileSystem(new Configuration())
      .open(p))
    val magic = s.readInt()
    val ver = s.readInt()
    if (magic != PktDump.MAGIC || ver != PktDump.VERSION) {
      s.close()
      throw new java.io.IOException(
        s"$file: not a pktdump v${PktDump.VERSION} file " +
          f"(magic 0x$magic%08x, version $ver)")
    }
    s
  }
  private var payload: Array[Byte] = _
  private var ts = 0L
  private var src = 0L

  override def next(): Boolean = {
    val len =
      try in.readInt()
      catch { case _: EOFException => return false }
    // length is UNTRUSTED file content: bound before allocating
    if (len < 0 || len > (64 << 20))
      throw new java.io.IOException(s"$file: bad packet length $len")
    ts = in.readLong()
    src = in.readInt().toLong & 0xffffffffL
    if (needPayload) {
      payload = new Array[Byte](len)
      in.readFully(payload)
    } else {
      in.skipNBytes(len.toLong)
    }
    true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "payload" => payload
      case "ts_sec"  => ts
      case "src_ip"  => src
      case other => // unreachable given the fixed schema
        UTF8String.fromString(other)
    })

  override def close(): Unit = in.close()
}
