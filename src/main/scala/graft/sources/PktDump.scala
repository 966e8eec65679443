package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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

  /** The session's Hadoop conf when a session is up (spark.hadoop.*,
    * fs.defaultFS, object-store credentials), else a default. */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Reference writer (collector-side / tests): one dump file. */
  def write(path: String,
            packets: Seq[(Array[Byte], Long, Long)]): Unit = {
    val conf = hadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(MAGIC)
      out.writeInt(VERSION)
      packets.foreach { case (payload, ts, src) =>
        // src is stored as 4 bytes on the wire: IPv4-only by format
        require(src >= 0 && src <= 0xffffffffL,
          s"pktdump src must be an IPv4 address as u32, got $src")
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
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new PktDumpScanBuilder(
      Option(path).getOrElse(options.get("path")),
      options.getBoolean("strict", false))
}

class PktDumpScanBuilder(path: String, strict: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PktDump.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PktDumpScan(path, required, strict)
}

class PktDumpScan(path: String, required: StructType,
                  strict: Boolean = false)
    extends Scan with Batch {
  // the SESSION's Hadoop conf, captured at scan build on the driver and
  // shipped to executors — a bare `new Configuration()` would drop
  // spark.hadoop.* (object-store credentials, fs.defaultFS)
  private val conf = new SerializableConfiguration(PktDump.hadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"pktdump $path cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    PktDumpScan.listFiles(path, conf.value)
      .map(f => PktDumpPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new PktDumpReaderFactory(required.fieldNames, conf)

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new PktDumpMicroBatchStream(path, required.fieldNames, conf, strict)
}

object PktDumpScan {
  /** Sorted visible dump files (dot/underscore prefixes hidden — the
    * collector's write-then-rename staging convention). */
  def listFiles(path: String, conf: Configuration): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName
        .startsWith(".") && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.toString).sorted
    else Array(p.toString)
  }
}

/** Streaming tail of a capture directory — the standard collector
  * handoff: the collector writes a dump to a dot-prefixed staging name
  * and RENAMES it in when the rotation period closes; each micro-batch
  * picks up the files that appeared since the last offset.
  *
  * ==NAMING CONTRACT (read this before pointing a collector here)==
  * Offset = lexicographic high-water mark of processed file names, so
  * rotation MUST use monotonically increasing names — zero-padded
  * timestamped names (`dump-20260101T000500.pkt`), the universal
  * rotation convention, are. A collector whose names are NOT monotone
  * (unpadded counters rolling 9→10, clock-skewed writers, manual
  * copies) will have files land at or below the watermark and be
  * PERMANENTLY SKIPPED: warned once per name (capped at 100K names,
  * silent past the cap), never ingested. With the read option
  * `strict=true` such a straggler instead FAILS the query
  * (StreamingQueryException) so the operator must resolve the naming
  * rather than lose data. Replay from checkpoint re-lists
  * deterministically because the offset pins the (start, end] name
  * interval.
  *
  * Restart blind spot: the first listing after a (re)start is exempt
  * from straggler detection — on a fresh start those files form the
  * initial batch, and on a checkpoint restart they were already
  * processed, so neither is a skip. The cost: a file late-renamed to
  * below the watermark WHILE THE QUERY WAS DOWN is indistinguishable
  * from an already-processed file (the store would have to persist the
  * full processed-name set to tell them apart) and is dropped with no
  * warning and no strict-mode failure. Monotone naming makes the case
  * unreachable. */
class PktDumpMicroBatchStream(path: String, fields: Array[String],
                              conf: SerializableConfiguration =
                                new SerializableConfiguration(
                                  PktDump.hadoopConf()),
                              strict: Boolean = false)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // offset payload: one JSON string (the watermark file name)
  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  private def unesc(j: String): String = {
    require(j.length >= 2 && j.head == '"' && j.last == '"',
      s"bad pktdump offset: $j")
    val b = new StringBuilder
    var i = 1
    while (i < j.length - 1) {
      j(i) match {
        case '\\' =>
          j(i + 1) match {
            case 'u' =>
              b += Integer.parseInt(j.substring(i + 2, i + 6), 16).toChar
              i += 5
            case c => b += c; i += 1
          }
        case c => b += c
      }
      i += 1
    }
    b.toString
  }

  private case class Mark(last: String) extends Offset {
    override def json(): String = esc(last)
  }

  // latestOffset must be MONOTONE: a transient empty/partial listing
  // (retention job, eventually-consistent store) would otherwise
  // regress the watermark and re-ingest names at or below it on their
  // reappearance. Offsets restored from checkpoint flow through
  // deserializeOffset, so the clamp survives restarts too.
  @volatile private var high = ""
  private def bump(v: String): String = synchronized {
    if (v > high) high = v
    high
  }

  // always the epoch: the engine may probe latestOffset() BEFORE
  // asking for the initial offset of a fresh (checkpoint-less) query,
  // and the first batch must still cover everything already present
  override def initialOffset(): Offset = Mark("")

  // a STRAGGLER is a file newly appearing at or below a watermark
  // established before it existed (a rename that completed after a
  // later-named file was ingested): permanently skipped by design —
  // but never silently. Warned once per name. The FIRST listing is
  // exempt: on a fresh start its files go into the initial batch, and
  // on a checkpoint restart they were already processed — neither is a
  // skip (without the exemption, a restart would log one false alarm
  // per rotated file in the directory).
  @volatile private var prevListing: Set[String] = null
  private val warnedBelow = new java.util.HashSet[String]()

  override def latestOffset(): Offset = {
    val fs = PktDumpScan.listFiles(path, conf.value)
    val prevHigh = high
    val mark = bump(if (fs.isEmpty) "" else fs.max)
    if (prevListing != null) fs.foreach { f =>
      if (f <= prevHigh && !prevListing.contains(f)) {
        if (strict)
          throw new IllegalStateException(
            s"pktdump strict mode: $f appeared at or below the " +
              s"watermark ($prevHigh) and would never be ingested — " +
              "the collector's rotation names are not monotone")
        if (warnedBelow.size < 100000 && warnedBelow.add(f))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"pktdump: $f appeared at or below the watermark " +
              s"($prevHigh) and will NOT be ingested (late rename?)")
      }
    }
    prevListing = fs.toSet
    Mark(mark)
  }

  // ---- Trigger.AvailableNow (SupportsTriggerAvailableNow): without
  // this, Spark >= 3.4's generic wrapper pins ONE batch and terminates
  // as soon as it commits — the engine never gets the extra batch a
  // watermark-closed Append window needs to flush, so a windowed agg
  // over this source would end with data committed but nothing emitted
  // (observed as q81's 0-row memory sink on 4.1.2). Pinning the listing
  // ourselves keeps multi-batch execution + the no-data flush batch.
  @volatile private var pinned: String = null

  override def prepareForTriggerAvailableNow(): Unit = {
    pinned = latestOffset().asInstanceOf[Mark].last
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control variant the engine uses once
    * SupportsAdmissionControl is in play: everything up to the pinned
    * end under AvailableNow (files appearing after prepare are the
    * NEXT run's work, per the trigger's contract), live listing
    * otherwise. ReadLimit is allAvailable-only for a file-granular
    * source. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    if (pinned != null) Mark(pinned) else latestOffset()

  override def reportLatestOffset(): Offset = Mark(high)

  override def deserializeOffset(json: String): Offset = {
    // seed the monotone clamp from checkpoint-restored offsets, but
    // return the DESERIALIZED value itself — the engine rebuilds batch
    // START offsets through here, and substituting the high-water mark
    // would collapse every restored interval to empty
    val v = unesc(json)
    bump(v)
    Mark(v)
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[Mark].last
    val hi = end.asInstanceOf[Mark].last
    PktDumpScan.listFiles(path, conf.value)
      .filter(f => f > lo && f <= hi)
      .map(f => PktDumpPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PktDumpReaderFactory(fields, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PktDumpPartition(file: String) extends InputPartition

class PktDumpReaderFactory(fields: Array[String],
                           conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PktDumpReader(
      partition.asInstanceOf[PktDumpPartition].file, fields, conf.value)
}

class PktDumpReader(file: String, fields: Array[String],
                    conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val needPayload = fields.contains("payload")
  // projection: per-record work is index lookups, not string matches
  private val slots: Array[Int] = fields.map {
    case "payload" => 0
    case "ts_sec"  => 1
    case "src_ip"  => 2
    case other => throw new IllegalArgumentException(
      s"unknown pktdump column $other")
  }
  private val in: DataInputStream = {
    val p = new Path(file)
    val s = new DataInputStream(p.getFileSystem(conf).open(p))
    try {
      val magic = s.readInt()
      val ver = s.readInt()
      if (magic != PktDump.MAGIC || ver != PktDump.VERSION)
        throw new java.io.IOException(
          s"$file: not a pktdump v${PktDump.VERSION} file " +
            f"(magic 0x$magic%08x, version $ver)")
      s
    } catch {
      // close on ANY header failure (incl. a <8-byte file's EOF, which
      // would otherwise surface as a bare EOFException AND leak the
      // stream — Spark never closes a reader whose constructor threw)
      case e: Exception =>
        s.close()
        throw (e match {
          case _: EOFException => new java.io.IOException(
            s"$file: not a pktdump v${PktDump.VERSION} file " +
              "(shorter than the 8-byte header)")
          case other => other
        })
    }
  }
  private var payload: Array[Byte] = _
  private var ts = 0L
  private var src = 0L

  override def next(): Boolean = {
    val len =
      try in.readInt()
      catch { case _: EOFException => return false } // clean EOF
    // length is UNTRUSTED file content: bound before allocating
    if (len < 0 || len > (64 << 20))
      throw new java.io.IOException(s"$file: bad packet length $len")
    try {
      ts = in.readLong()
      src = in.readInt().toLong & 0xffffffffL
      if (needPayload) {
        payload = new Array[Byte](len)
        in.readFully(payload)
      } else {
        in.skipNBytes(len.toLong)
      }
      true
    } catch {
      case _: EOFException =>
        // EOF past the first readInt is a truncated trailing record —
        // the expected shape of a dump cut off by a collector crash.
        // Keep the file's complete records, drop the partial tail.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"pktdump: $file ends with a truncated record; " +
            "dropping the partial tail")
        false
    }
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](slots.length)
    var i = 0
    while (i < slots.length) {
      vals(i) = slots(i) match {
        case 0 => payload
        case 1 => ts
        case _ => src
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  override def close(): Unit = in.close()
}
