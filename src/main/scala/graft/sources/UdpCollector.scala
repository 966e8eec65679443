package graft.sources

import java.io.{DataOutputStream, File, FileOutputStream}
import java.net.{DatagramPacket, DatagramSocket, Inet4Address, InetSocketAddress}
import java.util.concurrent.atomic.AtomicLong

/** Live UDP ingest: the reference's collector `recvfrom` loop
  * (scapture.c:104-173) re-expressed for Spark's replayable-offset
  * contract.
  *
  * A Structured Streaming source must be able to REPLAY any committed
  * offset interval deterministically; a raw socket cannot (datagrams
  * are gone once read). The collector closes the gap with a
  * write-ahead spool: every datagram is appended to a dot-prefixed
  * staging segment in the pktdump on-disk format, and on rotation the
  * segment is atomically renamed to its final, zero-padded,
  * MONOTONICALLY-INCREASING name — exactly the naming contract
  * [[PktDumpMicroBatchStream]] documents. The live pipeline is then
  *
  * {{{
  *   val c = new UdpCollector(spoolDir, port = 2055)
  *   spark.readStream.format("pktdump").option("strict", "true")
  *     .load(spoolDir)                 // tails the spool exactly-once
  *     ... NetflowDecoder.decodeStream ... fwm ...
  * }}}
  *
  * with end-to-end exactly-once from the spool on: the socket→spool
  * hop has the same at-most-once semantics as the reference's UDP
  * collector (kernel-buffer overflow drops packets there too — size
  * `receiveBufferBytes` for the expected burst rate).
  *
  * Restart-safe: a new collector on an existing spool directory scans
  * for the highest segment name and continues numbering ABOVE it, so
  * rotation names stay monotone across collector restarts and the
  * streaming tail never sees a straggler.
  *
  * Rotation: by size (`rotateBytes`) or age (`rotateMillis`),
  * whichever trips first; an empty staging segment is never renamed
  * in (no zero-packet files). The receive loop wakes on a short
  * socket timeout so age-based rotation happens without traffic.
  */
final class UdpCollector(
    dir: String,
    port: Int = 0,
    bindHost: String = "127.0.0.1", // production: the exporter-facing if
    rotateBytes: Long = 64L << 20,
    rotateMillis: Long = 10_000L,
    receiveBufferBytes: Int = 4 << 20,
    maxPacketBytes: Int = 65_535) extends AutoCloseable {

  private val spool = new File(dir)
  require(spool.isDirectory || spool.mkdirs(), s"cannot create $dir")

  // writer exclusivity: two collectors on one spool would resume from
  // the same max segment number and clobber each other's staging files
  // — fail the SECOND one fast instead of corrupting silently. The OS
  // releases the lock on any exit, clean or not.
  private val lockChannel = java.nio.channels.FileChannel.open(
    new File(spool, ".writer.lock").toPath,
    java.nio.file.StandardOpenOption.CREATE,
    java.nio.file.StandardOpenOption.WRITE)
  private val writerLock =
    try Option(lockChannel.tryLock()).getOrElse {
      lockChannel.close()
      throw new IllegalStateException(
        s"another collector is already writing to $dir")
    } catch {
      // same-JVM overlap THROWS instead of returning null
      case _: java.nio.channels.OverlappingFileLockException =>
        lockChannel.close()
        throw new IllegalStateException(
          s"another collector is already writing to $dir")
    }

  // any post-lock constructor failure (port in use, unwritable spool)
  // must release the lock before rethrowing: the OS only frees it on
  // process exit, so a leaked lock turns a same-JVM retry on the same
  // spool into a misleading "another collector is already writing"
  private def releasingLockOnFailure[A](body: => A): A =
    try body
    catch { case e: Throwable =>
      try { writerLock.release(); lockChannel.close() }
      catch { case _: Throwable => () } // the original failure wins
      throw e
    }

  private val socket = releasingLockOnFailure {
    val s = new DatagramSocket(new InetSocketAddress(bindHost, port))
    s.setReceiveBufferSize(receiveBufferBytes)
    s.setSoTimeout(50) // wake to check the rotation deadline
    s
  }

  /** Bound port (useful with port = 0 → ephemeral, tests). */
  def localPort: Int = socket.getLocalPort

  /** Packets spooled since start (diagnostic). */
  val packetsReceived = new AtomicLong(0)

  // resume numbering above any segment already in the spool so names
  // stay monotone across collector restarts — INCLUDING a staging
  // orphan a crashed collector left behind: its packets are durably on
  // disk, so rename it in (the reader handles a truncated tail) rather
  // than truncating it by reopening the same staging name. Empty
  // orphans (header only) are deleted.
  private val SegName = raw"seg-(\d{12})\.gpkd".r
  private val StagingName = raw"\.seg-(\d{12})\.gpkd".r
  private var seq: Long = releasingLockOnFailure {
    try initialSeq()
    catch { case e: Throwable => socket.close(); throw e }
  }

  private def initialSeq(): Long = {
    Option(spool.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case StagingName(n) =>
          if (f.length() <= 8) { f.delete(); () }
          else if (!f.renameTo(new File(spool, s"seg-$n.gpkd")))
            throw new java.io.IOException(
              s"cannot recover orphaned staging segment $f")
        case _ => ()
      }
    }
    val existing = Option(spool.list()).getOrElse(Array.empty).collect {
      case SegName(n) => n.toLong
    }
    if (existing.isEmpty) 0L else existing.max + 1
  }

  private var staging: File = _
  private var out: DataOutputStream = _
  private var stagedBytes = 0L
  private var stagedPackets = 0
  private var segStartMs = 0L

  private def openSegment(): Unit = {
    staging = new File(spool, f".seg-$seq%012d.gpkd")
    // buffered: one syscall per ~64 KB, not four per packet — the
    // receive thread must keep up with the socket at 10^5+ pkt/s
    out = new DataOutputStream(new java.io.BufferedOutputStream(
      new FileOutputStream(staging), 64 << 10))
    out.writeInt(PktDump.MAGIC)
    out.writeInt(PktDump.VERSION)
    stagedBytes = 8L
    stagedPackets = 0
    segStartMs = System.currentTimeMillis()
  }

  /** Close the staging segment; rename it in if it has packets. */
  private def rotate(): Unit = {
    out.close()
    if (stagedPackets == 0) { staging.delete(); () }
    else {
      val fin = new File(spool, f"seg-$seq%012d.gpkd")
      if (!staging.renameTo(fin))
        throw new java.io.IOException(s"rename $staging -> $fin failed")
      seq += 1
    }
    openSegment()
  }

  @volatile private var running = true
  @volatile private var writerError: Throwable = null
  private val thread = new Thread(() => {
    val buf = new Array[Byte](maxPacketBytes)
    val pkt = new DatagramPacket(buf, buf.length)
    // openSegment sits INSIDE the guarded region: a spool that is full
    // or unwritable at startup must surface through writerError (and
    // make close() throw), not kill the thread silently while the
    // socket keeps accepting-and-dropping for the collector's lifetime
    try {
      openSegment()
      while (running) {
        val got =
          try { socket.receive(pkt); true }
          catch {
            case _: java.net.SocketTimeoutException => false
            case _: java.net.SocketException if !running => false
          }
        if (got) {
          // the segment age clock starts at the FIRST packet, not at
          // open: an idle period must not count against the new segment
          // (otherwise sparse traffic rotates a 1-packet file per
          // datagram — one tiny scan partition each)
          if (stagedPackets == 0) segStartMs = System.currentTimeMillis()
          val ts = System.currentTimeMillis() / 1000L
          val src = pkt.getAddress match {
            case v4: Inet4Address =>
              java.nio.ByteBuffer.wrap(v4.getAddress).getInt.toLong &
                0xffffffffL
            case _ => 0L // v6 exporter: no 4-byte slot (format is v4-only)
          }
          out.writeInt(pkt.getLength)
          out.writeLong(ts)
          out.writeInt(src.toInt)
          out.write(pkt.getData, pkt.getOffset, pkt.getLength)
          stagedBytes += 16L + pkt.getLength
          stagedPackets += 1
          packetsReceived.incrementAndGet()
        }
        if (stagedBytes >= rotateBytes ||
            (stagedPackets > 0 &&
              System.currentTimeMillis() - segStartMs >= rotateMillis))
          rotate()
      }
    } catch { case e: Throwable => writerError = e
    } finally {
      // final flush — also on an unexpected loop death, so packets
      // already spooled to staging are never stranded (out is null iff
      // openSegment itself failed: nothing staged, nothing to flush)
      try {
        if (out != null) {
          out.close()
          if (stagedPackets == 0) { staging.delete(); () }
          else if (!staging.renameTo(
              new File(spool, f"seg-$seq%012d.gpkd")))
            throw new java.io.IOException(
              s"final rename of $staging failed")
        }
      } catch { case e: Throwable =>
        if (writerError == null) writerError = e }
    }
  }, s"udp-collector-$dir")
  thread.setDaemon(true)
  thread.start()

  /** Stop receiving, flush the open segment, release the port.
    * Blocks until the spool is complete (safe to read afterwards);
    * throws if the writer died or its final flush failed — a silent
    * return MUST mean every received packet is durably in the spool. */
  override def close(): Unit = {
    running = false
    socket.close() // unblocks a receive parked inside the timeout
    thread.join(10_000)
    try {
      if (thread.isAlive)
        throw new java.io.IOException(
          "udp collector writer did not finish within 10 s; " +
            "the last segment may be incomplete")
      if (writerError != null)
        throw new java.io.IOException(
          "udp collector writer failed; spool may be incomplete",
          writerError)
    } finally {
      writerLock.release()
      lockChannel.close()
    }
  }
}
