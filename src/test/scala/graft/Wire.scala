package graft

import java.nio.ByteBuffer

/** Shared wire-packet byte builder for decoder-facing specs — ONE
  * encoding convention (Int → u16 big-endian, Long → u32, Byte/bytes/
  * ASCII literal) so specs can't silently drift onto different test
  * wire formats. */
object Wire {
  def bytes(parts: Any*): Array[Byte] = {
    val buf = ByteBuffer.allocate(4096)
    parts.foreach {
      case b: Byte        => buf.put(b)
      case i: Int         => buf.putShort(i.toShort) // u16
      case l: Long        => buf.putInt(l.toInt)     // u32
      case a: Array[Byte] => buf.put(a)
      case s: String      => buf.put(s.getBytes("US-ASCII"))
    }
    java.util.Arrays.copyOf(buf.array(), buf.position())
  }
}
