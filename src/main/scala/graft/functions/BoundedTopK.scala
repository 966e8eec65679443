package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded "k smallest values per group" aggregate — the rank-free
  * replacement for `row_number() OVER (PARTITION BY g ORDER BY v)`
  * when only the k smallest per group are wanted: a window rank SORTS
  * each whole group on one task (a pathological mega-group holding a
  * large corpus fraction becomes a single-task wall-clock/memory
  * hotspot), while this aggregate keeps O(k) state per group, is
  * map-side combined (each task contributes at most one ≤k-element
  * partial per group it touches), and never materializes or sorts the
  * group. Per input row the full-buffer fast path is one comparison
  * against the current k-th smallest — no allocation, no scan.
  *
  * Exact, deterministic, duplicate-preserving (a value occurring
  * twice in the k smallest occupies two slots — callers that feed
  * distinct keys get distinct representatives). Output: the group's k
  * smallest values, ascending. */
object BoundedTopK {

  class SmallestKAgg(k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 1, s"k=$k out of [1,∞)")

    override def zero: Array[Long] = Array.emptyLongArray

    // buffer invariant: ascending, length ≤ k
    override def reduce(buf: Array[Long], v: Long): Array[Long] = {
      val n = buf.length
      if (n == k && v >= buf(n - 1)) return buf // hot path: no alloc
      val ins = {
        val i = java.util.Arrays.binarySearch(buf, v)
        if (i >= 0) i else -(i + 1)
      }
      val outLen = math.min(k, n + 1)
      val out = new Array[Long](outLen)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1,
        math.min(n - ins, outLen - ins - 1))
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val outLen = math.min(k, a.length + b.length)
      val out = new Array[Long](outLen)
      var i = 0; var j = 0; var o = 0
      while (o < outLen) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          out(o) = a(i); i += 1
        } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** `smallestK(k)(col)` — usable in any `agg(...)`; partial
    * aggregation (map-side combine) comes from the typed-UDAF
    * machinery. Feed non-null values (a primitive-long input column —
    * filter NULLs upstream; group keys are untouched). */
  def smallestK(k: Int): UserDefinedFunction =
    udaf(new SmallestKAgg(k), Encoders.scalaLong)
}
