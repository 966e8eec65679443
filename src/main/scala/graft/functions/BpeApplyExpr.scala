package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION — encode text with an already-trained
  * merge list (the inference path: at corpus scale the tokenizer is
  * trained once on a sample, then every document is encoded with the
  * frozen merge table).
  *
  * Algorithm: the canonical greedy-rank apply (GPT-2's `bpe()` /
  * sentencepiece-style): per whitespace word, start from code-point
  * symbols and repeatedly merge every non-overlapping left-to-right
  * occurrence of the LOWEST-RANK pair currently present, until no
  * listed pair remains. For a self-consistent trained list (a merge
  * producing token t always precedes merges consuming t — what
  * [[graft.operators.TextAnalysis.bpeMerges]] emits by construction)
  * this equals replaying the merges in training order; for arbitrary
  * lists the rank-priority semantics win (a later merge can create a
  * pair an earlier rank wants — the canonical algorithm goes back for
  * it; BpeApplySpec pins the divergence case).
  *
  * Scale shape: the merge table is the tokenizer artifact — bounded
  * by vocabulary size (≤100K rows for production vocabs), never by
  * data. When a SparkSession is active at construction it ships as a
  * real `SparkContext.broadcast` — once per executor, cached by the
  * BlockManager — so the per-task serialized payload is a handle, not
  * 2×100K strings (the naive task-binary route measured ~0.1 s of
  * deserialization PER TASK at 100K merges — per-stage wall noise
  * locally, a real tax across a million tasks; SCALE.md r15).
  * Executor-side derived state — the two-level rank map and the
  * per-thread word cache — is additionally MEMOIZED process-wide by
  * content digest ([[BpeEncoder.built]]), so it builds once per JVM
  * and survives across stages and queries using the same tokenizer.
  * Encoding itself is a pure per-row map: no shuffle, no state,
  * embarrassingly parallel, per-word O(len²) scans with the cache
  * riding Zipf reuse (the same trick HuggingFace's tokenizer uses),
  * and throughput independent of merge count M — pair lookups are
  * hash probes.
  *
  * Why a native Expression and not composed functions: rank-priority
  * needs a loop-until-fixpoint per word with a data-dependent trip
  * count over an M-row table — `aggregate`-fold composition would
  * need one fold stage PER MERGE nested in a single projection
  * (codegen blows up past tens of merges, and a when-chain batch is
  * only sound for symbol-disjoint batches, which arbitrary rank order
  * does not grant). One virtual call per row into a tight JVM loop
  * keeps the projection inside whole-stage codegen.
  */
final class BpeEncoder private (
    /** Inline payload — only when no session was active at
      * construction (driver-local use); null when broadcast. */
    private val inline: (Array[String], Array[String]),
    private val bc: Broadcast[(Array[String], Array[String])],
    /** Content digest — memo key for executor-side derived state and
      * this encoder's identity (expression equality rides on it).
      * Computed ONCE driver-side. */
    val digest: String)
    extends Serializable {

  override def equals(o: Any): Boolean = o match {
    case e: BpeEncoder => e.digest == digest
    case _             => false
  }
  override def hashCode(): Int = digest.hashCode

  @transient private lazy val state: BpeEncoder.State =
    BpeEncoder.stateFor(digest,
      () => if (bc != null) bc.value else inline)

  private def rankOf(l: String, r: String): Int = {
    val inner = state.rank.get(l)
    if (inner == null) Int.MaxValue
    else {
      val v = inner.get(r)
      if (v == null) Int.MaxValue else v.intValue()
    }
  }

  /** Greedy-rank encode of one word (no cache). */
  private[graft] def encodeWord(w: String): Array[UTF8String] = {
    // code-point symbols (Spark substr / DuckDB w[i] both index by
    // character, not UTF-16 unit)
    var toks = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      toks.add(w.substring(i, i + n))
      i += n
    }
    var done = toks.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < toks.size - 1) {
        val r = rankOf(toks.get(j), toks.get(j + 1))
        if (r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val l = state.lefts(bestRank)
        val r = state.rights(bestRank)
        val out = new java.util.ArrayList[String](toks.size)
        var k = 0
        while (k < toks.size) {
          if (k < toks.size - 1 && toks.get(k) == l &&
              toks.get(k + 1) == r) {
            out.add(l + r)
            k += 2
          } else {
            out.add(toks.get(k))
            k += 1
          }
        }
        toks = out
        done = toks.size < 2
      }
    }
    val res = new Array[UTF8String](toks.size)
    var t = 0
    while (t < res.length) {
      res(t) = UTF8String.fromString(toks.get(t))
      t += 1
    }
    res
  }

  private def cachedEncode(w: String): Array[UTF8String] = {
    val c = state.cache.get()
    var r = c.get(w)
    if (r == null) {
      r = encodeWord(w)
      if (c.size() < BpeEncoder.CacheCap) c.put(w, r)
    }
    r
  }

  /** Whitespace-split (single-space, empties dropped — the
    * [[graft.operators.TextAnalysis.tokens]] contract) then per-word
    * encode; returns the concatenated token array. Called from
    * generated code. */
  def encodeText(text: UTF8String): ArrayData = {
    val s = text.toString
    val parts = s.split(' ')
    // encode each word ONCE (a full cache would otherwise re-run the
    // O(len²) encode on a second counting pass), keep the per-word
    // arrays, then flatten into the exactly-sized output
    val enc = new Array[Array[UTF8String]](parts.length)
    var total = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        enc(i) = cachedEncode(parts(i))
        total += enc(i).length
      }
      i += 1
    }
    val out = new Array[AnyRef](total)
    var o = 0
    i = 0
    while (i < parts.length) {
      val e = enc(i)
      if (e != null) {
        var j = 0
        while (j < e.length) { out(o) = e(j); o += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object BpeEncoder {
  /** Per-thread word-cache entry bound. */
  val CacheCap = 1 << 15

  /** Process-wide derived-state memos retained (distinct tokenizers
    * per JVM are few). Past the cap the LEAST-RECENTLY-USED entry
    * evicts — never a full clear, which would degrade the cache to
    * useless exactly when most loaded. Correctness is unaffected
    * either way: an evicted state just rebuilds on next use. */
  private val MemoCap = 16

  /** Total derived-state builds this JVM — observability hook the
    * LRU spec pins eviction behavior with. */
  private[graft] val buildCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private[functions] final class State(
      val lefts: Array[String],
      val rights: Array[String],
      val rank: java.util.HashMap[String, java.util.HashMap[String, Integer]],
      val cache: ThreadLocal[java.util.HashMap[String, Array[UTF8String]]])

  /** digest → derived state, shared across stages / queries / encoder
    * instances for the same merge list. Access-ordered LinkedHashMap:
    * get() refreshes recency, insert past MemoCap drops the eldest.
    * Guarded by its own monitor — builds are rare (once per tokenizer
    * per JVM) and holding the lock through a build also collapses
    * concurrent duplicate builds of the same digest. */
  private val built =
    new java.util.LinkedHashMap[String, State](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, State]): Boolean =
        size() > MemoCap
    }

  private[functions] def stateFor(
      digest: String,
      payload: () => (Array[String], Array[String])): State = {
    val hit = built.synchronized(built.get(digest))
    if (hit != null) return hit
    // the payload fetch can be a BROADCAST network pull (seconds,
    // cold executor) — never hold the global memo lock through it, or
    // every other thread's pure cache hit stalls behind one fetch.
    // buildState itself stays under the lock: CPU-bound, and holding
    // it collapses concurrent duplicate builds of the same digest.
    val (l, r) = payload()
    built.synchronized {
      val again = built.get(digest)
      if (again != null) again
      else {
        val s = buildState(l, r)
        built.put(digest, s)
        s
      }
    }
  }

  private def buildState(lefts: Array[String],
                         rights: Array[String]): State = {
    buildCount.incrementAndGet()
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    while (i < lefts.length) {
      var inner = m.get(lefts(i))
      if (inner == null) {
        inner = new java.util.HashMap[String, Integer]()
        m.put(lefts(i), inner)
      }
      // first (lowest) rank wins if a pair is listed twice
      if (!inner.containsKey(rights(i))) inner.put(rights(i), i)
      i += 1
    }
    new State(lefts, rights, m, ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[UTF8String]]()))
  }

  private def digestOf(lefts: Array[String],
                       rights: Array[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(4)
    def put(s: String): Unit = {
      md.update(buf.clear().putInt(s.length).array())
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    put(lefts.length.toString)
    lefts.foreach(put)
    rights.foreach(put)
    md.digest().map("%02x".format(_)).mkString
  }

  /** digest → broadcast handle, driver-side: the same tokenizer used
    * across many queries broadcasts ONCE (and re-broadcasting per
    * query would also leak executor block-store entries). Same LRU
    * policy as [[built]]; an evicted live-app broadcast unpersists
    * (executors re-fetch on next use, correctness unaffected) and a
    * dead-context entry (tests stop/recreate sessions) just drops —
    * unpersist on a stopped SparkContext throws, so it's swallowed. */
  private val bcMemo = new java.util.LinkedHashMap[
    String, Broadcast[(Array[String], Array[String])]](32, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String,
          Broadcast[(Array[String], Array[String])]]): Boolean = {
      val evict = size() > MemoCap
      if (evict)
        try e.getValue.unpersist(blocking = false)
        catch { case _: Exception => () }
      evict
    }
  }

  def apply(merges: Seq[(String, String)]): BpeEncoder = {
    val arrays = (merges.map(_._1).toArray, merges.map(_._2).toArray)
    val digest = digestOf(arrays._1, arrays._2)
    SparkSession.getActiveSession match {
      case Some(s) =>
        // key includes the application id: a memoized broadcast must
        // not outlive its SparkContext (tests stop/recreate sessions)
        val key = s.sparkContext.applicationId + ":" + digest
        val bc = bcMemo.synchronized {
          val cur = bcMemo.get(key)
          if (cur != null) cur
          else {
            val b = s.sparkContext.broadcast(arrays)
            bcMemo.put(key, b)
            b
          }
        }
        new BpeEncoder(null, bc, digest)
      case None => new BpeEncoder(arrays, null, digest)
    }
  }
}

/** `bpe_apply(text)` → array&lt;string&gt; of BPE tokens (see
  * [[BpeEncoder]] for semantics and the scale argument). NULL text →
  * NULL; empty / all-space text → empty array. */
case class BpeApplyExpr(child: Expression, encoder: BpeEncoder)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got " +
        child.dataType.catalogString)

  override def nullSafeEval(t: Any): Any =
    encoder.encodeText(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeEncoder].getName)
    nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.encodeText($in);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeApplyExpr {
  def apply(child: Expression,
            merges: Seq[(String, String)]): BpeApplyExpr =
    BpeApplyExpr(child, BpeEncoder(merges))
}
