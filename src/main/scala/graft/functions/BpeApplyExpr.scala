package graft.functions

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
  * Scale shape: the merge table is the tokenizer artifact — driver /
  * task-broadcast sized by definition (≤100K rows for real vocabs),
  * shipped once per task via the codegen reference array. Encoding is
  * a pure per-row map: no shuffle, no state, embarrassingly parallel,
  * and per-word cost is O(len²) scans with a per-THREAD word cache
  * (Zipf reuse makes the cache hit rate the dominant term — the same
  * trick HuggingFace's tokenizer uses). Work is independent of merge
  * count M: pair lookups are hash probes, so an 8K-vocab and a
  * 100K-vocab tokenizer encode at the same rate (SCALE.md r15).
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
final class BpeEncoder(val merges: Seq[(String, String)])
    extends Serializable {

  /** (l → (r → rank)); two-level so the hot adjacent-pair probe
    * allocates nothing. */
  @transient private lazy val rank
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val m = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
    var i = 0
    while (i < merges.length) {
      val (l, r) = merges(i)
      var inner = m.get(l)
      if (inner == null) {
        inner = new java.util.HashMap[String, Integer]()
        m.put(l, inner)
      }
      // first (lowest) rank wins if a pair is listed twice
      if (!inner.containsKey(r)) inner.put(r, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Per-thread bounded word→tokens cache. Thread-local because one
    * deserialized expression instance may serve several tasks on an
    * executor; bounded so an adversarial unique-word corpus cannot
    * grow it past [[BpeEncoder.CacheCap]] entries per thread. */
  @transient private lazy val cache
      : ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[UTF8String]]())

  private def rankOf(l: String, r: String): Int = {
    val inner = rank.get(l)
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
        val (l, r) = merges(bestRank)
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
    val c = cache.get()
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
    // pass 1: count output tokens (avoids growable-buffer churn)
    val parts = s.split(' ')
    var total = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) total += cachedEncode(parts(i)).length
      i += 1
    }
    val out = new Array[AnyRef](total)
    var o = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) {
        val enc = cachedEncode(parts(i))
        var j = 0
        while (j < enc.length) { out(o) = enc(j); o += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

object BpeEncoder {
  /** Per-thread word-cache entry bound. */
  val CacheCap = 1 << 15
}

/** `bpe_apply(text)` → array&lt;string&gt; of BPE tokens (see
  * [[BpeEncoder]] for semantics and the scale argument). NULL text →
  * NULL; empty / all-space text → empty array. */
case class BpeApplyExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got " +
        child.dataType.catalogString)

  @transient private lazy val encoder = new BpeEncoder(merges)

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
