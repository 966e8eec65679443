package graft

import graft.functions.{BpeApplyExpr, BpeEncoder}
import graft.operators.TextAnalysis
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** BPE APPLICATION (the inference path): canonical greedy-rank apply
  * of a frozen merge list, pinned against a direct transliteration of
  * the algorithm and against hand-computed cases — including the case
  * where rank-priority DIVERGES from training-order replay. */
class BpeApplySpec extends SparkTest {

  private def enc(merges: (String, String)*)(w: String): Seq[String] =
    BpeEncoder(merges).encodeWord(w).toSeq.map(_.toString)

  private def applyCol(text: String,
                       merges: Seq[(String, String)]): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(TextAnalysis.bpeApply(col("text"), merges).as("toks"))
      .collect()(0).getSeq[String](0)
  }

  test("greedy-rank apply: hand-computed sequences") {
    // rank order decides, not adjacency order
    assert(enc(("a", "b"), ("ab", "c"))("abcabc") ==
      Seq("abc", "abc"))
    // leftmost non-overlapping within one pair's pass
    assert(enc(("a", "a"))("aaaa") == Seq("aa", "aa"))
    assert(enc(("a", "a"))("aaaaa") == Seq("aa", "aa", "a"))
    // no applicable merge → code-point symbols
    assert(enc(("x", "y"))("abc") == Seq("a", "b", "c"))
    // single char / empty edge
    assert(enc(("a", "b"))("a") == Seq("a"))
    assert(enc(("a", "b"))("") == Seq())
  }

  test("rank-priority diverges from training-order replay (canonical wins)") {
    // merges: rank 1 = (ab, c), rank 2 = (a, b).
    // Training-order replay of "abc": rank 1 finds no "ab" token yet
    // (symbols are a|b|c) → skip; rank 2 → [ab, c]. Final [ab, c].
    // Canonical greedy-rank: merge lowest rank PRESENT: (a,b) → [ab, c];
    // now (ab,c) rank 1 IS present → [abc]. GPT-2's bpe() returns
    // ["abc"] here — rank order can reach back.
    assert(enc(("ab", "c"), ("a", "b"))("abc") == Seq("abc"))
  }

  test("duplicate pair listed twice: lowest rank wins, encode unaffected") {
    assert(enc(("a", "b"), ("a", "b"))("ab") == Seq("ab"))
  }

  test("expression: tokens() split contract, null, codegen == interpreted") {
    import spark.implicits._
    val merges = Seq(("a", "b"), ("ab", "c"))
    // multi-space runs collapse (empties dropped), like tokens()
    assert(applyCol("ab  abc   x", merges) == Seq("ab", "abc", "x"))
    assert(applyCol("", merges) == Seq())
    assert(applyCol("   ", merges) == Seq())
    // NULL text → NULL array
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.bpeApply(col("text"), merges).as("toks"))
      .collect()(0)
    assert(nullRow.isNullAt(0))
    // interpreted eval path (Expression.eval, no codegen) agrees with
    // the Column (whole-stage codegen) path
    val e = BpeApplyExpr(GraftBridge.lower(lit("abcab ab")), merges)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    assert(interp == applyCol("abcab ab", merges))
    assert(interp == Seq("abc", "ab", "ab"))
  }

  test("randomized: expression == direct transliteration; invariants hold") {
    // reference implementation: straight-line port of the canonical
    // algorithm over immutable Seqs (no cache, no ArrayData)
    def ref(merges: Seq[(String, String)], w: String): Seq[String] = {
      val rank = merges.zipWithIndex.reverse.toMap // first occurrence wins
      var toks: Seq[String] = w.map(_.toString)
      var done = toks.size < 2
      while (!done) {
        val present = toks.zip(toks.tail).flatMap(p => rank.get(p).map(p -> _))
        if (present.isEmpty) done = true
        else {
          val (l, r) = present.minBy(_._2)._1
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < toks.size) {
            if (i < toks.size - 1 && toks(i) == l && toks(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
          done = toks.size < 2
        }
      }
      toks
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (_ <- 1 to 300) {
      val nm = 1 + rnd.nextInt(6)
      // merges over short strings so created tokens collide/compose
      val merges = Seq.fill(nm) {
        def tok() = Seq.fill(1 + rnd.nextInt(2))(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        (tok(), tok())
      }
      val w = Seq.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = enc(merges: _*)(w)
      assert(got == ref(merges, w), s"merges=$merges w=$w")
      // invariants: concatenation reconstructs the word; fixpoint —
      // no listed pair survives in the output
      assert(got.mkString == w)
      val rankSet = merges.toSet
      assert(!got.zip(got.drop(1)).exists(rankSet.contains),
        s"mergeable pair survived: merges=$merges w=$w got=$got")
    }
  }

  test("self-consistent trained merges: apply == training segmentation") {
    import spark.implicits._
    // For a merge list the trainer itself emitted, greedy-rank apply
    // of the TRAINING corpus must reproduce bpeVocab's histogram (a
    // merge producing token t precedes every merge consuming t, so
    // priority == training order — the scaladoc's argument, machine-
    // checked here).
    val corpus = Seq("aaab aaab ab ba", "abab aaab ba ba").toDF("text")
    val merges = TextAnalysis.bpeMerges(corpus, "text", 8)
      .orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val viaApply = corpus
      .select(explode(TextAnalysis.bpeApply(col("text"), merges))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaTrain = TextAnalysis.bpeVocab(corpus, "text", 8)
      .orderBy(col("token")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaApply == viaTrain)
  }

  test("derived-state memo is LRU: cycling past the cap evicts eldest, " +
    "not everything (recent tokenizers never rebuild)") {
    // 17 distinct tokenizers (cap is 16): unique merge pairs per i so
    // every digest is fresh in this JVM
    def merges(i: Int) = Seq((s"lru$i", s"x$i"), (s"y$i", s"z$i"))
    def touch(i: Int): Unit = {
      // a FRESH encoder instance each time — the per-instance lazy
      // state must go back through the shared memo
      BpeEncoder(merges(i)).encodeText(
        UTF8String.fromString(s"lru${i}x$i plain")); ()
    }
    val c0 = BpeEncoder.buildCount.get()
    (1 to 17).foreach(touch)
    assert(BpeEncoder.buildCount.get() == c0 + 17)
    // under the old clear-at-cap policy the 17th insert wiped 1..16;
    // LRU keeps 2..17, so reusing them rebuilds NOTHING
    (2 to 17).foreach(touch)
    assert(BpeEncoder.buildCount.get() == c0 + 17,
      "recently-used tokenizer states were evicted and rebuilt")
    // the evicted eldest (1) does rebuild — exactly one extra build
    touch(1)
    assert(BpeEncoder.buildCount.get() == c0 + 18)
  }
}
