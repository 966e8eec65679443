package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** BPE vocabulary training: hand-computed merge sequences. */
class BpeSpec extends SparkTest {
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("text", StringType, false))))
  }

  test("bpeMerges: deterministic winners, leftmost fold, early stop") {
    // words: aaab ×2, ab ×1
    //  step 1: (a,a) freq 4 beats (a,b) freq 3  → aaab = [aa,a,b]
    //  step 2: (a,b) freq 3 beats (aa,a) freq 2 → aaab = [aa,ab], ab = [ab]
    //  step 3: (aa,ab) freq 2                   → aaab = [aaab]
    //  then no pairs remain: early stop well before numMerges=10
    val df = docs(1L -> "aaab aaab ab")
    val out = TextAnalysis.bpeMerges(df, "text", 10)
      .orderBy(col("step"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(out == Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L),
      (3L, "aa", "ab", 2L)))
  }

  test("bpeMerges: ties break lexicographically; 'aaaa' merges non-overlapping") {
    // "xy yx" : (x,y) and (y,x) both freq 1 → (x,y) wins on (l, r)
    val tie = TextAnalysis.bpeMerges(docs(1L -> "xy yx"), "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(tie == Seq(("x", "y")))
    // "aaaa": (a,a) freq 3; leftmost non-overlap → [aa][aa], so the
    // SECOND merge is (aa,aa), never (aa,a)
    val aa = TextAnalysis.bpeMerges(docs(1L -> "aaaa"), "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(aa == Seq(("a", "a"), ("aa", "aa")))
  }


  test("bpeVocab: the encoded-corpus histogram after the merges") {
    // after the 3 learned merges, aaab and ab are single tokens
    val v = TextAnalysis.bpeVocab(docs(1L -> "aaab aaab ab"), "text", 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("aaab" -> 2L, "ab" -> 1L))
    // with ONE merge only, words are partially encoded: [aa,a,b] x2 + [a,b]
    val v1 = TextAnalysis.bpeVocab(docs(1L -> "aaab aaab ab"), "text", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v1 == Map("aa" -> 2L, "a" -> 3L, "b" -> 3L))
  }
}
