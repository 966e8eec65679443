package graft

import graft.operators.{Contamination, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the corpus-hygiene operators: repetition
  * metrics, benchmark contamination, source vocabulary overlap. */
class ContaminationSpec extends SparkTest {

  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String, String)*) = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      rows.map { case (i, t, s) => Row(i, t, s) }.asJava,
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("text", StringType, false),
        StructField("source", StringType, false))))
  }

  test("repetitionMetrics: bigram counts on a repetitious doc") {
    // "a b a b a" → bigrams: "a b","b a","a b","b a" → n=4, top=2, dup=4
    val df = docs((1L, "a b a b a", "s"), (2L, "x y z", "s"))
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: top_bp = 10000*2/4 = 5000, dup_bp = 10000*4/4 = 10000
    assert(m(1L) == ((4L, 5000L, 10000L)))
    // doc 2: "x y","y z" distinct → top 1/2=5000, dup 0
    assert(m(2L) == ((2L, 5000L, 0L)))
  }

  test("repetitionMetrics: doc shorter than n yields zero row") {
    val df = docs((1L, "one", "s"))
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text", 2)
      .collect()
    assert(m.length == 1 && m.head.getLong(1) == 0L &&
      m.head.getLong(2) == 0L && m.head.getLong(3) == 0L)
  }

  test("dupTokenBp counts repeated tokens") {
    val df = docs((1L, "a a b c", "s"), (2L, "a b", "s"))
    val m = df.select(col("doc_id"),
        TextAnalysis.dupTokenBp(col("text")).as("bp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 2500L) // 4 tokens, 3 distinct → 10000*1/4
    assert(m(2L) == 0L)
  }

  test("ngramOverlap: trigram contamination against a bench set") {
    val corpus = docs(
      (1L, "a b c d", "s"),   // grams: "a b c","b c d"
      (2L, "x y z w", "s"),   // grams: "x y z","y z w"
      (3L, "a", "s"))         // no trigrams
    val bench = docs((9L, "a b c x", "b")) // grams: "a b c","b c x"
    val m = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((2L, 1L, 5000L))) // "a b c" hit
    assert(m(2L) == ((2L, 0L, 0L)))
    assert(m(3L) == ((0L, 0L, 0L)))
  }

  test("ngramOverlap counts distinct grams once") {
    // "a b c a b c a b c" distinct trigrams: "a b c","b c a","c a b"
    val corpus = docs((1L, "a b c a b c a b c", "s"))
    val bench = docs((9L, "a b c", "b"))
    val r = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 3)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 1L, 3333L)))
  }

  test("vocabOverlapMatrix: pairwise Jaccard over sources") {
    val df = docs(
      (1L, "a b c", "s1"),  // s1 bigram vocab: {"a b","b c"}
      (2L, "a b d", "s2"),  // s2: {"a b","b d"}
      (3L, "p q", "s3"))    // s3: {"p q"} — no overlap with s1/s2
    val rows = Contamination.vocabOverlapMatrix(df, "source", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // only (s1,s2) share a gram: inter=1, union=3 → 3333 bp
    assert(rows.toSeq == Seq(("s1", "s2", 1L, 3333L)))
  }

  test("keywords: integer tf·idf ranks distinctive tokens first") {
    // "rare" df=1 tf=2 → 200000; "mid" df=2 → 100000/2·tf
    val df = docs(
      (1L, "rare rare mid common common", "s"),
      (2L, "mid common other", "s"),
      (3L, "common common zz", "s"))
    val rows = TextAnalysis.keywords(df, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(5)))
    // doc1: rare tf=2 df=1 → 200000; mid tf=1 df=2 → 50000;
    //       common tf=2 df=3 → 66666
    assert(rows.toSeq == Seq((1L, "rare", 200000L), (2L, "common", 66666L)))
  }

  test("keywords tie-break is token-ascending") {
    val df = docs((1L, "b a", "s")) // both tf=1 df=1 → equal score
    val rows = TextAnalysis.keywords(df, "doc_id", "text", 2)
      .orderBy(col("rank")).collect().map(_.getString(2))
    assert(rows.toSeq == Seq("a", "b"))
  }

  test("vocabOverlapMatrix orders pairs grp_a < grp_b") {
    val df = docs((1L, "a b", "zz"), (2L, "a b", "aa"))
    val r = Contamination.vocabOverlapMatrix(df, "source", "text", 2)
      .collect().head
    assert(r.getString(0) == "aa" && r.getString(1) == "zz" &&
      r.getLong(3) == 10000L)
  }

  private def bloomRows(corpus: org.apache.spark.sql.DataFrame,
                        bench: org.apache.spark.sql.DataFrame,
                        k: Int, m: Int) =
    Contamination.bloomContamination(corpus, bench, "doc_id", "text", 2,
        k, m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq

  test("bloomContamination: exact hits match ngramOverlap; maybe is a superset") {
    val corpus = docs(
      (1L, "x y z w", "c"),     // grams: "x y","y z","z w" — "y z" in bench
      (2L, "p q r", "c"),       // no overlap
      (3L, "", "c"))            // gram-less
    val bench = docs((10L, "a y z b", "b")) // grams "a y","y z","z b"
    val rows = bloomRows(corpus, bench, k = 4, m = 1 << 16)
    // wide filter → no false positives here; n_contam matches exact
    assert(rows == Seq((1L, 3L, 1L, 1L), (2L, 2L, 0L, 0L),
      (3L, 0L, 0L, 0L)))
    // parity with the broadcast-exact operator on the same input
    val exact = Contamination.ngramOverlap(corpus, bench, "doc_id",
        "text", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.forall { case (id, _, _, c) => exact(id) == c })
  }

  test("bloomContamination: tiny filter saturates — superset, never undercount") {
    val corpus = docs((1L, "x y z w v u t s r q", "c"))
    val bench = docs((10L, "m n o p", "b"))
    // m=64, k=1: heavy false-positive regime
    val Seq((_, grams, maybe, contam)) = bloomRows(corpus, bench, 1, 64)
    assert(grams == 9L && contam == 0L)
    assert(maybe >= contam) // superset guarantee even when saturated
  }

  test("bloomContamination: empty bench admits nothing") {
    val corpus = docs((1L, "x y z", "c"))
    val bench = docs((10L, "", "b")) // shingles of "" → no grams
    assert(bloomRows(corpus, bench, 3, 1024) == Seq((1L, 2L, 0L, 0L)))
  }

  test("bigramSurprisal: hand-computed bits on a tiny LM (smoothing, " +
    "unseen prefixes, the shift-compare floor-log2); empty doc = 0") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    // reference: bigrams (a,b)×2, (a,c)×1 → prefix a:3, V = |{b,c}| = 2
    val lm = TextAnalysis.trainBigramLm(
      Seq("a b", "a b", "a c").toDF("text"), "text")
    assert(lm.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
      Set(("a", "b", 2L), ("a", "c", 1L)))
    // doc "a b a c a z": per-occurrence bits (a = c1+V, b = c12+1):
    //  (a,b): fl2(5/3) = 0   (b,a): unseen prefix, fl2(2/1) = 1
    //  (a,c): fl2(5/2) = 1   (c,a): unseen, 1      (a,z): fl2(5/1) = 2
    // sum 5, n 5, mean_cb 100
    val got = TextAnalysis.bigramSurprisal(
        Seq((1L, "a b a c a z"), (2L, ""), (3L, "solo")).toDF(
          "doc_id", "text"), "doc_id", "text", lm)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 5L, 5L, 100L),
      (2L, 0L, 0L, 0L), (3L, 0L, 0L, 0L)), s"got $got")
  }

  test("bigramSurprisal keyed: each doc scores against its OWN key " +
    "slice's model (per-language CCNet); a keyless doc takes the " +
    "documented degenerate -1-bits path") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val lm = TextAnalysis.trainBigramLm(
      Seq(("en", "a b"), ("en", "a b"), ("en", "a c"), ("xx", "p q"))
        .toDF("lang", "text"), "text", keyCols = Seq("lang"))
    // slices are independent: en = {(a,b):2,(a,c):1}, xx = {(p,q):1}
    assert(lm.collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet ==
      Set(("en", "a", "b", 2L), ("en", "a", "c", 1L),
        ("xx", "p", "q", 1L)))
    val got = TextAnalysis.bigramSurprisal(
        Seq((1L, "en", "a b a z"),  // en slice: V=2, pfx a=3
          (2L, "xx", "p q"),        // xx slice: V=1, pfx p=1
          (3L, "zz", "m n"))        // NO slice → a=0, b=1 → -1/occ
          .toDF("doc_id", "lang", "text"),
        "doc_id", "text", lm, keyCols = Seq("lang"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // doc 1: (a,b) fl2(5/3)=0; (b,a) unseen prefix fl2(2/1)=1;
    //        (a,z) fl2(5/1)=2 → n=3 sum=3 mean 100
    // doc 2: (p,q) fl2(2/2)=0 → n=1 sum=0 mean 0 — scored against xx
    //        ONLY (pooled with en it would see V=3 → fl2(4/2)=1)
    // doc 3: one occurrence at the degenerate -1 → mean_cb -100
    assert(got == Seq((1L, "en", 3L, 3L, 100L),
      (2L, "xx", 1L, 0L, 0L), (3L, "zz", 1L, -1L, -100L)), s"got $got")
    // and the un-keyed form over the pooled reference CHANGES doc 2's
    // bits (V=3 across slices) — the slicing is load-bearing
    val pooled = TextAnalysis.bigramSurprisal(
        Seq((2L, "p q")).toDF("doc_id", "text"),
        "doc_id", "text",
        TextAnalysis.trainBigramLm(
          Seq("a b", "a b", "a c", "p q").toDF("text"), "text"))
      .collect().head.getLong(2)
    assert(pooled == 1L, s"pooled sum_bits $pooled")
  }

  test("hashedOddsWeights + scoreByHashedWeights: disjoint vocabularies " +
    "separate perfectly; prior centering keeps shared-vocab docs " +
    "near zero under 9:1 class imbalance") {
    import spark.implicits._
    // train: positive docs speak 'alpha' dialect, negative 'beta',
    // both mixed with shared filler
    val train = (
      (1 to 9).map(i => (s"alphaword$i common filler stuff", true)) ++
        (1 to 9).map(i => (s"betaword$i common filler stuff", false))
    ).toDF("text", "label")
    val w = TextAnalysis.hashedOddsWeights(train, "text", "label",
      buckets = 1 << 14)
    val test = Seq(
      (1L, "alphaword3 alphaword7 common"), // clearly positive
      (2L, "betaword2 betaword8 filler"),   // clearly negative
      (3L, "common filler stuff"),          // class-neutral
      (4L, "")                              // empty → exactly prior 0
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.scoreByHashedWeights(test, "doc_id",
        "text", w, buckets = 1 << 14)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(1L) > 0, s"positive doc scored ${scores(1L)}")
    assert(scores(2L) < 0, s"negative doc scored ${scores(2L)}")
    assert(scores(4L) == 0L)
    // balanced classes: neutral doc lies strictly between the others
    assert(scores(2L) < scores(3L) && scores(3L) < scores(1L))

    // 9:1 IMBALANCE: without prior centering every token's weight
    // would sit ~+4000 bp and a shared-vocab doc would score hugely
    // positive; centered at the prior it stays near zero
    val skewed = (
      (1 to 27).map(i => (s"alphaword${i % 9} common filler", true)) ++
        (1 to 3).map(i => (s"betaword$i common filler", false))
    ).toDF("text", "label")
    val w2 = TextAnalysis.hashedOddsWeights(skewed, "text", "label",
      buckets = 1 << 14)
    val s2 = TextAnalysis.scoreByHashedWeights(
        Seq((1L, "common filler common filler")).toDF("doc_id", "text"),
        "doc_id", "text", w2, buckets = 1 << 14)
      .collect().head.getLong(1)
    // 4 shared tokens, each |w| ≤ a few hundred bp of rounding slack —
    // nowhere near the ±4000/token an uncentered weight would carry
    assert(math.abs(s2) < 1000, s"shared-vocab doc scored $s2")
  }

  test("classifier artifact: save/load round-trips the weight table " +
    "bit-exactly and scores identically; bucket count rides along") {
    import spark.implicits._
    val train = (
      (1 to 9).map(i => (s"alphaword$i common filler stuff", true)) ++
        (1 to 9).map(i => (s"betaword$i common filler stuff", false))
    ).toDF("text", "label")
    val buckets = 1 << 14
    val w = TextAnalysis.hashedOddsWeights(train, "text", "label",
      buckets)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_clf").toString + "/clf"
    TextAnalysis.saveClassifier(w, buckets, dir)
    val (w2, b2) = TextAnalysis.loadClassifier(spark, dir)
    assert(b2 == buckets)
    // the weight TABLE round-trips bit-exactly
    val before = w.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val after = w2.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(after == before)
    // and a reloaded classifier scores the corpus identically
    val test = Seq((1L, "alphaword3 alphaword7 common"),
      (2L, "betaword2 betaword8 filler"), (3L, "common filler stuff"),
      (4L, "")).toDF("doc_id", "text")
    def scores(wt: org.apache.spark.sql.DataFrame, b: Int) =
      TextAnalysis.scoreByHashedWeights(test, "doc_id", "text", wt, b)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(scores(w2, b2) == scores(w, buckets))

    // an EMPTY weight table (token-free training slice) is a valid
    // classifier — everything scores the prior — and must round-trip
    val emptyW = TextAnalysis.hashedOddsWeights(
      Seq(("   ", true), ("", false)).toDF("text", "label"), "text",
      "label", buckets)
    assert(emptyW.count() == 0)
    val edir = java.nio.file.Files
      .createTempDirectory("graft_clf_e").toString + "/clf"
    TextAnalysis.saveClassifier(emptyW, buckets, edir)
    val (ew, eb) = TextAnalysis.loadClassifier(spark, edir)
    assert(eb == buckets && ew.count() == 0)
    assert(scores(ew, eb).forall(_._2 == 0L))
  }
}
