package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkTest {

  test("deterministicSplit: stable, covers all rows, roughly weighted") {
    val df = flowDf(Seq("doc_id"), (0L until 1000L).map(Seq(_)))
    val out = Curation.deterministicSplit(df, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 1000)
    assert(out("train") > 800 && out("train") < 970)
    assert(out.keySet == Set("train", "val", "test"))

    // stability: the same id maps to the same split in a different frame
    val again = Curation.deterministicSplit(
      flowDf(Seq("doc_id"), Seq(Seq(42L))), "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("split").collect().head.getString(0)
    val ref = Curation.deterministicSplit(df, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .filter(col("doc_id") === 42L)
      .select("split").collect().head.getString(0)
    assert(again == ref)
  }

  test("shuffleShards: deterministic permutation, contiguous seqs, seed changes order") {
    val df = flowDf(Seq("doc_id"), (0L until 500L).map(Seq(_)))
    def run(seed: Long) = Curation.shuffleShards(df, "doc_id", seed, 8)
      .select("doc_id", "shard", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(42L)
    // every row present exactly once; same seed → identical assignment
    assert(a.map(_._1).sorted == (0L until 500L))
    assert(run(42L).toSet == a.toSet)
    // per-shard seqs are contiguous 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size)) }
    // shards are used and roughly balanced (md5 buckets)
    val sizes = a.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.min > 20)
    // a different seed is a different permutation (id → (shard, seq))
    val b = run(43L)
    assert(a.toSet != b.toSet)
  }

  test("shuffleShards: refuses to overwrite pre-existing output columns") {
    val withShard = flowDf(Seq("doc_id"), (0L until 5L).map(Seq(_)))
      .withColumn("shard", lit(99L))
    val e = intercept[IllegalArgumentException] {
      Curation.shuffleShards(withShard, "doc_id", 1L, 4) }
    assert(e.getMessage.contains("shard"))
    val withSeq = flowDf(Seq("doc_id"), (0L until 5L).map(Seq(_)))
      .withColumn("seq", lit(0L))
    intercept[IllegalArgumentException] {
      Curation.shuffleShards(withSeq, "doc_id", 1L, 4) }
  }

  test("shuffleShards: 48-bit bucket key bounds imbalance across " +
    "non-power-of-two shard counts (property)") {
    // 16-bit draws had a SYSTEMATIC ~1.6% skew at non-power-of-two s
    // (2^16 mod s leftover buckets favor shards < 2^16 mod s); with 48
    // bits that bias is s/2^48, so observed imbalance is pure binomial
    // noise: sd of a shard count ≈ sqrt(n/s). Assert every shard is
    // within 5 sd of n/s for several awkward shard counts.
    val n = 50000L
    val df = flowDf(Seq("doc_id"), (0L until n).map(Seq(_)))
    for (s <- Seq(3, 5, 6, 7, 11, 13)) {
      val sizes = Curation.shuffleShards(df, "doc_id", 7L, s)
        .groupBy("shard").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.size == s, s"shards=$s: only ${sizes.size} used")
      val mean = n.toDouble / s
      val tol = 5.0 * math.sqrt(mean)
      sizes.foreach { case (shard, c) =>
        assert(math.abs(c - mean) <= tol,
          s"shards=$s shard=$shard count=$c vs mean=$mean ± $tol") }
    }
  }

  test("gopherRules: each rule gates independently") {
    import graft.operators.TextAnalysis
    def metrics(text: String): Map[String, Any] = {
      val cols = TextAnalysis.gopherRules(col("text"), minWords = 5)
        .map { case (n, c) => c.as(n) }
      import spark.implicits._
      val row = Seq(text).toDF("text")
        .select(cols: _*).collect().head
      row.schema.fieldNames.zip(row.toSeq).toMap
    }
    // passes every rule: 6 words ≥ 5, alpha, stopword hits (the, of)
    val good = metrics("the cat sat out of doors")
    assert(good("keep") == true && good("n_words") == 6L &&
      good("stop_hits") == 2L)
    // too short
    assert(metrics("the of x")("keep") == false)
    // no required stopwords (only 1 hit needed to fail: 0 < 2)
    val noStop = metrics("cats sit outside green doors quietly")
    assert(noStop("stop_hits") == 0L && noStop("keep") == false)
    // numeric words fail the alpha rule: 2 alpha of 6 → 3333 bp < 8000
    val nums = metrics("the of 11 22 33 44")
    assert(nums("alpha_word_bp") == 3333L && nums("keep") == false)
    // symbol-heavy: '#' per word → 10000 bp > 1000
    val sym = metrics("the# of# a# b# c#")
    assert(sym("keep") == false &&
      sym("symbol_ratio_bp").asInstanceOf[Long] >= 10000L)
    // mean word length out of [3,10]: single-char words → 10000 bp
    val tiny = metrics("a b c d e 1 2 the of")
    assert(tiny("mean_word_len_bp").asInstanceOf[Long] < 30000L &&
      tiny("keep") == false)
    // ellipsis counts 1 symbol per '...' occurrence
    val ell = metrics("the of alpha beta gamma ...")
    assert(ell("symbol_ratio_bp").asInstanceOf[Long] >= 1666L)
  }

  test("mixSample: rate 0 drops all, 10000 keeps all, samples nest") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      (0L until 400L).map(i => Row(i, s"src${i % 4}")).asJava,
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("source", StringType, false))))
    def ids(rates: Map[String, Long], default: Long = 10000L) =
      Curation.mixSample(df, "doc_id", "source", rates, default)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(Map("src0" -> 0L)).forall(_ % 4 != 0))
    assert(ids(Map.empty).size == 400) // default keeps everything
    val s20 = ids(Map("src1" -> 2000L), 0L)
    val s50 = ids(Map("src1" -> 5000L), 0L)
    assert(s20.subsetOf(s50), "raising the rate must grow the sample")
    assert(s50.size > s20.size && s50.size < 100)
    // sampling bucket is independent of the split bucket: both halves
    // of a 50% sample should still land in train/val/test
    val splits = Curation.deterministicSplit(
      Curation.mixSample(df, "doc_id", "source", Map.empty, 5000L),
      "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("split").collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("packSequences: bins fill to budget, overflow by at most one doc") {
    // tokens 1000 each, budget 2048: preceding cum 0,1000,2000,3000,...
    // → bins 0,0,0,1,1,2,... (bin 0 overflows to 3000 tokens)
    val df = flowDf(Seq("doc_id", "g", "toks"),
      (0L until 7L).map(i => Seq(i, 1L, 1000L)))
    val bins = Curation.packSequences(df, "doc_id", col("toks"),
        budget = 2048L, groupCols = Seq("g"))
      .orderBy("doc_id").select("bin").collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(0L, 0L, 0L, 1L, 1L, 2L, 2L))
    // groups pack independently
    val two = flowDf(Seq("doc_id", "g", "toks"),
      Seq(Seq(1L, 1L, 3000L), Seq(2L, 2L, 100L)))
    val byId = Curation.packSequences(two, "doc_id", col("toks"),
        budget = 2048L, groupCols = Seq("g"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId == Map(1L -> 0L, 2L -> 0L))
  }

  private def sampleIds(df: org.apache.spark.sql.DataFrame, n: Int,
                        prune: Boolean) =
    Curation.stratifiedSample(df, "doc_id", "g", n, prune)
      .collect()
      .map(r => (Option(r.get(1)).map(_.toString).getOrElse("NULL"),
        r.getLong(0), r.getAs[Number](2).longValue()))
      .sortBy(t => (t._1, t._3)).toSeq

  test("stratifiedSample: pruned equals unpruned; exactly n per stratum; nested") {
    val df = flowDf(Seq("doc_id", "g"),
      (0L until 600L).map(i => Seq(i, i % 3)))
    val full = sampleIds(df, 16, prune = true)
    assert(full == sampleIds(df, 16, prune = false))
    assert(full.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("0" -> 16, "1" -> 16, "2" -> 16))
    // ranks are 1..n within each stratum
    assert(full.groupBy(_._1).values
      .forall(_.map(_._3).sorted == (1L to 16L)))
    // nested: the 5-sample is exactly ranks 1..5 of the 16-sample
    val small = sampleIds(df, 5, prune = true)
    assert(small.toSet == full.filter(_._3 <= 5).toSet)
  }

  test("stratifiedSample: a stratum with ZERO prune survivors still samples") {
    // ids 0,3,5,10,34 all hash ABOVE the n=1, s=5 threshold
    // ((2^60 div 5)*4) — with the guard anchored on survivor groups
    // this stratum vanished entirely (the regression this test pins);
    // anchored on sizes it re-ranks unpruned and keeps its 1 row
    val df = flowDf(Seq("doc_id", "g"),
      Seq(0L, 3L, 5L, 10L, 34L).map(Seq(_, 1L)) ++
        (100L until 140L).map(Seq(_, 2L)))
    val out = sampleIds(df, 1, prune = true)
    assert(out.map(_._1).toSet == Set("1", "2"))
    assert(out == sampleIds(df, 1, prune = false))
  }

  test("stratifiedSample: small and NULL strata keep all rows") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      (Seq(Row(1L, java.lang.Long.valueOf(7L)),
        Row(2L, java.lang.Long.valueOf(7L)),
        Row(3L, null), Row(4L, null), Row(5L, null))).asJava,
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("g", LongType, true))))
    val out = sampleIds(df, 10, prune = true)
    assert(out.map(t => (t._1, t._2)).toSet ==
      Set(("7", 1L), ("7", 2L), ("NULL", 3L), ("NULL", 4L),
        ("NULL", 5L)))
    assert(out == sampleIds(df, 10, prune = false))
  }
}
