package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Encode-throughput adjudication for [[TextAnalysis.bpeApply]]
  * (SCALE.md): the operator's scale claim is that tokenizing is a pure
  * per-row map whose cost is INDEPENDENT of merge-table size (rank
  * lookups are hash probes), so the plan that encodes sf0.1 with a
  * 64-merge toy vocab is the plan that encodes 100 TB with a
  * 100K-merge production vocab.
  *
  * Controlled experiment: the corpus's real trained-to-exhaustion
  * merge list is padded to M ∈ {real, 8K, 100K} with synthetic pairs
  * over characters the corpus never contains — per-word WORK is
  * bit-identical across runs (padding never matches), only the rank
  * table grows. A flat wall-time row is the claim, machine-measured.
  *
  * Second axis: the per-thread word cache rides Zipf reuse. The
  * documents corpus (small vocabulary, high reuse) is the cache-HIT
  * regime; a synthetic all-unique-words corpus of the same token
  * volume is the cache-MISS bound. Both rows are reported — real
  * corpora sit between.
  *
  * Modes: `sweep` (default) — the M sweep plus the unique-words row,
  * medians of `SPARK_GRAFT_RUNS` (default 5) timed runs after one
  * warmup per variant.
  */
object BpeApplyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").cache()
    val nDocs = docs.count() // materialize: time encode, not scan

    // real list, trained to exhaustion on this corpus (small synthetic
    // vocabulary — it early-stops well before 100K)
    val real = TextAnalysis.bpeMerges(docs, "text", 100000)
      .orderBy(col("step").asc).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // padding pairs prefixed with a CJK sentinel char the corpus
    // never contains: they can never match any corpus-derived token
    // (those are built from corpus characters only), so per-word work
    // is identical across M. The index keeps every pair distinct —
    // NOT chars from an incrementing codepoint, which overflows Char
    // past 0xFFFF and wraps into ASCII (caught in review: wrapped
    // pads at M=100K could match real adjacent letters and invalidate
    // the controlled experiment).
    def padded(m: Int): Seq[(String, String)] =
      real ++ (0 until (m - real.size)).map { i =>
        ("一" + i, "丁" + i)
      }

    // same token volume, every word unique: the cache-miss bound
    val unique = docs
      .withColumn("__id", monotonically_increasing_id())
      .select(concat_ws(" ", transform(
        filter(split(col("text"), " "), w => w =!= ""),
        (w, i) => concat(w, lit("u"),
          conv(col("__id").cast("string"), 10, 36), lit("x"), i)))
        .as("text"))
      .cache()
    unique.count()

    def timeEncode(df: org.apache.spark.sql.DataFrame,
                   merges: Seq[(String, String)]): (Double, Long) = {
      var tokens = 0L
      // realistic usage shape: the tokenizer Column is constructed
      // once (one broadcast), then reused across actions
      val encoded = df.select(
        size(TextAnalysis.bpeApply(col("text"), merges)).as("n"))
      def once(): Double = {
        val t0 = System.nanoTime()
        tokens = encoded.agg(sum(col("n"))).collect()(0).getLong(0)
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup: codegen + JIT for this variant
      val med = (1 to runs).map(_ => once()).sorted.apply(runs / 2)
      (math.rint(med * 1000) / 1000, tokens)
    }

    val variants = Seq(
      ("real", docs, real),
      ("pad8k", docs, padded(8192)),
      ("pad100k", docs, padded(100000)),
      ("unique8k", unique, padded(8192)))
    val rows = variants.map { case (name, df, merges) =>
      val (sec, tokens) = timeEncode(df, merges)
      val mtoks = math.rint(tokens / sec / 1e5) / 10
      s""""$name":{"merges":${merges.size},"sec":$sec,""" +
        s""""tokens":$tokens,"mtok_per_sec":$mtoks}"""
    }
    println(s"""{"bench":"bpe_apply","sf":"$sfDir","docs":$nDocs,""" +
      s""""real_merges":${real.size},"runs":$runs,""" +
      rows.mkString(",") + "}")
    spark.stop()
  }
}
