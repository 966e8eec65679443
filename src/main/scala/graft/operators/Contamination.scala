package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-overlap operators for training-data hygiene:
  *
  *  - [[ngramOverlap]]: per-document benchmark-contamination check — what
  *    fraction of a document's distinct word n-grams also appear in a
  *    held-out benchmark corpus (the standard eval-decontamination test
  *    applied before training-set admission).
  *  - [[vocabOverlapMatrix]]: pairwise n-gram-vocabulary Jaccard between
  *    corpus slices (sources, crawls, snapshots) — the corpus-level
  *    diagnostic for "how much does slice A re-serve slice B's content".
  *
  * Both are integer/bp-valued and engine-portable (DuckDB-oracled).
  */
object Contamination {

  /** Per-document distinct word n-grams (unfiltered whitespace tokens,
    * same shingling as [[Dedup.shingles]]). */
  private def distinctGrams(df: DataFrame, idCol: String, textCol: String,
                            n: Int): DataFrame =
    df.select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()

  /** Benchmark contamination per document.
    *
    * Output: (idCol, n_distinct_grams, n_contam, contam_bp) where
    * contam_bp = 10000 × n_contam / n_distinct_grams (0 for gram-less
    * docs).
    *
    * Shape: the benchmark's distinct gram set is aggregated then
    * BROADCAST — benchmark suites are small (≤ millions of grams) next
    * to a 100 TB corpus, so the corpus side streams map-side with no
    * shuffle for the membership probe; the only shuffle is the per-doc
    * distinct/count, keyed by doc id. If the reference set ever outgrows
    * broadcast, the same plan holds with a bloom-filter pre-probe plus a
    * shuffled semi join on the survivors.
    */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    val dg = distinctGrams(corpus, idCol, textCol, n)
    val bg = broadcast(
      bench.select(explode(Dedup.shingles(col(textCol), n)).as("g"))
        .distinct()
        .withColumn("__hit", lit(1L)))
    val per = dg.join(bg, Seq("g"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_distinct_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contam"))
    corpus.select(col(idCol)).join(per, Seq(idCol), "left").select(
      col(idCol),
      coalesce(col("n_distinct_grams"), lit(0L)).as("n_distinct_grams"),
      coalesce(col("n_contam"), lit(0L)).as("n_contam"),
      coalesce(
        floor(lit(10000L) * col("n_contam") / col("n_distinct_grams")),
        lit(0L)).cast("long").as("contam_bp"))
  }

  /** Pairwise n-gram-vocabulary Jaccard between groups.
    *
    * Output: (grp_a, grp_b, n_common, jaccard_bp) for every unordered
    * group pair sharing ≥1 gram, grp_a < grp_b;
    * jaccard_bp = 10000 × |A∩B| / |A∪B|.
    *
    * Shape: distinct (group, gram) pairs once, then a self-equi-join on
    * gram restricted to grp_a < grp_b. With G groups a gram shared by
    * all of them emits G(G−1)/2 join rows — G is small (sources/crawls,
    * tens to hundreds), so the blow-up is bounded by G², not corpus
    * size; for large G feed df-capped grams (drop grams present in more
    * than maxDf groups — they carry no discriminating signal, exactly
    * the hot-gram cap ngramJaccardPairs uses).
    */
  def vocabOverlapMatrix(df: DataFrame, groupCol: String, textCol: String,
                         n: Int): DataFrame = {
    val sg = df.select(col(groupCol).as("grp"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .distinct()
    val sizes = sg.groupBy(col("grp")).agg(count(lit(1)).as("v"))
    val inter = sg.as("l")
      .join(sg.as("r"),
        col("l.g") === col("r.g") && col("l.grp") < col("r.grp"))
      .groupBy(col("l.grp").as("grp_a"), col("r.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes).withColumnRenamed("grp", "grp_a")
        .withColumnRenamed("v", "va"), Seq("grp_a"))
      .join(broadcast(sizes).withColumnRenamed("grp", "grp_b")
        .withColumnRenamed("v", "vb"), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_common"),
        floor(lit(10000L) * col("n_common") /
          (col("va") + col("vb") - col("n_common")))
          .cast("long").as("jaccard_bp"))
  }
}
