package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicate-SPAN removal — the substring-level dedup a
  * document-level pass cannot do (document dedup keeps two documents
  * that share a 200-token boilerplate block; span dedup cuts the
  * block). Semantics follow the ExactSubstr approach of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better"
  * (arXiv:2107.06499), re-expressed over word tokens and relational
  * operators instead of a suffix array:
  *
  *  1. every length-`minTokens` token window (gram) of every document
  *     is an occurrence (one corpus-sized explode — the same O(corpus)
  *     row count every dedup pass here pays);
  *  2. a gram occurring more than once (anywhere — across documents
  *     or within one) marks its occurrences as duplicated; with
  *     `keepFirst` (default) the globally first occurrence by
  *     (doc, position) stays unmarked, so one copy of every
  *     duplicated region survives — drop it to mark ALL copies;
  *  3. per document, marked windows merge into maximal spans
  *     (overlapping OR adjacent), reported as 1-based inclusive token
  *     ranges; [[removeSpans]] cuts them back out of the text.
  *
  * Scale shape: the heavy key is the gram. Marking uses
  * groupBy(gram).agg(count, min(struct(doc,pos))) + a join back —
  * BOTH sides partial-aggregate map-side and the hottest gram
  * collapses to ONE row before the exchange, so a
  * boilerplate-repeated-10M-times corpus never sorts 10M rows in one
  * task (a row_number window over gram — the obvious alternative —
  * does exactly that). The join back re-shuffles on the same key, so
  * the exchange is reusable. Island-merge windows partition by
  * DOCUMENT — bounded by document length, no skew. Gram identity is
  * the joined token string itself: exact (no collision rate to
  * adjudicate), and the 100 TB swap-in is hashing the gram to 128
  * bits on both sides of the same plan. */
object SpanDedup {

  /** THE tokenization contract — one definition, shared with every
    * text operator (drift between two copies would silently desync
    * span positions from token counts). */
  private def toks(textCol: String): Column =
    TextAnalysis.tokens(col(textCol))

  /** (id, pos, gram) for every length-L window; pos is 1-based. */
  private def gramOccurrences(df: DataFrame, idCol: String,
                              textCol: String, minTokens: Int): DataFrame =
    df.select(col(idCol), toks(textCol).as("__tk"))
      .where(size(col("__tk")) >= minTokens)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__tk")) - minTokens + 1),
        i => struct(i.as("pos"),
          concat_ws(" ", slice(col("__tk"), i, lit(minTokens)))
            .as("gram"))))
        .as("__g"))
      .select(col(idCol), col("__g.pos").as("pos"),
        col("__g.gram").as("gram"))

  /** Token-position width of the packed (id, pos) key: positions fit
    * in 21 bits (a 2M-token document is far past any training-data
    * example; enforced per document with raise_error, one check per
    * doc). Ids then get the remaining 42 bits. */
  private val PosBits = 21

  /** Marked (id, pos) window starts (see object doc, step 2). The
    * global-first occurrence is min over the (id, pos) order. With an
    * integral id the pair PACKS into one BIGINT — min() then runs as
    * a primitive-buffer HashAggregate with map-side partials; a
    * struct/string min buffer is not UnsafeRow-mutable and Spark
    * silently degrades the whole aggregation to per-partition-sorting
    * SortAggregate (observed on the q116 plan before this fast path).
    * Non-integral ids keep the generic struct-min (documented
    * SortAggregate cost). */
  private def markedStarts(df: DataFrame, idCol: String, textCol: String,
                           minTokens: Int, keepFirst: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralId = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _                                             => false
    }
    val g = gramOccurrences(df, idCol, textCol, minTokens)
    val occKey =
      if (integralId) {
        val id = col(idCol).cast("long")
        val guarded = when(
          id < 0 || id >= (1L << (63 - PosBits)) ||
            col("pos") >= (1L << PosBits),
          // data-dependent contract violation, not a code bug: fail
          // loudly instead of silently mis-ordering the packed key
          raise_error(concat(lit("SpanDedup: id/pos out of packed " +
            s"range (id 0..2^${63 - PosBits}, pos < 2^$PosBits): "),
            id, lit("/"), col("pos"))).cast("long"))
          .otherwise(shiftleft(id, PosBits) + col("pos"))
        guarded
      } else struct(col(idCol), col("pos"))
    val occ = g.withColumn("__k", occKey)
    val firsts = occ.groupBy(col("gram")).agg(
      count(lit(1)).as("__c"),
      min(col("__k")).as("__first"))
    val dup = occ.join(firsts, Seq("gram")).where(col("__c") > 1)
    val m = if (keepFirst)
      dup.where(!(col("__k") === col("__first")))
    else dup
    m.select(col(idCol), col("pos"))
  }

  /** Merge (id, __s, __e) intervals into maximal spans per id —
    * overlapping OR adjacent coalesce (prev-running-max islands).
    * Windows partition by DOCUMENT: bounded by document length, no
    * skew. */
  private def mergeIslands(intervals: DataFrame,
                           idCol: String): DataFrame = {
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(idCol)).orderBy(col("__s"))
    intervals
      .withColumn("__prev_end", max(col("__e")).over(wPrev))
      .withColumn("__gid", sum(
        when(col("__prev_end").isNull ||
          col("__s") > col("__prev_end") + 1, 1).otherwise(0))
        .over(wRun))
      .groupBy(col(idCol), col("__gid"))
      .agg(min(col("__s")).cast("long").as("start_tok"),
        max(col("__e")).cast("long").as("end_tok"))
      .drop("__gid")
  }

  /** Maximal duplicated spans per document: (id, start_tok, end_tok),
    * 1-based inclusive. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     minTokens: Int,
                     keepFirst: Boolean = true): DataFrame = {
    require(minTokens >= 2, s"minTokens=$minTokens out of [2,∞)")
    mergeIslands(
      markedStarts(df, idCol, textCol, minTokens, keepFirst)
        .select(col(idCol), col("pos").as("__s"),
          (col("pos") + minTokens - 1).as("__e")),
      idCol)
  }

  /** Spans of the corpus that collide with a BENCHMARK set — GPT-3
    * appendix-C-style span decontamination: instead of dropping every
    * contaminated document (the [[Contamination]] operators' doc-level
    * verdicts), cut only the collision windows, widened by `pad`
    * tokens each side and clamped to the document. EVERY collision is
    * marked (no keep-first — the benchmark text must not survive
    * anywhere). The benchmark gram set rides a left_semi join: small
    * sets broadcast, and at scale the semi-join shuffles ONLY the
    * distinct-gram stream, never document bytes. */
  def contaminationSpans(df: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         minTokens: Int, pad: Int = 0): DataFrame = {
    require(minTokens >= 2, s"minTokens=$minTokens out of [2,∞)")
    require(pad >= 0, s"pad=$pad out of [0,∞)")
    val benchGrams = gramOccurrences(
      bench.select(lit(0L).as("__bid"), col(benchTextCol)),
      "__bid", benchTextCol, minTokens)
      .select(col("gram")).distinct()
    val marked = gramOccurrences(df, idCol, textCol, minTokens)
      .join(benchGrams, Seq("gram"), "left_semi")
      .select(col(idCol), (col("pos") - pad).as("__s"),
        (col("pos") + minTokens - 1 + pad).as("__e"))
    val lens = df.select(col(idCol),
      size(toks(textCol)).as("__n"))
    // clamp AFTER the merge: padded intervals coalesce first, then
    // the span meets the document bounds (one doc-keyed join of the
    // far-smaller span table)
    mergeIslands(marked, idCol)
      .join(lens, Seq(idCol))
      .select(col(idCol),
        greatest(col("start_tok"), lit(1L)).as("start_tok"),
        least(col("end_tok"), col("__n").cast("long")).as("end_tok"))
  }

  /** Cleaned corpus: one row per input document, duplicated spans cut
    * out (`cleaned` = surviving tokens re-joined; empty string when
    * the whole document was duplicated). The span table is doc-keyed
    * and far smaller than the corpus — the join broadcasts or
    * AQE-plans; the cut itself is a higher-order filter inside the
    * projection (spans per doc are few), no extra shuffle. */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Int,
                  keepFirst: Boolean = true): DataFrame =
    cutSpans(df, idCol, textCol,
      duplicateSpans(df, idCol, textCol, minTokens, keepFirst))

  /** [[contaminationSpans]] cut back out of the corpus (see
    * [[removeSpans]] for the cut's shape). */
  def removeContaminated(df: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         minTokens: Int, pad: Int = 0): DataFrame =
    cutSpans(df, idCol, textCol,
      contaminationSpans(df, idCol, textCol, bench, benchTextCol,
        minTokens, pad))

  private def cutSpans(df: DataFrame, idCol: String, textCol: String,
                       spanDf: DataFrame): DataFrame = {
    val spans = spanDf
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_tok"), col("end_tok")))
        .as("__spans"))
    df.join(spans, Seq(idCol), "left")
      .withColumn("__tk", toks(textCol))
      .withColumn("__sp",
        coalesce(col("__spans"),
          array().cast("array<struct<start_tok:bigint,end_tok:bigint>>")))
      // guard: sequence(1, 0) generates DESCENDING [1, 0] (and
      // element_at(_, 0) is an ANSI error) — empty docs need an
      // explicit empty index list
      .select(col(idCol), concat_ws(" ", filter(transform(
        when(size(col("__tk")) >= 1,
          sequence(lit(1), size(col("__tk"))))
          .otherwise(array().cast("array<int>")),
        i => when(!exists(col("__sp"),
          s => i >= s("start_tok") && i <= s("end_tok")),
          element_at(col("__tk"), i))),
        t => t.isNotNull)).as("cleaned"))
  }
}
