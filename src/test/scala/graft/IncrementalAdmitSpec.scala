package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Incremental admission: increment-vs-archive dedup semantics. */
class IncrementalAdmitSpec extends SparkTest {
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("doc_id", LongType, false),
        StructField("text", StringType, false))))
  }

  private val base = "the quick brown fox jumps over the lazy dog " +
    "and then runs far away home tonight"

  test("refuses exact and near archive duplicates, admits fresh docs " +
    "and intra-increment duplicates") {
    val archive = docs(
      1L -> base,
      2L -> "completely different text about distributed query engines")
    val increment = docs(
      10L -> base,                          // exact dup of 1 → refused
      11L -> base.replace("tonight", "tomorrow"), // near dup → refused
      12L -> "fresh unrelated content mentioning parquet shuffles and codegen pipelines today",
      13L -> "fresh unrelated content mentioning parquet shuffles and codegen pipelines today")
      // 12/13 duplicate EACH OTHER: both admitted (admission is
      // against the archive; intra-increment dedup is a separate pass)
    val admitted = Dedup.incrementalAdmit(archive, increment, "doc_id",
        "text", shingleK = 2, bands = 8, minBp = 7000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(12L, 13L))
  }

  test("empty archive admits everything; empty increment admits nothing") {
    val inc = docs(10L -> base)
    val none = docs()
    assert(Dedup.incrementalAdmit(none, inc, "doc_id", "text")
      .count() == 1)
    assert(Dedup.incrementalAdmit(inc, none, "doc_id", "text")
      .count() == 0)
  }

  test("digest refusal works even when the doc has no shingles") {
    // a 1-word doc has no 3-shingles (LSH blind) but the digest path
    // still refuses the exact copy
    val archive = docs(1L -> "word")
    val inc = docs(10L -> "word", 11L -> "other")
    val admitted = Dedup.incrementalAdmit(archive, inc, "doc_id",
        "text").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(11L))
  }
}
