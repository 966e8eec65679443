package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** mfreq(a, b): of the two port values, return the one seen more often
  * across the whole stream; ties → the smaller value (reference
  * filter.c:711-751, global `_Atomic uint64 freqmap[65536]`).
  *
  * The reference mutates a global counter per row — no faithful
  * distributed equivalent exists (SURVEY.md §7.3). This operator is the
  * documented two-pass batch semantics: pass 1 counts both columns'
  * values (one shuffle, bounded by the 65536 port space), pass 2
  * broadcast-joins the counts back — fully distributed, no driver state.
  * (The filter-DSL compiler also accepts a small precomputed map via
  * FilterEnv.mfreq for predicate use.)
  */
object MfreqOp {

  /** Frequency table over both columns: (p, c). */
  def freqTable(df: DataFrame, a: String, b: String): DataFrame =
    df.select(col(a).as("p")).unionAll(df.select(col(b).as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))

  /** df + `outCol` = mfreq(a, b). */
  def withMfreq(df: DataFrame, a: String, b: String,
                outCol: String): DataFrame = {
    val freq = freqTable(df, a, b)
    val f1 = broadcast(freq.select(col("p").as("__p1"), col("c").as("__c1")))
    val f2 = broadcast(freq.select(col("p").as("__p2"), col("c").as("__c2")))
    df.join(f1, col(a) === col("__p1"), "left")
      .join(f2, col(b) === col("__p2"), "left")
      .withColumn(outCol,
        when(col("__c1") > col("__c2"), col(a))
          .when(col("__c2") > col("__c1"), col(b))
          .otherwise(least(col(a), col(b))))
      .drop("__p1", "__c1", "__p2", "__c2")
  }
}
