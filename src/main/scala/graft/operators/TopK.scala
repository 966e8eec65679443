package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-K family: top-N + "others" residual row, and top-X%-cumulative cut.
  *
  * Reference semantics:
  *  - top-N+others: emit the first `limit` rows in declared sort order,
  *    then ONE residual row whose key columns are NULL and whose measures
  *    sum everything past the limit (reference monit-objects-fwm.c:404-481;
  *    NULL keys at 461-478). No others row when nothing exceeds the limit.
  *  - top-X%: sort desc by one measure, keep rows until the running total
  *    (exclusive of the current row) reaches X% of the grand total
  *    (reference classification.c:524-619).
  *
  * Both run AFTER aggregation, so inputs are group-cardinality-bounded;
  * the window partitioning keeps the work distributed per time bucket at
  * any scale. Global (unpartitioned) variants collapse to one partition —
  * acceptable only post-aggregation, which is how the reference uses them.
  */
object TopK {

  /** Per-partition top-N + NULL-keyed "others" residual.
    *
    * @param agg       aggregated input
    * @param partCols  partition columns (e.g. the time window); may be empty
    * @param keyCols   group-key columns → NULL in the others row
    * @param measCols  measure columns → summed in the others row
    * @param sortCols  declared ordering within a partition
    * @param n         row limit per partition
    */
  def topNOthers(agg: DataFrame, partCols: Seq[String], keyCols: Seq[String],
                 measCols: Seq[String], sortCols: Seq[Column],
                 n: Int): DataFrame = {
    val w =
      if (partCols.isEmpty) Window.orderBy(sortCols: _*)
      else Window.partitionBy(partCols.map(col): _*).orderBy(sortCols: _*)
    // SINGLE PASS over the aggregated input (a union of head/tail
    // branches would scan + aggregate it twice — shows up as a double
    // parquet scan at any scale): rank rows, null the keys past the
    // limit, and re-group. Head rows keep their unique rank so the merge
    // leaves them untouched; all past-limit rows share the (part, NULL
    // keys, NULL rank) group and collapse into the one residual row.
    val flagged = agg.withColumn("__rn", row_number().over(w))
    val schema = agg.schema
    def typeOf(c: String) = schema(c).dataType
    val marked = flagged.select(
      (partCols.map(col) ++
        keyCols.map(k => when(col("__rn") <= n, col(k))
          .otherwise(lit(null).cast(typeOf(k))).as(k)) ++
        measCols.map(col) :+
        when(col("__rn") <= n, col("__rn")).otherwise(lit(null))
          .as("__hrn")): _*)
    val sums = measCols.map(m => sum(col(m)).as(m))
    marked
      .groupBy((partCols ++ keyCols :+ "__hrn").map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .drop("__hrn")
      .select(schema.fieldNames.map(col): _*)
  }

  /** Keep the top rows by `measure` desc until the cumulative sum reaches
    * pct% of the partition total (the crossing row is kept).
    *
    * @param tieBreak extra ordering columns to make the cut deterministic
    */
  def topPctCut(agg: DataFrame, partCols: Seq[String], measure: String,
                pct: Double, tieBreak: Seq[Column]): DataFrame = {
    val ord = (col(measure).desc +: tieBreak)
    val (wOrd, wAll) =
      if (partCols.isEmpty)
        (Window.orderBy(ord: _*), Window.partitionBy())
      else {
        val p = partCols.map(col)
        (Window.partitionBy(p: _*).orderBy(ord: _*),
         Window.partitionBy(p: _*))
      }
    val cumExcl = coalesce(
      sum(col(measure)).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val total = sum(col(measure)).over(
      wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    agg.withColumn("__cum", cumExcl)
      .withColumn("__tot", total)
      .filter(col("__cum") < col("__tot") * lit(pct) / lit(100.0))
      .drop("__cum", "__tot")
  }
}
