package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table plumbing: co-partitioned persistent tables for
  * shuffle-free equi-joins.
  *
  * At 100 TB the dominant recurring cost is not one query's shuffle but
  * the SAME shuffle re-paid nightly: dedup resolution joins on doc_id,
  * enrichment joins on (dev_ip), archive self-joins on flow keys. A
  * table written with `bucketBy(n, key)` + `sortBy(key)` pins the hash
  * partitioning ON DISK: any equi-join between two tables bucketed the
  * same way (same key, same n) starts from co-located buckets — the
  * plan's SortMergeJoin has NO Exchange on either side (asserted in
  * BucketingSpec), so the recurring cost collapses to reading matching
  * files. One shuffle at write time, zero at every read after.
  *
  * Mechanics worth pinning (they are easy to silently lose):
  *  - both sides must have the SAME bucket count — mismatched counts
  *    re-shuffle one side (Spark can only avoid the exchange when
  *    bucket layouts are equal, or coalesce-able with
  *    spark.sql.bucketing.coalesceBucketsInJoin.enabled);
  *  - modern Spark re-SORTS buckets at read even with `sortBy`
  *    (reporting stored order would serialize multi-file buckets);
  *    the within-bucket sort is cheap next to the avoided exchange,
  *    and with exactly ONE file per bucket — guaranteed here by
  *    repartitioning on the bucket hash before the write — setting
  *    spark.sql.legacy.bucketedTableScan.outputOrdering=true removes
  *    it entirely (both regimes plan-asserted in BucketingSpec);
  *  - bucket pruning: an equality filter on the bucket key scans 1/n of
  *    the files (`SelectedBucketsCount` in the scan node).
  *
  * This is the Spark-native replacement for the reference's
  * tkvdb-keyed window files (monit-objects-fwm.c writes per-window
  * sorted key files; a bucketed flow archive gives the same
  * "pre-organized by key" property to every downstream join instead of
  * one reader).
  */
object Bucketing {

  /** Persist `df` as a managed bucketed table (overwrites). The table
    * lives in the session catalog's current database; callers create a
    * scratch database with an explicit LOCATION to control placement
    * (see BucketingSpec). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    import org.apache.spark.sql.functions.col
    // repartition on the SAME hash the bucketer uses so every bucket is
    // written by exactly one task → ONE file per bucket. Spark only
    // trusts the sortBy ordering at read time when a bucket is a single
    // file; with several files per bucket the merge join re-sorts each
    // side per query and the sortBy was wasted.
    df.repartition(buckets, keys.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
