package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Backward as-of join: attach to each fact row the single dimension
  * version with the same key and the greatest version time at or before
  * the fact's event time.
  *
  * The reference applies time-varying per-device settings (sampling
  * rate, devices.c:153-200; hot-reloaded monitoring configs,
  * xenoeye.c:214-260) by mutating in-process state, so a flow is always
  * enriched with "the config active NOW". A batch/replay engine must
  * reconstruct "the config active AT THE FLOW'S TIME" instead — exactly
  * an as-of join against the versioned dimension history. Spark has no
  * native as-of operator; both strategies below compose existing
  * operators so Catalyst keeps whole-stage codegen:
  *
  *  - [[backward]]: union facts and versions, one window over the key
  *    ordered by time, version payload carried forward as an ATOMIC
  *    struct (per-column fills could mix versions when a later version
  *    holds NULLs). One shuffle on the key — right shape when the
  *    version history itself is too large to broadcast.
  *  - [[backwardBroadcast]]: collapse each key's history to a sorted
  *    array of (time, payload) structs, broadcast it, and pick the
  *    last element ≤ the fact time with `filter`/`try_element_at`
  *    higher-order calls. ZERO shuffle of the fact side — the 100 TB
  *    path whenever the dimension fits in a broadcast (config
  *    histories always do).
  *
  * Semantics (both paths, pinned by AsOfJoinSpec and the q96/q97
  * oracles against DuckDB's native ASOF LEFT JOIN):
  *  - match condition: versionTime <= factTime (backward, inclusive);
  *  - facts with no version at or before them keep NULL payload (left
  *    join);
  *  - duplicate versions at one (key, time) resolve to the greatest
  *    payload struct (deterministic; DuckDB leaves this case undefined,
  *    so oracle dimensions keep version times unique);
  *  - `tolerance`: a match older than `tolerance` seconds is treated
  *    as no-match (NULL payload) — the guard against enriching with a
  *    config generations stale.
  */
object AsOfJoin {

  /** Version-payload columns: everything in `right` except the join
    * keys and the version-time column. */
  private def payloadCols(right: DataFrame, keys: Seq[String],
                          rightTime: String): Seq[String] =
    right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)

  /** Names both strategies claim internally; an input frame already
    * carrying one would produce duplicate/ambiguous columns instead of
    * a clear error (same guard family as Sketches.hllRegisters /
    * cmsEstimate). */
  private val internalNames =
    Set("__t", "__side", "__pay", "__eff", "__vt", "__versions")

  private def requireNoInternalNames(left: DataFrame,
                                     right: DataFrame): Unit = {
    val clash =
      (left.columns.toSeq ++ right.columns.toSeq).filter(internalNames)
    require(clash.isEmpty,
      s"input columns collide with as-of internal names: $clash")
  }

  private def applyTolerance(enriched: DataFrame, leftTime: String,
                             payload: Seq[String],
                             tolerance: Option[Long]): DataFrame =
    tolerance.fold(enriched) { tol =>
      val stale = col("__vt").isNull ||
        (col(leftTime).cast(LongType) - col("__vt")) > tol
      payload.foldLeft(enriched) { (df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
      }
    }

  /** Union+window as-of join — one shuffle on `keys`, linear in
    * |facts| + |versions|, no range cross product. Output = `left`'s
    * columns plus the version payload columns (NULL where unmatched or
    * out of tolerance). */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               tolerance: Option[Long] = None): DataFrame = {
    val payload = payloadCols(right, keys, rightTime)
    val leftOthers = left.columns.toSeq.filterNot(keys.contains)
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload/fact column collision: ${payload.intersect(left.columns.toSeq)}")
    requireNoInternalNames(left, right)

    // a NULL version time is not "since forever": the window fill
    // would sort it before every fact (NULLS FIRST) and seed the
    // whole key with it, while the broadcast path's <= comparison
    // silently drops it — exclude it in BOTH paths, explicitly
    val right0 = right.filter(col(rightTime).isNotNull)
    // one unioned relation: version rows carry the payload struct,
    // fact rows carry the fact columns; each side NULL-pads the other
    val pay = struct((col(rightTime).cast(LongType).as("__vt") +:
      payload.map(col)): _*)
    val rSel = right0.select(
      (keys.map(col) :+
        col(rightTime).cast(LongType).as("__t") :+
        lit(0).as("__side") :+
        pay.as("__pay")) ++
        leftOthers.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lSel = left.select(
      (keys.map(col) :+
        col(leftTime).cast(LongType).as("__t") :+
        lit(1).as("__side") :+
        lit(null).cast(rSel.schema("__pay").dataType).as("__pay")) ++
        leftOthers.map(col): _*)

    // facts sort after same-time versions (__side 1 > 0) → inclusive
    // "at or before"; duplicate-time versions sort by payload struct so
    // last() is the greatest payload (deterministic)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rSel.union(lSel)
      .withColumn("__eff", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      // output in left's column order (shared "left's columns plus
      // payload" contract with backwardBroadcast — keys-first here
      // used to silently reorder)
      .select((left.columns.toSeq.map(col) :+
        col("__eff.__vt").as("__vt")) ++
        payload.map(c => col(s"__eff.$c").as(c)): _*)
    applyTolerance(filled, leftTime, payload, tolerance)
      .drop("__vt")
  }

  /** Broadcast as-of lookup — the fact side is never shuffled: each
    * key's version history becomes one sorted array row, broadcast to
    * every executor, and the effective version is selected per fact row
    * with codegen'd array functions. Use when the whole dimension
    * history fits in a broadcast (the config-history case). */
  def backwardBroadcast(left: DataFrame, right: DataFrame,
                        keys: Seq[String], leftTime: String,
                        rightTime: String,
                        tolerance: Option[Long] = None): DataFrame = {
    val payload = payloadCols(right, keys, rightTime)
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"payload/fact column collision: ${payload.intersect(left.columns.toSeq)}")
    requireNoInternalNames(left, right)
    val pay = struct((col(rightTime).cast(LongType).as("__vt") +:
      payload.map(col)): _*)
    // sort_array orders structs field-by-field: (__vt asc, payload asc)
    // → the last qualifying element is the latest version, greatest
    // payload on duplicate times (same tie rule as [[backward]]);
    // NULL version times dropped explicitly (see [[backward]])
    val versions = right.filter(col(rightTime).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(pay)).as("__versions"))
    val lt = col(leftTime).cast(LongType)
    val eff = try_element_at(
      filter(col("__versions"), v => v("__vt") <= lt), lit(-1))
    val joined = left.join(broadcast(versions), keys, "left")
      .withColumn("__eff", eff)
      .select((left.columns.map(col) :+ col("__eff.__vt").as("__vt")) ++
        payload.map(c => col(s"__eff.$c").as(c)): _*)
    applyTolerance(joined, leftTime, payload, tolerance)
      .drop("__vt")
  }
}
