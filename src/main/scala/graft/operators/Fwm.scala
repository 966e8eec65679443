package graft.operators

import graft.filter.{Compiler, FieldSpec, FilterEnv}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixed-window aggregation ("fwm" in the reference): tumbling
  * epoch-aligned time buckets × group-by keys × summed measures, with
  * declared multi-key mixed-order sort and optional top-N+"others"
  * (reference monit-objects-fwm.c; window boundary `(now / T)` aligned to
  * the epoch at monit-objects-fwm.c:704; measure update
  * `vals[j] += v*scale*sampling_rate` at monit-objects.c:988-997).
  *
  * The reference's per-thread tries + atomic bank swap + merge become
  * Catalyst's partial/final hash aggregate over a shuffle — the same
  * partial-aggregation dance, but elastic across a cluster
  * (SURVEY.md §2.4). Runs identically over batch DataFrames and
  * foreachBatch micro-batches.
  */
object Fwm {

  /** One fwm section of a monitoring object (reference CONFIG.md:348-376).
    * @param fields  declared output fields: keys and measures with order
    * @param timeSec window length, default 30 (reference monit-objects.h:10)
    * @param limit   optional top-N with others row
    */
  final case class Conf(name: String, fields: Seq[String],
                        timeSec: Long = 30L, limit: Option[Int] = None)

  final case class Compiled(conf: Conf, keys: Seq[FieldSpec],
                            aggrs: Seq[FieldSpec], sortOrder: Seq[FieldSpec])

  def compile(conf: Conf): Either[String, Compiled] =
    FieldSpec.parseAll(conf.fields).map { specs =>
      val (aggrs, keys) = specs.partition(_.isAggr)
      Compiled(conf, keys, aggrs, specs)
    }

  /** Epoch-aligned bucket start from an epoch-seconds column. */
  def bucket(tsSec: Column, timeSec: Long): Column =
    (tsSec - (tsSec % timeSec)).cast(LongType)

  /** Epoch-seconds of a TimestampType column (streaming/real ingest). */
  def toEpochSec(ts: Column): Column = unix_timestamp(ts).cast(LongType)

  /** The scan + aggregate half of [[batch]] — epoch-bucketed groupBy +
    * summed measures, no finishing sort/top-N. This is the part whose
    * cost scales with the data; the finish is aggregate-sized. Exposed
    * so scan-vs-scan comparisons (SharedFwmBench) time symmetric work.
    *
    * @param tsCol epoch-seconds column (use [[toEpochSec]] for timestamps)
    */
  def aggregate(flows: DataFrame, env: FilterEnv, conf: Conf,
                tsCol: Column = col("ts_sec"),
                samplingRate: Option[Column] = None): DataFrame = {
    val compiled = compile(conf).fold(e => sys.error(e), identity)
    require(compiled.aggrs.nonEmpty,
      s"fwm '${conf.name}' needs at least one aggregable field")
    val rate = samplingRate.getOrElse(lit(1L))
    val keyCols = compiled.keys.map(k => k.column(env).as(k.sqlName))
    val aggCols = compiled.aggrs.map { a =>
      sum(a.column(env) * lit(a.scale) * rate).as(a.sqlName)
    }
    flows
      .groupBy((bucket(tsCol, conf.timeSec).as("time") +: keyCols): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Build the full batch pipeline over a flow DataFrame.
    *
    * Output columns: `time` (epoch secs) + one column per declared field
    * (its SQL-safe name), rows ordered by (time, declared field order),
    * with the others row (NULL keys) last inside each window.
    *
    * @param tsCol epoch-seconds column (use [[toEpochSec]] for timestamps)
    */
  def batch(flows: DataFrame, env: FilterEnv, conf: Conf,
            tsCol: Column = col("ts_sec"),
            samplingRate: Option[Column] = None): DataFrame =
    finishWindows(aggregate(flows, env, conf, tsCol, samplingRate), conf)

  /** Streaming mode: tumbling event-time windows with a watermark. The
    * same fieldset compiles to `groupBy(window(ts, T), keys).agg(sums)`;
    * in Append mode a window emits exactly once when the watermark passes
    * its end — the streaming analog of the reference's bank swap + dump
    * (monit-objects-fwm.c:665-682). Run the sort/top-N finish per closed
    * window via [[finishWindows]] inside foreachBatch.
    *
    * @param tsColName TimestampType column to window on
    * @param delay     watermark delay (reference drops late data by
    *                  design — INTERNALS.md:126-129 — so "0 seconds")
    */
  def stream(flows: DataFrame, env: FilterEnv, conf: Conf,
             tsColName: String = "ts",
             samplingRate: Option[Column] = None,
             delay: String = "0 seconds"): DataFrame = {
    val compiled = compile(conf).fold(e => sys.error(e), identity)
    require(compiled.aggrs.nonEmpty,
      s"fwm '${conf.name}' needs at least one aggregable field")
    val rate = samplingRate.getOrElse(lit(1L))
    val keyCols = compiled.keys.map(k => k.column(env).as(k.sqlName))
    val aggCols = compiled.aggrs.map { a =>
      sum(a.column(env) * lit(a.scale) * rate).as(a.sqlName)
    }
    flows
      .withWatermark(tsColName, delay)
      .groupBy((window(col(tsColName), s"${conf.timeSec} seconds") +:
        keyCols): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("time", unix_timestamp(col("window.start")))
      .drop("window")
  }

  /** Per-batch finish for streamed windows: declared sort + top-N+others
    * (apply inside foreachBatch, where each closed window's rows are
    * final). */
  def finishWindows(batch: DataFrame, conf: Conf): DataFrame = {
    val compiled = compile(conf).fold(e => sys.error(e), identity)
    val sortCols = compiled.sortOrder.map(f =>
      if (f.descending) col(f.sqlName).desc else col(f.sqlName).asc)
    val limited = conf.limit match {
      case Some(n) =>
        TopK.topNOthers(batch, Seq("time"),
          compiled.keys.map(_.sqlName), compiled.aggrs.map(_.sqlName),
          sortCols, n)
      case None => batch
    }
    val othersLast = compiled.keys.headOption
      .map(k => col(k.sqlName).isNull.cast("int").asc).toSeq
    limited.orderBy((col("time").asc +: othersLast) ++ sortCols: _*)
  }
}
