package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming HyperLogLog: live per-key distinct-cardinality state over
  * a continuous feed — the streaming face of [[Sketches.hllRegisters]].
  *
  * The reference keeps exact DISTINCT sets inside each fwm window
  * (monit-objects-fwm.c) because one collector sees a bounded slice; a
  * cluster-scale stream cannot (the distinct set IS the unbounded
  * state). An HLL register array is the bounded substitute: 2^p maxes
  * per key, mergeable, insensitive to re-delivery (max is idempotent —
  * an at-least-once source cannot corrupt it).
  *
  * Construction: the (reg, rho) assignment is the SAME column
  * expression the batch path uses ([[Sketches.hllRegRho]]) computed
  * BEFORE the stateful operator, so batch/stream sketch equality is by
  * construction; the processor only folds `max` per register.
  *
  * Emission contract (append mode): after each micro-batch, a key
  * emits the registers that INCREASED in that batch. Registers are
  * monotone, so for any (key, reg) the max over all emissions equals
  * the final state — `MAX(rho) GROUP BY key, reg` over the sink
  * reconstructs the batch sketch exactly, which is what the q99 oracle
  * asserts (duplicate-file replay included: a re-delivered batch
  * raises nothing and emits nothing).
  *
  * State: one Seq[Long] of 2^p rho values per key (dense; 0 =
  * unobserved), ~8·2^p bytes Avro-encoded — p=8 → ~2 KB per key,
  * bounded forever regardless of feed size.
  */
object StreamingSketch {

  /** Pre-hashed input row (built by [[hllUpdates]], column-level). */
  final case class RegRow(key: Long, reg: Int, rho: Long)
  /** Emitted register increase. */
  final case class RegUpd(key: Long, reg: Long, rho: Long)

  /** Per-key state: dense rho array (public — a `private` case class
    * defeats the state encoder's codegen and silently falls back to
    * interpreted projections). */
  final case class Regs(rho: Seq[Long])

  class HllProcessor(m: Int)
      extends StatefulProcessor[Long, RegRow, RegUpd] {

    @transient private var state: ValueState[Regs] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Regs]("hll",
        Encoders.product[Regs], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[RegRow],
        timerValues: TimerValues): Iterator[RegUpd] = {
      val cur = Option(state.get()).map(_.rho.toArray)
        .getOrElse(Array.fill(m)(0L))
      val changed = scala.collection.mutable.LinkedHashSet.empty[Int]
      rows.foreach { r =>
        if (r.rho > cur(r.reg)) { cur(r.reg) = r.rho; changed += r.reg }
      }
      if (changed.nonEmpty) state.update(Regs(cur.toSeq))
      changed.iterator.map(reg => RegUpd(key, reg.toLong, cur(reg)))
    }
  }

  /** Wire the operator over a streaming frame: emits (key, reg, rho)
    * register increases per micro-batch. `MAX(rho) GROUP BY key, reg`
    * over the collected output equals `Sketches.hllRegisters` of the
    * full replayed input; feed that through
    * [[Sketches.estimateFromRegisters]] for the live estimate. */
  def hllUpdates(df: DataFrame, keyCol: String, valueCol: String,
                 p: Int): Dataset[RegUpd] = {
    import df.sparkSession.implicits._
    // the key is carried as a Long through the state encoder; only
    // integral columns cast losslessly (a StringType key would cast
    // "AS65001" to NULL and kill the stream at the non-nullable
    // encoder, and "07"/"7" would MERGE where batch keeps two groups)
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    val keyType = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType)
      .contains(keyType),
      s"hllUpdates key column '$keyCol' must be integral, got $keyType" +
        " (hash or dictionary-encode other key types first)")
    val (reg, rho) = Sketches.hllRegRho(col(valueCol), p)
    // NULL keys/values cannot round-trip the non-nullable RegRow
    // encoder; the batch path would likewise md5(NULL) → no register.
    df.filter(col(keyCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol).cast("long").as("key"),
        reg.cast("int").as("reg"), rho.cast("long").as("rho"))
      .as[RegRow]
      .groupByKey(_.key)
      .transformWithState(new HllProcessor(1 << p), TimeMode.None(),
        OutputMode.Append())
  }
}
