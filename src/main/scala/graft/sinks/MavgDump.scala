package graft.sinks

import org.apache.spark.sql.DataFrame

/** mavg debug dump: periodic text dump of decay-corrected per-key values
  * and their limits (reference monit-objects-mavg-dump.c:34-315 — the
  * `.d` value dump and `.a` per-key-limit override files operators use
  * for inspection, STEP-BY-STEP.md:888-919).
  *
  * The input is the bounded output of `Mavg.decayedFinal` (or a state
  * snapshot from the streaming processor), so a driver-side render is
  * the per-window-dump analog of the reference's file write.
  */
object MavgDump {

  /** `.d`-style dump: one line per key, fields comma-separated, the
    * decayed per-second value last (value = n / windowSec). */
  def dumpD(decayed: DataFrame, keyCols: Seq[String],
            windowSec: Long): String = {
    val rows = decayed.select((keyCols :+ "n").map(
      org.apache.spark.sql.functions.col): _*).collect()
    rows.map { r =>
      val keys = keyCols.indices.map(i => String.valueOf(r.get(i)))
      val perSec = r.getLong(keyCols.length).toDouble / windowSec
      (keys :+ f"$perSec%.3f").mkString(",")
    }.sorted.mkString("\n")
  }

  /** `.a`-style limits dump: key fields then each limit value. */
  def dumpA(limits: Map[Seq[String], Seq[Double]]): String =
    limits.toSeq.sortBy(_._1.mkString(","))
      .map { case (k, ls) =>
        (k ++ ls.map(l => f"$l%.3f")).mkString(",")
      }.mkString("\n")
}
