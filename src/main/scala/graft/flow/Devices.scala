package graft.flow

import graft.filter.{Compiler, FilterEnv}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Device enrichment: per-exporter sampling rate + interface
  * classification marks + skip-unmarked drop (reference devices.c,
  * CONFIG.md:132-197; applied at ingest, netflow.c:126-144, 290-311).
  *
  * Semantics mirrored from device_get_mark (devices.c:238-285):
  *  - device matched by (ip AND id) if both configured, else by the one
  *    configured; FIRST matching device entry wins;
  *  - `dev_mark` = COUNT of the device's mark filter-expressions the
  *    flow matches (devices.c:276-281);
  *  - `skip-unmarked` on the matched device drops mark==0 flows;
  *  - sampling rate defaults to 1 when no device matches.
  *
  * The device list is configuration-sized, so enrichment compiles to a
  * when-chain of codegen'd predicates — no join, no shuffle, applied
  * inline in the scan stage at any data scale.
  */
object Devices {

  final case class Device(ip: Option[Long], id: Option[Long],
                          samplingRate: Long = 1L,
                          markRules: Seq[String] = Nil,
                          skipUnmarked: Boolean = false)

  private def devMatch(d: Device, devIp: Column, devId: Column): Column =
    (d.ip, d.id) match {
      case (Some(ip), Some(id)) => devIp === lit(ip) && devId === lit(id)
      case (Some(ip), None)     => devIp === lit(ip)
      case (None, Some(id))     => devId === lit(id)
      case (None, None)         => lit(false)
    }

  /** Adds/overwrites `sampling_rate` and `dev_mark`, drops unmarked flows
    * of skip-unmarked devices. Expects `dev_ip`/`dev_id` columns (the
    * decoder's virtual exporter-identity fields). */
  def enrich(df: DataFrame, devices: Seq[Device], env: FilterEnv,
             devIpCol: String = "dev_ip",
             devIdCol: String = "dev_id"): DataFrame = {
    val devIp = col(devIpCol)
    val devId = col(devIdCol)

    def markSum(d: Device): Column =
      if (d.markRules.isEmpty) lit(0L)
      else d.markRules.map { r =>
        Compiler.filterColumn(r, env)
          .fold(e => sys.error(s"device mark rule '$r': $e"), identity)
          .cast("int").cast(LongType)
      }.reduce(_ + _)

    val rate = devices.foldRight(lit(1L): Column) { (d, acc) =>
      when(devMatch(d, devIp, devId), lit(d.samplingRate)).otherwise(acc)
    }
    val mark = devices.foldRight(lit(null).cast(LongType): Column) {
      (d, acc) =>
        when(devMatch(d, devIp, devId), markSum(d)).otherwise(acc)
    }
    val dropIt = devices.foldRight(lit(false): Column) { (d, acc) =>
      when(devMatch(d, devIp, devId),
        if (d.skipUnmarked) markSum(d) === 0L else lit(false))
        .otherwise(acc)
    }

    df.withColumn("sampling_rate", rate)
      .withColumn("dev_mark", mark)
      .filter(!dropIt)
  }
}
