package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-inspection main: dumps formatted physical plans of the headline
  * queries (the evidence that pushdown/pruning/broadcast/codegen shapes
  * are what we want — see PLANS.md).
  *
  * SPARK_GRAFT_FINAL=1 additionally EXECUTES each query (collect — the
  * action that drives this QueryExecution) and prints the FINAL
  * adaptive plan after it: `ReusedExchange` insertion, AQE join
  * rewrites and checkpoint-backed scans only exist in the executed
  * plan, never in the static formatted one (VERDICT r21 #5 — reuse
  * claims must be provable from checked-in plans). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q05_scan_prune", "q03_filter_cidr", "q06_join_bcast",
        "q02_fwm_topn_others", "q14_geoip", "q29_mavg_decay",
        "q38_filter_v6", "q39_geoip_v6", "q44_embed_neardup",
        "q54_simhash_pairs", "q55_keywords", "q56_mix_sample",
        "q57_kmeans", "q58_kmeans_ivf", "q74_decode_dns_sni",
        "q76_ivf_batch", "q77_geodb_artifact")
    val wantFinal = sys.env.get("SPARK_GRAFT_FINAL").contains("1")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, dir)
      println(df.queryExecution.explainString(FormattedMode))
      if (wantFinal) {
        df.collect()
        println(s"----- $n FINAL ADAPTIVE PLAN (post-action) -----")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
