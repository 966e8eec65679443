package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time named contract queries on a given sf dir
  * (`runMain graft.TimeOne <sfDir> <query...>`), median of 3 through the
  * noop sink — the same measurement Bench takes, for iterating on one
  * query without a full bench sweep. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s median=${ts.sorted.apply(1)}%.2f s " +
        f"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
