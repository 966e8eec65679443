package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AsOfJoinSpec extends SparkTest {
  import scala.jdk.CollectionConverters._

  // facts: (k, ts, v) — key 101's fact at ts=3 precedes every version
  private def facts: DataFrame = flowDf(Seq("k", "ts", "v"), Seq(
    Seq(100L, 4L, 1L),   // before first version of k=100
    Seq(100L, 5L, 2L),   // exactly AT a version time (inclusive match)
    Seq(100L, 19L, 3L),
    Seq(100L, 20L, 4L),  // at the second version
    Seq(100L, 90L, 5L),  // far past the last version (tolerance target)
    Seq(101L, 3L, 6L),   // no version at or before → NULL payload
    Seq(101L, 9L, 7L),
    Seq(102L, 50L, 8L))) // key with NO versions at all

  // versions: (k, vt, rate, site) — site NULL in k=100's second version
  // (version-atomicity: the fill must NOT leak 'a' from version one)
  private def versions: DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType, false), StructField("vt", LongType, false),
      StructField("rate", LongType, true), StructField("site", StringType, true)))
    spark.createDataFrame(Seq(
      Row(100L, 5L, 10L, "a"),
      Row(100L, 20L, 20L, null),
      Row(101L, 9L, 30L, "c")).asJava, schema)
  }

  private def collect(df: DataFrame): Seq[(Long, Long, Option[Long], Option[String])] =
    df.select("k", "ts", "rate", "site").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getAs[String](3))))
      .sortBy(t => (t._1, t._2))

  private val expected = Seq(
    (100L, 4L, None, None),
    (100L, 5L, Some(10L), Some("a")),
    (100L, 19L, Some(10L), Some("a")),
    (100L, 20L, Some(20L), None), // atomic: site stays NULL, not 'a'
    (100L, 90L, Some(20L), None),
    (101L, 3L, None, None),
    (101L, 9L, Some(30L), Some("c")),
    (102L, 50L, None, None))

  test("backward: inclusive at-or-before match, atomic payload, left join") {
    assert(collect(AsOfJoin.backward(
      facts, versions, Seq("k"), "ts", "vt")) == expected)
  }

  test("backwardBroadcast: bit-identical to the window path") {
    assert(collect(AsOfJoin.backwardBroadcast(
      facts, versions, Seq("k"), "ts", "vt")) == expected)
  }

  test("tolerance voids stale matches on both paths") {
    // tol=30: the ts=90 fact matched vt=20 (age 70) → payload voided
    val exp = expected.map {
      case (100L, 90L, _, _) => (100L, 90L, None, None)
      case e => e
    }
    assert(collect(AsOfJoin.backward(
      facts, versions, Seq("k"), "ts", "vt", Some(30L))) == exp)
    assert(collect(AsOfJoin.backwardBroadcast(
      facts, versions, Seq("k"), "ts", "vt", Some(30L))) == exp)
  }

  test("duplicate version times resolve to the greatest payload (both paths)") {
    val schema = StructType(Seq(
      StructField("k", LongType, false), StructField("vt", LongType, false),
      StructField("rate", LongType, true), StructField("site", StringType, true)))
    val dup = spark.createDataFrame(Seq(
      Row(100L, 5L, 10L, "a"),
      Row(100L, 5L, 7L, "z")).asJava, schema)
    val f = flowDf(Seq("k", "ts", "v"), Seq(Seq(100L, 6L, 1L)))
    for (out <- Seq(AsOfJoin.backward(f, dup, Seq("k"), "ts", "vt"),
                    AsOfJoin.backwardBroadcast(f, dup, Seq("k"), "ts", "vt")))
      assert(collect(out) == Seq((100L, 6L, Some(10L), Some("a"))))
  }

  test("broadcast path never shuffles the fact side") {
    val out = AsOfJoin.backwardBroadcast(facts, versions, Seq("k"), "ts", "vt")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"expected a broadcast of the version arrays:\n$plan")
    // the only shuffle is the (tiny) version-history aggregation; the
    // fact scan feeds the broadcast join directly
    val shuffles = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(shuffles <= 2, s"fact side must not shuffle:\n$plan")
    val win = "Window".r.findAllIn(plan).size
    assert(win == 0, s"broadcast path must not use a window:\n$plan")
  }

  test("backwardBroadcast joins stream-static: per-row event-time " +
    "enrichment across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)] // (k, ts)
    val enriched = AsOfJoin.backwardBroadcast(
      mem.toDF().toDF("k", "ts"), versions, Seq("k"), "ts", "vt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Option[Long])]()
    val q = enriched.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("asofstream").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add((r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))); ()
      }
      .start()
    try {
      mem.addData((100L, 4L), (100L, 5L))   // batch 1: before/at v1
      q.processAllAvailable()
      mem.addData((100L, 25L), (101L, 3L))  // batch 2: v2 / unmatched
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == Set(
      (100L, 4L, None), (100L, 5L, Some(10L)),
      (100L, 25L, Some(20L)), (101L, 3L, None)))
  }

  test("a NULL fact time enriches as NULL on both paths") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val f = spark.createDataFrame(
      Seq(Row(100L, null, 1L), Row(100L, java.lang.Long.valueOf(6L), 2L))
        .asJava,
      StructType(Seq(StructField("k", LongType, false),
        StructField("ts", LongType, true),
        StructField("v", LongType, false))))
    for (out <- Seq(
        AsOfJoin.backward(f, versions, Seq("k"), "ts", "vt"),
        AsOfJoin.backwardBroadcast(f, versions, Seq("k"), "ts", "vt"))) {
      val byV = out.collect()
        .map(r => r.getLong(out.columns.indexOf("v")) ->
          (if (r.isNullAt(out.columns.indexOf("rate"))) None
           else Some(r.getLong(out.columns.indexOf("rate"))))).toMap
      assert(byV == Map(1L -> None, 2L -> Some(10L)))
    }
  }

  test("a NULL version time is dropped, not 'since forever', on both paths") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vs = spark.createDataFrame(
      Seq(Row(100L, null, 99L, "x"),
        Row(100L, java.lang.Long.valueOf(5L), 10L, "a")).asJava,
      StructType(Seq(StructField("k", LongType, false),
        StructField("vt", LongType, true),
        StructField("rate", LongType, true),
        StructField("site", StringType, true))))
    val f = flowDf(Seq("k", "ts", "v"), Seq(Seq(100L, 3L, 1L),
      Seq(100L, 6L, 2L)))
    // without the filter the window path would seed ts=3 with rate 99
    for (out <- Seq(AsOfJoin.backward(f, vs, Seq("k"), "ts", "vt"),
        AsOfJoin.backwardBroadcast(f, vs, Seq("k"), "ts", "vt")))
      assert(collect(out) == Seq((100L, 3L, None, None),
        (100L, 6L, Some(10L), Some("a"))))
  }

  test("both paths emit left's columns in left's order, then payload") {
    val f = facts.select("ts", "k", "v") // key deliberately NOT first
    for (out <- Seq(AsOfJoin.backward(f, versions, Seq("k"), "ts", "vt"),
        AsOfJoin.backwardBroadcast(f, versions, Seq("k"), "ts", "vt")))
      assert(out.columns.toSeq == Seq("ts", "k", "v", "rate", "site"))
  }

  test("__-internal input names are rejected with a clear error") {
    val f = flowDf(Seq("k", "ts", "__pay"), Seq(Seq(1L, 2L, 3L)))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(f, versions, Seq("k"), "ts", "vt")
    }
    assert(e.getMessage.contains("internal"))
    val v = flowDf(Seq("k", "vt", "__versions"), Seq(Seq(1L, 2L, 3L)))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.backwardBroadcast(facts, v, Seq("k"), "ts", "vt")
    }
    assert(e2.getMessage.contains("internal"))
  }

  test("multi-column keys and payload/fact collision guard") {
    val f = flowDf(Seq("k1", "k2", "ts", "rate"), Seq(Seq(1L, 2L, 5L, 9L)))
    val d = flowDf(Seq("k1", "k2", "vt", "rate"), Seq(Seq(1L, 2L, 4L, 3L)))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(f, d, Seq("k1", "k2"), "ts", "vt")
    }
    assert(e.getMessage.contains("collision"))
    val ok = AsOfJoin.backward(f.drop("rate"), d, Seq("k1", "k2"), "ts", "vt")
    assert(ok.select("rate").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
