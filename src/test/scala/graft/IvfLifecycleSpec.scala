package graft

import graft.operators.Similarity
import graft.operators.Similarity.{IvfF32, IvfForm, IvfInt8}
import org.apache.spark.sql.functions._

/** The persisted-IVF lifecycle matrix: ONE parameterized suite runs
  * build / append / compact / single search / batch search /
  * streaming ingest against BOTH storage forms through the
  * [[Similarity.IvfLifecycle]] facade, so the f32 and int8 families
  * cannot drift — a contract change that lands in only one form fails
  * the other form's row of the same test. (Supersedes the per-form
  * copies these assertions first shipped as.) */
class IvfLifecycleSpec extends SparkTest {

  private def emb = spark.read.parquet(
    "/root/testdata/sf0.001/embeddings.parquet")

  private lazy val cents = Similarity.kmeansCentroids(
    emb, "vec_id", "embedding", k = 4, iters = 2).localCheckpoint()

  private def tmp(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  /** Collected (id, score) rows — score stays `Any` so one comparator
    * serves f32 (Double sim) and int8 (Long dot). */
  private def search(form: IvfForm, dir: java.io.File,
                     query: org.apache.spark.sql.DataFrame)
      : Seq[(Long, Any)] =
    Similarity.IvfLifecycle.search(form, spark, dir.getAbsolutePath,
        query, "embedding", nprobe = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.get(1))).toSeq

  private def filesPerPart(base: java.io.File): Map[String, Int] =
    new java.io.File(base, "lists").listFiles()
      .filter(_.getName.startsWith("cid=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      .toMap

  for (form <- Seq[IvfForm](IvfF32, IvfInt8)) {

    test(s"$form: build half + append half searches identically to a " +
      "union-built index; probe literal still prunes partitions") {
      val query = emb.filter(col("vec_id") === 1)
      val data = emb.filter(col("vec_id") =!= 1)
      val full = tmp(s"ivf${form}full")
      val inc = tmp(s"ivf${form}inc")
      Similarity.IvfLifecycle.build(form, data, "vec_id", "embedding",
        cents, "cid", "cv", full.getAbsolutePath)
      Similarity.IvfLifecycle.build(form,
        data.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", cents, "cid", "cv", inc.getAbsolutePath)
      Similarity.IvfLifecycle.append(form, spark, inc.getAbsolutePath,
        data.filter(pmod(col("vec_id"), lit(2)) =!= 0),
        "vec_id", "embedding")
      // inverted lists are physical partitions
      val listDirs = new java.io.File(inc, "lists").listFiles()
        .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
      assert(listDirs.nonEmpty && listDirs.forall(_.matches("cid=\\d+")))
      val viaInc = Similarity.IvfLifecycle.search(form, spark,
        inc.getAbsolutePath, query, "embedding", nprobe = 2, k = 10)
      // append must not break the probe-literal partition pruning
      val plan = viaInc.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cid"),
        s"no partition pruning after append:\n$plan")
      val a = viaInc.collect().map(r => (r.getLong(0), r.get(1))).toSeq
      val b = search(form, full, query)
      assert(a == b, s"appended=$a full=$b")

      // compaction: append left >1 file in some partition; afterwards
      // every partition is ONE file and search is bit-identical
      assert(filesPerPart(inc).values.exists(_ > 1),
        s"append should leave multiple files: ${filesPerPart(inc)}")
      Similarity.IvfLifecycle.compact(spark, inc.getAbsolutePath)
      val after = filesPerPart(inc)
      assert(after.nonEmpty && after.values.forall(_ == 1),
        s"compaction must leave one file per list: $after")
      assert(search(form, inc, query) == a,
        s"compacted=${search(form, inc, query)} appended=$a")
    }

    test(s"$form: batched search equals a per-query loop of the " +
      "single-query path; probe union still prunes partitions") {
      val dir = tmp(s"ivf${form}batch")
      val qIds = Seq(1L, 2L, 3L)
      val data = emb.filter(!col("vec_id").isin(qIds: _*))
      Similarity.IvfLifecycle.build(form, data, "vec_id", "embedding",
        cents, "cid", "cv", dir.getAbsolutePath)
      val batch = Similarity.IvfLifecycle.searchBatch(form, spark,
        dir.getAbsolutePath, emb.filter(col("vec_id").isin(qIds: _*)),
        "vec_id", "embedding", nprobe = 2, k = 10)
      val plan = batch.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cid"),
        s"no partition pruning:\n$plan")
      def key(t: (Long, Long, Any)) = (t._1, t._2)
      val got = batch.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2)))
        .sortBy(key).toSeq
      val want = qIds.flatMap { qid =>
        search(form, dir, emb.filter(col("vec_id") === qid))
          .map { case (id, s) => (qid, id, s) }
      }.sortBy(key)
      assert(got == want, s"batch=$got loop=$want")
      // N=0 panel is the natural empty result, not an error
      val none = Similarity.IvfLifecycle.searchBatch(form, spark,
        dir.getAbsolutePath, emb.filter(lit(false)), "vec_id",
        "embedding", nprobe = 2, k = 10)
      assert(none.columns.take(2).toSeq == Seq("q_id", "id") &&
        none.count() == 0)
    }

    test(s"$form: streaming ingest via foreachBatch appends arriving " +
      "vectors; post-stream search equals union-built") {
      // the continuous-ingestion deployment shape: an embedding feed
      // appended to the live index per micro-batch through the stored
      // quantizer — no corpus-wide re-assignment, no index rebuild.
      // (Exactly-once contract: see appendToInt8IvfIndex's scaladoc —
      // MemoryStream + processAllAvailable gives it here.)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val query = emb.filter(col("vec_id") === 1)
      val data = emb.filter(col("vec_id") =!= 1)
      val full = tmp(s"ivf${form}sfull")
      val inc = tmp(s"ivf${form}sinc")
      Similarity.IvfLifecycle.build(form, data, "vec_id", "embedding",
        cents, "cid", "cv", full.getAbsolutePath)
      // seed the streaming index with the first half...
      Similarity.IvfLifecycle.build(form,
        data.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", cents, "cid", "cv", inc.getAbsolutePath)
      // ...and stream the second half in, two micro-batches
      val arriving = data.filter(pmod(col("vec_id"), lit(2)) =!= 0)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toSeq
      val mem = MemoryStream[(Long, Array[Float])]
      val q = mem.toDF().toDF("vec_id", "embedding").writeStream
        .outputMode("append")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"ivf${form}ckpt").toString)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.IvfLifecycle.append(form, spark,
            inc.getAbsolutePath, b, "vec_id", "embedding"); ()
        }
        .start()
      try {
        val (h1, h2) = arriving.splitAt(arriving.length / 2)
        mem.addData(h1); q.processAllAvailable()
        mem.addData(h2); q.processAllAvailable()
      } finally q.stop()
      assert(search(form, inc, query) == search(form, full, query),
        s"streamed=${search(form, inc, query)} " +
          s"full=${search(form, full, query)}")
    }
  }
}
