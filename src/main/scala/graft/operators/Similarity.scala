package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k baseline and an
  * LSH-bucketed approximate path for scale.
  *
  * The dot product / norms accumulate the float array cast to double
  * element-wise, summed left-to-right — a fixed IEEE op order, so the
  * DuckDB oracle (list_transform + list_reduce in the same order)
  * reproduces the doubles bit-for-bit. Since r8 the arithmetic runs in
  * a native codegen'd expression ([[graft.functions.VecDotExpr]]) — the
  * previous `aggregate(zip_with(...))` higher-order form interpreted a
  * lambda per element and allocated an intermediate array per row; the
  * expression is a tight generated loop with the IDENTICAL op order
  * (differential-tested in VecExprSpec), so oracles are unaffected.
  */
object Similarity {

  /** Σ a[i]*b[i] with left-to-right double accumulation (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.toColumn(graft.functions.VecDotExpr(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** The higher-order-function form `dot` replaced — kept as the
    * differential-test reference (same values, interpreted per element,
    * one intermediate array per row). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** [[cosine]] that yields NULL (undefined) instead of an ANSI
    * divide-by-zero error when either vector has zero norm — the SQL
    * registry's `vec_cosine`. */
  def cosineNullSafe(a: Column, b: Column): Column =
    cosinePre(a, b, norm2(a), norm2(b))

  /** cosine with both norms precomputed (bit-identical to [[cosine]]:
    * the factors are the same `sqrt(Σx²)` doubles multiplied in the same
    * order, just evaluated once per ROW instead of once per candidate
    * PAIR — the difference is O(|pairs|·dim) saved work, not a value
    * change, so DuckDB oracles written against [[cosine]] still match).
    * A zero norm on either side yields NULL (undefined cosine) instead
    * of the ANSI-mode divide-by-zero error — the `when` short-circuits
    * so nonzero-norm rows evaluate the identical Divide. */
  private def cosinePre(a: Column, b: Column, na: Column,
                        nb: Column): Column =
    when(na =!= 0.0 && nb =!= 0.0, dot(a, b) / (na * nb))

  /** Brute-force top-k nearest to one query vector. The per-row cosine is
    * embarrassingly parallel; the top-k is a TakeOrdered (no full sort).
    * The query norm rides the broadcast row (computed once, not per row).
    */
  def topK(df: DataFrame, idCol: String, vecCol: String,
           query: DataFrame, queryVecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(queryVecCol).as("__qv"),
      norm2(col(queryVecCol)).as("__qn")))
    df.crossJoin(q)
      .select(col(idCol),
        cosinePre(col(vecCol), col("__qv"),
          norm2(col(vecCol)), col("__qn")).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Random-hyperplane LSH signature: bit j = sign(dot(v, h_j)) where
    * h_j[i] ∈ {+1,-1} derives from md5(j|i) — deterministic, engine
    * independent. Vectors in the same bucket are cosine-close with high
    * probability; search only scans the query's bucket (the IVF-style
    * scale path: bucket count grows with nBits, candidate set shrinks). */
  /** The ±1 coefficient of hyperplane j at dimension i — deterministic
    * (one md5 hex nibble), so any engine can reproduce the exact
    * signature; the DuckDB oracle bakes these as literals. */
  def hyperplaneSign(j: Int, i: Int): Double =
    if ((Integer.parseInt(md5Hex(s"$j|$i").substring(0, 1), 16) & 1) == 1)
      1.0
    else -1.0

  def lshSignature(vec: Column, dim: Int, nBits: Int): Column = {
    // One native codegen'd expression (r8): the nBits×dim coefficient
    // matrix rides as a referenced double[] in the generated class (the
    // LPM-table pattern) — plan size stays O(1) in dim AND execution is
    // a tight loop (the previous nested-aggregate form interpreted a
    // lambda per element and allocated one zip_with array per PLANE per
    // row). Bit values are unchanged: each plane's dot accumulates
    // left-to-right in doubles from 0.0, short/null-element vectors
    // yield signature 0 — exactly the old fold's semantics
    // (differential-tested in VecExprSpec), so existing DuckDB oracles
    // that bake the same signs reproduce identical buckets.
    val planes = Array.tabulate(nBits * dim)(p =>
      hyperplaneSign(p / dim, p % dim))
    GraftBridge.toColumn(graft.functions.LshSignatureExpr(
      GraftBridge.toExpression(vec), planes, dim, nBits))
  }

  /** The nested-higher-order form `lshSignature` replaced — kept as the
    * differential-test reference. */
  private[graft] def lshSignatureHof(vec: Column, dim: Int,
                                     nBits: Int): Column = {
    val planes = typedlit((0 until nBits).map { j =>
      (0 until dim).map(i => hyperplaneSign(j, i))
    })
    val pows = typedlit((0 until nBits).map(j => 1L << j))
    // slice to the declared dim: zip_with null-pads the SHORTER side, so
    // a vector longer than dim would otherwise produce NULL products and
    // a 0 signature for every row (old element_at form truncated)
    val v = slice(vec, 1, dim)
    aggregate(
      sequence(lit(0), lit(nBits - 1)),
      lit(0L),
      (acc, j) => {
        val plane = element_at(planes, (j + 1).cast("int"))
        val s = aggregate(zip_with(v, plane,
          (x, c) => x.cast("double") * c), lit(0.0), (a, t) => a + t)
        acc + when(s >= 0, element_at(pows, (j + 1).cast("int")))
          .otherwise(lit(0L))
      })
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Bucketed ANN: group vectors by LSH signature, search only the
    * query's bucket. Returns top-k within the bucket. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              nBits: Int, query: DataFrame, queryVecCol: String,
              k: Int): DataFrame = {
    val sig = lshSignature(col(vecCol), dim, nBits)
    val bucketed = df.withColumn("__sig", sig)
    val q = broadcast(query
      .select(col(queryVecCol).as("__qv"),
        norm2(col(queryVecCol)).as("__qn"))
      .withColumn("__qsig", lshSignature(col("__qv"), dim, nBits)))
    bucketed.join(q, col("__sig") === col("__qsig"))
      .select(col(idCol),
        cosinePre(col(vecCol), col("__qv"),
          norm2(col(vecCol)), col("__qn")).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch ANN: top-k per query vector over a SET of queries — the
    * shape a training-data pipeline actually runs (dedup a shard
    * against an index, not one probe at a time). The bucket equi-join
    * replaces the per-query scan; work scales with bucket occupancy ×
    * queries, never |data| × |queries|. */
  def annTopKBatch(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   nBits: Int, queries: DataFrame, qIdCol: String,
                   qVecCol: String, k: Int): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
      lshSignature(col(vecCol), dim, nBits).as("__sig"),
      norm2(col(vecCol)).as("__n"))
    val q = broadcast(queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"),
      lshSignature(col(qVecCol), dim, nBits).as("__qsig"),
      norm2(col(qVecCol)).as("__qn")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(idCol).asc)
    bucketed.join(q, col("__sig") === col("__qsig"))
      .select(col("q_id"), col(idCol),
        cosinePre(col(vecCol), col("__qv"),
          col("__n"), col("__qn")).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** IVF top-k: coarse-quantize vectors to their nearest centroid
    * (broadcast centroid table + window argmax — one small join, no
    * iteration), probe the query's `nprobe` nearest centroids, search
    * only those inverted lists. The centroid table is caller-supplied
    * (k-means offline, or any deterministic subset); candidate count
    * scales with nprobe/|centroids|, not |data|. */
  private def prepCent(centroids: DataFrame, centIdCol: String,
                       centVecCol: String): DataFrame =
    broadcast(centroids.select(col(centIdCol).as("__cid"),
      col(centVecCol).as("__cv"), norm2(col(centVecCol)).as("__cn")))

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              centroids: DataFrame, centIdCol: String, centVecCol: String,
              nprobe: Int, query: DataFrame, queryVecCol: String,
              k: Int): DataFrame = {
    val cent = prepCent(centroids, centIdCol, centVecCol)
    // assignment: argmin over centroids as a partial-aggregated
    // min(struct(-sim, cid, …)) — the broadcast join fans each vector
    // out to k rows INSIDE the map task, and the partial aggregate
    // collapses them back to one row per vector before the shuffle, so
    // shuffle volume is |vectors|, independent of k. (A window argmin
    // here would shuffle all n×k rows — a k-fold amplification that
    // kills the plan at coarse-quantizer scale, k = 4096..65536.)
    // Negating the cosine turns argmax into struct-min; IEEE negation
    // is exact and order-reversing, and -0.0 < 0.0 under Spark's total
    // ordering mirrors the old `cs.desc` tie behavior. Ties on equal
    // sim go to the smaller __cid, same as before. The row norm is
    // computed ONCE per vector, not once per (vector, centroid).
    // A zero-norm centroid (or vector) divides by zero → NULL cosine;
    // struct-min sorts a NULL first field SMALLEST, which would let a
    // degenerate centroid win every argmin, so coalesce NULL to +Inf —
    // the nulls-last semantics the old `cs.desc` ordering had.
    val assigned = assignToCentroids(df, idCol, vecCol, cent)
    // probe list: the query's nprobe nearest centroids
    val probes = broadcast(query.select(col(queryVecCol).as("__qv"),
        norm2(col(queryVecCol)).as("__qn"))
      .join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .orderBy(col("__cs").desc, col("__cid").asc)
      .limit(nprobe)
      .select(col("__cid"), col("__qv"), col("__qn")))
    assigned.join(probes, "__cid")
      .select(col(idCol),
        cosinePre(col(vecCol), col("__qv"),
          col("__n"), col("__qn")).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** The IVF assignment step shared by [[ivfTopK]] (in-flight) and
    * [[buildIvfIndex]] (persisted): one row per vector with its nearest
    * centroid, shuffle volume |vectors| (see the argmin commentary
    * above). Returns (idCol, vecCol, __n, __cid). */
  private def assignToCentroids(df: DataFrame, idCol: String,
                                vecCol: String,
                                cent: DataFrame): DataFrame =
    df.select(col(idCol), col(vecCol), norm2(col(vecCol)).as("__n"))
      .join(cent)
      .withColumn("__csNeg",
        coalesce(
          -cosinePre(col(vecCol), col("__cv"), col("__n"), col("__cn")),
          lit(Double.PositiveInfinity)))
      .groupBy(col(idCol))
      .agg(min(struct(col("__csNeg"), col("__cid"),
        col(vecCol).as("__v"), col("__n").as("__vn"))).as("m"))
      .select(col(idCol), col("m.__v").as(vecCol),
        col("m.__vn").as("__n"), col("m.__cid").as("__cid"))

  /** Persist an IVF index: `dir/centroids` (cid, cv) and `dir/lists`
    * — the assignment output written PARTITIONED BY centroid id, so the
    * inverted lists are physical parquet partitions. Training and the
    * corpus-wide assignment pass (the expensive parts at 100 TB) run
    * once; every [[searchIvfIndex]] after that reads only its probes'
    * partitions (file-level pruning — nprobe/k of the data). */
  def buildIvfIndex(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, centIdCol: String,
                    centVecCol: String, dir: String): Unit = {
    centroids.select(col(centIdCol).as("cid"), col(centVecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    assignToCentroids(df, idCol, vecCol,
        prepCent(centroids, centIdCol, centVecCol))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("__n").as("norm"), col("__cid").as("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$dir/lists")
  }

  /** Incrementally extend a persisted IVF index with newly-ingested
    * vectors — the continuous-ingestion half of the index lifecycle
    * (at 100 TB the corpus never stops growing; re-running
    * [[buildIvfIndex]]'s corpus-wide assignment per ingest batch
    * would be quadratic over the index's life). Assignment reads the
    * index's OWN persisted quantizer (`dir/centroids`), so new rows
    * are placed by exactly the formula the build used, and land as
    * appended parquet files under the same `cid=` partitions: a
    * search after any number of appends is bit-identical to one over
    * an index built from the union at once (q79 oracle; spec'd).
    * The quantizer is NOT retrained — the standard IVF trade: cheap
    * ingest, recall drifts if the data distribution moves, rebuild
    * when it does. Caller contract: ids must be new to the index (a
    * re-appended id simply appears twice in search results, like any
    * duplicate row — route through [[Dedup.exact]] upstream if the
    * feed can re-deliver); each call adds one file per touched
    * partition, so compact lists periodically under high-frequency
    * small appends. The append is a blind parquet write — NOT
    * idempotent — so a streaming-ingest pathway (foreachBatch) must
    * be exactly-once: skip replayed batchIds, or periodically rewrite
    * the lists deduplicated by id (see [[appendToInt8IvfIndex]],
    * where a replayed partial write corrupts scores rather than
    * merely duplicating a result row). */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       dir: String, df: DataFrame, idCol: String,
                       vecCol: String): Unit =
    assignToCentroids(df, idCol, vecCol,
        prepCent(spark.read.parquet(s"$dir/centroids"), "cid", "cv"))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("__n").as("norm"), col("__cid").as("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(s"$dir/lists")

  /** Compact a persisted IVF index's inverted lists: each
    * [[appendToIvfIndex]] call leaves one more parquet file per
    * touched `cid=` partition, and search latency follows file count
    * (open + footer per file), so a high-frequency append cadence
    * needs periodic compaction. Rewrites every list clustered on cid
    * — one task owns all of a cid's rows, so each partition comes out
    * as ONE file — into a sibling directory, then swaps it in via two
    * renames (`lists`→`lists_old`, `lists_compacting`→`lists`, then
    * delete `lists_old`): at no point is there ZERO copies on disk, so
    * a crash mid-swap is recoverable by renaming whichever copy
    * survives back to `lists` (never delete-then-rename, whose crash
    * window destroys the index). Row content is untouched: searches
    * return bit-identical results before and after (spec'd). Run it
    * OFFLINE — a concurrent [[appendToIvfIndex]] landing between the
    * compaction's read and the swap is silently lost with the old
    * directory; searches racing the swap instant can transiently fail
    * and should retry. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      dir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val lists = new org.apache.hadoop.fs.Path(s"$dir/lists")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/lists_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$dir/lists_old")
    val fs = lists.getFileSystem(conf)
    if (fs.exists(old)) fs.delete(old, true) // prior-crash leftover
    spark.read.parquet(lists.toString)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(tmp.toString)
    if (!fs.rename(lists, old))
      sys.error(s"compaction swap failed moving $lists aside")
    if (!fs.rename(tmp, lists))
      sys.error(s"compaction swap failed installing $tmp; previous " +
        s"lists preserved at $old — rename it back to recover")
    fs.delete(old, true)
  }

  /** Search a persisted IVF index (single query vector, like
    * [[ivfTopK]]). Probe selection collects ≤ nprobe rows — bounded by
    * construction — so the list filter is LITERAL and parquet partition
    * pruning skips every non-probed inverted list on disk. Row norms
    * come from the index (computed once at build), so the cosine is
    * bit-identical to the in-flight path. Returns (id, sim). */
  def searchIvfIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String, query: DataFrame, queryVecCol: String,
                     nprobe: Int, k: Int): DataFrame = {
    val cent = prepCent(spark.read.parquet(s"$dir/centroids"),
      "cid", "cv")
    // single-query contract (like ivfTopK's practical use): with
    // multiple rows, probe selection would mix centroids chosen for
    // different vectors — silently wrong, so reject. This collect is
    // the ONLY execution of the caller's query plan; everything below
    // works from the collected row, with the vector's ELEMENT TYPE
    // preserved by rebuilding a one-row frame under the original
    // schema (a typedlit[Seq[Float]] here would corrupt double- or
    // integer-typed embeddings).
    val qProj = query.select(col(queryVecCol).as("__qv"))
    val qRows = qProj.limit(2).collect()
    require(qRows.length == 1,
      s"searchIvfIndex expects exactly one query row, got " +
        s"${if (qRows.isEmpty) "none" else "several"}")
    val q1 = broadcast(spark.createDataFrame(
        java.util.Collections.singletonList(qRows.head), qProj.schema)
      .withColumn("__qn", norm2(col("__qv"))))
    val probes = q1.join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .orderBy(col("__cs").desc, col("__cid").asc)
      .limit(nprobe)
      .select(col("__cid"), col("__qv"), col("__qn"))
    val probeRows = probes.collect() // bounded: ≤ nprobe rows
    require(probeRows.nonEmpty, "empty centroid table")
    val cids = probeRows.map(_.get(0)).toSeq
    spark.read.parquet(s"$dir/lists")
      .filter(col("cid").isin(cids: _*))
      .join(broadcast(probes.withColumnRenamed("__cid", "cid")), "cid")
      .select(col("id"),
        cosinePre(col("vec"), col("__qv"), col("norm"), col("__qn"))
          .as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Batch search over a persisted IVF index — the [[annTopKBatch]]
    * shape on the [[searchIvfIndex]] storage: per-query probe
    * selection is a window top-nprobe over the broadcast centroid
    * table (stays distributed — query vectors are never collected),
    * and the probe UNION is collected as the literal partition filter.
    * That collect is bounded by |centroids| distinct ids regardless of
    * batch size, so the literal-filter → parquet-partition-pruning
    * property of the single-query path survives arbitrarily large
    * query sets. Cosines reuse the index's stored norms, so each
    * (q_id, id) score is bit-identical to a per-query loop of
    * [[searchIvfIndex]]. Returns (q_id, id, sim), top-k per query. */
  def searchIvfIndexBatch(spark: org.apache.spark.sql.SparkSession,
                          dir: String, queries: DataFrame, qIdCol: String,
                          qVecCol: String, nprobe: Int,
                          k: Int): DataFrame = {
    val cent = prepCent(spark.read.parquet(s"$dir/centroids"),
      "cid", "cv")
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"), norm2(col(qVecCol)).as("__qn"))
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("__cs").desc, col("__cid").asc)
    val probes = q.join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__cid").as("cid"), col("__qv"),
        col("__qn"))
      // materialize ONCE (bounded: |batch| × nprobe rows). The probe
      // plan is consumed three times — the cids collect, the broadcast
      // join side, and the pruning subquery — and re-executing it
      // would re-read centroids 3× AND silently drop candidates if the
      // caller's queries frame is nondeterministic (sample/limit): a
      // cid probed in one execution but absent from another's literal
      // filter loses its whole list partition.
      .localCheckpoint()
    val cids = probes.select(col("cid")).distinct()
      .collect().map(_.get(0)).toSeq
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("id").asc)
    val lists = spark.read.parquet(s"$dir/lists")
    // empty batch (or empty centroid table) → empty result, the
    // natural N=0 of a batch API — not an error like the single-query
    // path's one-row contract
    if (cids.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q_id",
            q.schema("q_id").dataType),
          org.apache.spark.sql.types.StructField("id",
            lists.schema("id").dataType),
          org.apache.spark.sql.types.StructField("sim",
            org.apache.spark.sql.types.DoubleType))))
    lists
      .filter(col("cid").isin(cids: _*))
      .join(broadcast(probes), "cid")
      .select(col("q_id"), col("id"),
        cosinePre(col("vec"), col("__qv"), col("norm"), col("__qn"))
          .as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Distributed k-means (Lloyd) over integer-quantized vectors — the
    * trainer that produces [[ivfTopK]]'s centroid table.
    *
    * Every step is EXACT integer math, which makes the whole training
    * run deterministic and engine-portable (the DuckDB oracle replays
    * it bit-for-bit) — normally k-means can't be oracled because float
    * mean aggregation is order-dependent:
    *  - vectors quantize to floor(x·10^6) longs;
    *  - seeds are the k rows with smallest md5(id) (stable under
    *    resharding, no RNG);
    *  - assignment minimizes exact integer squared-L2, ties to the
    *    smaller centroid id;
    *  - the centroid update is an element-wise floor(sum/count) —
    *    floor-division on both engines;
    *  - empty clusters carry their previous centroid forward.
    *
    * Scale shape per iteration: centroids broadcast (k·dim longs);
    * assignment is a map-side argmin folded into a partial-aggregated
    * groupBy(id) min(struct) — no window, no n×k shuffle; the update
    * shuffles (cid, pos) partial sums only. Component sums stay exact
    * in a double up to 2^53 (≈ 9·10^9 rows at |x| ≤ 1); beyond that,
    * swap the floor(sum/count) to decimal division.
    *
    * @return exploded centroid table (cid, pos, cx), pos 1-based.
    */
  def kmeansQuantized(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    kmeansArrays(df, idCol, vecCol, k, iters, scale)
      .select(col("cid"), posexplode(col("cv")).as(Seq("pos0", "cx")))
      .select(col("cid"), (col("pos0") + 1).cast(LongType).as("pos"),
        col("cx"))
  }

  /** [[kmeansQuantized]]'s centroids dequantized to double arrays —
    * drop-in centroid table for [[ivfTopK]] (cid, cv). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int,
                      scale: Long = 1000000L): DataFrame =
    kmeansArrays(df, idCol, vecCol, k, iters, scale)
      .select(col("cid"),
        transform(col("cv"), x => x / lit(scale.toDouble)).as("cv"))

  private def kmeansArrays(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, iters: Int,
                           scale: Long): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val vq = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x * lit(scale.toDouble))
        .cast(LongType)).as("v"))
    val wSeed = Window.orderBy(col("__h").asc, col("id").asc)
    var cents = vq
      .withColumn("__h", md5(col("id").cast("string")))
      .orderBy(col("__h").asc, col("id").asc).limit(k)
      .withColumn("cid", row_number().over(wSeed).cast(LongType) - 1)
      .select(col("cid"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      // codegen'd integer distance (VecSqDistLongExpr) — this runs k
      // times per vector per iteration, the training hot loop
      val asg = vq.join(broadcast(cents))
        .withColumn("dist", GraftBridge.toColumn(
          graft.functions.VecSqDistLongExpr(
            GraftBridge.toExpression(col("v")),
            GraftBridge.toExpression(col("cv")))))
        .groupBy(col("id"))
        .agg(min(struct(col("dist"), col("cid"), col("v"))).as("m"))
        .select(col("m.cid").as("cid"), col("m.v").as("v"))
      val upd = asg
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"),
          floor(col("s").cast("double") / col("n")).cast(LongType)
            .as("cx")))).as("ps"))
        .select(col("cid"),
          transform(col("ps"), p => p.getField("cx")).as("cvNew"))
      // Lazy local checkpoint: truncates lineage across iterations
      // without executing the Lloyd rounds at plan-construction time
      // (eager = true would run every iteration on a mere .explain).
      // Tradeoff: local checkpoint blocks are not recomputable if an
      // executor is lost mid-job — acceptable for a bounded training
      // loop; a long multi-hour cluster run should swap this for
      // reliable .checkpoint() against a DFS checkpoint dir.
      cents = cents.join(upd, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cvNew"), col("cv")).as("cv"))
        .localCheckpoint(eager = false)
    }
    cents
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the memory side of the canonical
  // IVF-PQ answer at corpus scale: a d-dim float vector becomes m
  // small codes (m bytes at k ≤ 256), so a 100 TB embedding store
  // compresses ~4·d/m× and asymmetric-distance search reads codes,
  // never vectors. All math is the SAME integer-exact Lloyd as
  // [[kmeansQuantized]] (md5 seeds, (dist, cid) tie-break, floor-div
  // means), run independently per contiguous subspace, so the DuckDB
  // oracle replays training, encoding and search bit-for-bit
  // (OracleSql.pqCtes).
  // ------------------------------------------------------------------

  /** Train per-subspace codebooks: subspace j covers vector positions
    * [j·dim/m, (j+1)·dim/m). Returns (sub, cid, cv: array<long>) with
    * quantized centroid components (×scale, floored).
    *
    * The m trainings are independent small jobs (m ≤ 16 in practice);
    * each is the bounded Lloyd loop of [[kmeansQuantized]] over a
    * dim/m-wide slice — at corpus scale the slice projection prunes
    * the shuffle width by the same m factor the codes win at rest. */
  def pqTrainQuantized(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, m: Int, k: Int, iters: Int,
                       scale: Long = 1000000L): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    import org.apache.spark.sql.types.LongType
    val sub = dim / m
    // ONE keyed Lloyd loop over all m subspaces instead of m
    // independent loops (r21): the per-subspace recurrences are
    // completely independent, so keying every stage by `sub` runs them
    // inside ONE assignment join + ONE update aggregation per
    // iteration — m× fewer jobs, broadcasts, plan compiles and
    // checkpoints per iteration, and the broadcast join is an equi on
    // `sub` instead of m separate k-row cross joins. Bit-identical to
    // the per-subspace form: seeds are the same k ids for every
    // subspace (md5(id) ordering is slice-independent), quantize∘slice
    // = slice∘quantize elementwise, and the (dist, cid) argmin and
    // floor-div means never mix subspaces (every aggregation is keyed
    // by sub) — the q89/q90/q110 oracles replay the training
    // bit-for-bit and stay green across this rewrite.
    val vq = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x * lit(scale.toDouble))
        .cast(LongType)).as("v"))
    val slices = vq.select(col("id"),
      explode(array((0 until m).map(j =>
        struct(lit(j).cast(LongType).as("sub"),
          slice(col("v"), j * sub + 1, sub).as("sv"))): _*)).as("s"))
      .select(col("s.sub").as("sub"), col("id"), col("s.sv").as("sv"))
    val wSeed = Window.orderBy(col("__h").asc, col("id").asc)
    val seedIds = vq
      .withColumn("__h", md5(col("id").cast("string")))
      .orderBy(col("__h").asc, col("id").asc).limit(k)
      .withColumn("cid", row_number().over(wSeed).cast(LongType) - 1)
      .select(col("id"), col("cid"))
    var cents = slices.join(broadcast(seedIds), Seq("id"))
      .select(col("sub"), col("cid"), col("sv").as("cv"))
      .localCheckpoint(eager = false)
    def sq(a: Column, b: Column) = GraftBridge.toColumn(
      graft.functions.VecSqDistLongExpr(
        GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
    for (_ <- 0 until iters) {
      val asg = slices.join(broadcast(cents), Seq("sub"))
        .withColumn("dist", sq(col("sv"), col("cv")))
        .groupBy(col("sub"), col("id"))
        .agg(min(struct(col("dist"), col("cid"), col("sv"))).as("m"))
        .select(col("sub"), col("m.cid").as("cid"), col("m.sv").as("sv"))
      val upd = asg
        .select(col("sub"), col("cid"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("sub"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"),
          floor(col("s").cast("double") / col("n")).cast(LongType)
            .as("cx")))).as("ps"))
        .select(col("sub"), col("cid"),
          transform(col("ps"), p => p.getField("cx")).as("cvNew"))
      // lazy checkpoint per iteration: same lineage-truncation
      // tradeoff as kmeansArrays (see that loop's comment)
      cents = cents.join(upd, Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("cvNew"), col("cv")).as("cv"))
        .localCheckpoint(eager = false)
    }
    cents.select(col("sub").cast("int").as("sub"), col("cid"),
      col("cv"))
  }

  /** Encode every vector as its per-subspace nearest-centroid ids:
    * (id, codes: array<long>) with codes(j) = argmin over the subspace-j
    * codebook by (squared distance, cid). One broadcast of the m·k
    * codebook rows; the data-sized side is a single explode+agg. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, dim: Int, m: Int,
               scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val sub = dim / m
    val vq = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x * lit(scale.toDouble))
        .cast(LongType)).as("v"))
    val slices = vq.select(col("id"),
      explode(array((0 until m).map(j =>
        struct(lit(j).cast(LongType).as("sub"),
          slice(col("v"), j * sub + 1, sub).as("sv"))): _*)).as("s"))
      .select(col("id"), col("s.sub").as("sub"), col("s.sv").as("sv"))
    slices.join(broadcast(codebook), Seq("sub"))
      .withColumn("dist", GraftBridge.toColumn(
        graft.functions.VecSqDistLongExpr(
          GraftBridge.toExpression(col("sv")),
          GraftBridge.toExpression(col("cv")))))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("sub"),
        col("m.cid").as("code")))).as("ps"))
      .select(col("id"),
        transform(col("ps"), p => p.getField("code")).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k: the query row (by id) is sliced
    * once against the codebook into an m·k distance table — broadcast,
    * tiny — and every encoded vector's approximate distance is the sum
    * of m table lookups joined on (sub, code). No full vector is read
    * at search time; ties break by id. */
  def pqSearchADC(df: DataFrame, idCol: String, vecCol: String,
                  codebook: DataFrame, queryId: Long, dim: Int, m: Int,
                  topK: Int, scale: Long = 1000000L): DataFrame =
    pqAdcDistances(df, df, idCol, vecCol, codebook, queryId, dim, m,
        scale)
      .orderBy(col("adist").asc, col("id").asc)
      .limit(topK)

  /** The un-limited ADC core shared by [[pqSearchADC]] (whole corpus)
    * and [[ivfPqSearch]] (probed lists only): score `candidates`
    * against the query row looked up in `queryDf`. Returns
    * (id, adist). */
  private def pqAdcDistances(candidates: DataFrame, queryDf: DataFrame,
                             idCol: String, vecCol: String,
                             codebook: DataFrame, queryId: Long,
                             dim: Int, m: Int,
                             scale: Long): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val sub = dim / m
    val q = queryDf.filter(col(idCol) === queryId)
      .select(explode(array((0 until m).map(j =>
        struct(lit(j).cast(LongType).as("sub"),
          transform(slice(col(vecCol), j * sub + 1, sub),
            x => floor(x * lit(scale.toDouble)).cast(LongType))
            .as("qv"))): _*)).as("s"))
      .select(col("s.sub").as("sub"), col("s.qv").as("qv"))
    val table = codebook.join(broadcast(q), Seq("sub"))
      .withColumn("d", GraftBridge.toColumn(
        graft.functions.VecSqDistLongExpr(
          GraftBridge.toExpression(col("qv")),
          GraftBridge.toExpression(col("cv")))))
      .select(col("sub"), col("cid"), col("d"))
    pqEncode(candidates, idCol, vecCol, codebook, dim, m, scale)
      .select(col("id"), posexplode(col("codes")).as(Seq("pos", "code")))
      .join(broadcast(table),
        col("pos").cast(LongType) === col("sub") &&
          col("code") === col("cid"))
      .groupBy(col("id"))
      .agg(sum(col("d")).as("adist"))
  }

  /** IVF-PQ: the two corpus-scale halves composed. A coarse integer
    * k-means partitions the corpus into inverted lists (assignment =
    * broadcast argmin, shuffle |vectors| — same shape as [[ivfTopK]]'s
    * commentary); the query probes its `nprobe` nearest coarse
    * centroids; only vectors in the probed lists are ADC-scored
    * against the PQ codebook. Codes are trained on raw vectors (not
    * residuals — a documented simplification: residual PQ needs
    * per-list or shared-residual codebooks; raw-vector PQ keeps every
    * stage bit-replayable by the q90 oracle). At deployment the
    * assignment and codes are precomputed once (cf. buildIvfIndex);
    * the per-query cost is nprobe list scans of m-int codes. */
  def ivfPqSearch(df: DataFrame, idCol: String, vecCol: String,
                  coarseK: Int, coarseIters: Int, m: Int, pqK: Int,
                  pqIters: Int, nprobe: Int, queryId: Long, dim: Int,
                  topK: Int, scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val coarse = kmeansArrays(df, idCol, vecCol, coarseK, coarseIters,
      scale)
    val vq = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x * lit(scale.toDouble))
        .cast(LongType)).as("v"))
    def sq(a: Column, b: Column) = GraftBridge.toColumn(
      graft.functions.VecSqDistLongExpr(
        GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
    val assigned = vq.join(broadcast(coarse))
      .withColumn("dist", sq(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).as("a"))
      .select(col("id"), col("a.cid").as("ccid"))
    val probes = broadcast(
      coarse.join(broadcast(vq.filter(col("id") === queryId)
          .select(col("v").as("qv"))))
        .withColumn("dist", sq(col("qv"), col("cv")))
        .orderBy(col("dist").asc, col("cid").asc)
        .limit(nprobe)
        .select(col("cid").as("ccid")))
    val candIds = assigned.join(probes, Seq("ccid")).select(col("id"))
    val cand = df.join(candIds,
      df(idCol) === candIds("id"), "left_semi")
    val book = pqTrainQuantized(df, idCol, vecCol, dim, m, pqK,
      pqIters, scale)
    pqAdcDistances(cand, df, idCol, vecCol, book, queryId, dim, m,
        scale)
      .orderBy(col("adist").asc, col("id").asc)
      .limit(topK)
  }

  /** IVF-PQ with RESIDUAL encoding — the opt-in alternative to
    * [[ivfPqSearch]]'s raw-vector codes, and the standard form at
    * 100 TB recall targets: PQ codes quantize `v − c(v)` (the vector
    * minus its coarse centroid) instead of `v`, so the codebook spends
    * its resolution on the WITHIN-list geometry rather than re-encoding
    * the coarse structure the IVF already captured. One SHARED residual
    * codebook across lists (the per-list-codebook variant multiplies
    * codebook memory by coarseK for marginal gain).
    *
    * Everything stays integer-exact and oracle-replayable (q110): the
    * residual of two quantized vectors is an exact long array, and the
    * PQ half runs on it with scale = 1 (floor(x·1) on integer-valued
    * doubles is the identity — no second quantization error).
    *
    * Search differs from the raw form in ONE structural way: the ADC
    * distance table is PER PROBED LIST (the query's residual is
    * relative to each probe's centroid), so the broadcast is
    * nprobe·m·pqK entries instead of m·pqK — still tiny — and each
    * candidate joins the table of ITS OWN list via its coarse id.
    * Scale shape otherwise identical to [[ivfPqSearch]]: assignment =
    * broadcast argmin over |vectors|, residual training runs the same
    * bounded Lloyd loop, candidates restricted to the probed lists. */
  def ivfPqSearchResidual(df: DataFrame, idCol: String, vecCol: String,
                          coarseK: Int, coarseIters: Int, m: Int,
                          pqK: Int, pqIters: Int, nprobe: Int,
                          queryId: Long, dim: Int, topK: Int,
                          scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val coarse = kmeansArrays(df, idCol, vecCol, coarseK, coarseIters,
      scale) // (cid, cv: array<long>)
    val vq = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => floor(x * lit(scale.toDouble))
        .cast(LongType)).as("v"))
    def sq(a: Column, b: Column) = GraftBridge.toColumn(
      graft.functions.VecSqDistLongExpr(
        GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
    // coarse assignment, keeping the vector for the residual
    val assigned = vq.join(broadcast(coarse))
      .withColumn("dist", sq(col("v"), col("cv")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"), col("v"))).as("a"))
      .select(col("id"), col("a.cid").as("ccid"), col("a.v").as("v"))
    // lazy checkpoint (r21): resid feeds BOTH the codebook training
    // and the probed-list candidate prune — without it the coarse
    // assignment join + argmin aggregation re-runs for each consumer.
    // At deployment this is the materialized assignment table
    // (buildIvfIndex's artifact); same eager-on-first-use tradeoff as
    // kmeansArrays' iteration checkpoint.
    val resid = assigned.join(broadcast(coarse),
        col("ccid") === col("cid"))
      .select(col("id"), col("ccid"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("rv"))
      .localCheckpoint(eager = false)
    // shared residual codebook: the SAME exact Lloyd as the raw path,
    // identity-quantized (scale 1) over the integer residuals
    val residF = resid.select(col("id"), col("ccid"),
      transform(col("rv"), x => x.cast("double")).as("rvd"))
    val book = pqTrainQuantized(residF, "id", "rvd", dim, m, pqK,
      pqIters, scale = 1L)
    // query probes + per-list query residuals
    val qv = vq.filter(col("id") === queryId).select(col("v").as("qv"))
    val probes = broadcast(
      coarse.join(broadcast(qv))
        .withColumn("dist", sq(col("qv"), col("cv")))
        .orderBy(col("dist").asc, col("cid").asc)
        .limit(nprobe)
        .select(col("cid").as("pcid"), col("cv").as("pcv")))
    val sub = dim / m
    val qres = probes.join(broadcast(qv))
      .select(col("pcid"),
        explode(array((0 until m).map(j =>
          struct(lit(j).cast(LongType).as("sub"),
            slice(zip_with(col("qv"), col("pcv"), (x, c) => x - c),
              j * sub + 1, sub).as("qr"))): _*)).as("s"))
      .select(col("pcid"), col("s.sub").as("sub"), col("s.qr").as("qr"))
    // per-list ADC tables: nprobe·m·pqK entries, broadcast
    val table = book.join(broadcast(qres), Seq("sub"))
      .withColumn("d", sq(col("qr"), col("cv")))
      .select(col("pcid"), col("sub"), col("cid"), col("d"))
    // candidates: the probed lists' residuals, PQ-encoded
    val cand = resid.join(probes.select(col("pcid")),
      col("ccid") === col("pcid"), "left_semi")
    val candF = cand.select(col("id"), col("ccid"),
      transform(col("rv"), x => x.cast("double")).as("rvd"))
    val codes = pqEncode(candF, "id", "rvd", book, dim, m, scale = 1L)
    codes
      .join(candF.select(col("id"), col("ccid")), Seq("id"))
      .select(col("id"), col("ccid"),
        posexplode(col("codes")).as(Seq("pos", "code")))
      .join(broadcast(table),
        col("ccid") === col("pcid") &&
          col("pos").cast(LongType) === col("sub") &&
          col("code") === col("cid"))
      .groupBy(col("id"))
      .agg(sum(col("d")).as("adist"))
      .orderBy(col("adist").asc, col("id").asc)
      .limit(topK)
  }

  /** Int8 scalar quantization of unit-normalized embeddings — the
    * storage form an index holds at corpus scale (4× smaller than f32,
    * dot products stay within ~1% for cosine ranking). Emitted as
    * (id, pos, q) rows: q = floor(x·127/‖v‖ + 0.5), exact integer
    * output both engines can reproduce (mirrored IEEE op order; zero
    * vectors yield NULL via the norm guard). `carryCols` ride along
    * unchanged (e.g. an IVF list id — avoids a post-hoc join back
    * onto the exploded rows); `normCol` points at a PRECOMPUTED
    * ‖v‖ column (same norm2 arithmetic) so a pipeline that already
    * paid the Σx² (e.g. centroid assignment) doesn't pay it twice. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String,
                   carryCols: Seq[String] = Nil,
                   normCol: Option[String] = None): DataFrame =
    df.select((col(idCol) +: carryCols.map(col)) ++ Seq(
        normCol.map(col).getOrElse(norm2(col(vecCol))).as("__qin"),
        posexplode(col(vecCol)).as(Seq("pos", "__x"))): _*)
      .select((col(idCol) +: carryCols.map(col)) ++ Seq(
        (col("pos") + 1).as("pos"),
        when(col("__qin") =!= 0.0,
          floor(col("__x").cast("double") * 127 / col("__qin") + 0.5)
            .cast("long")).as("q")): _*)

  /** Top-k search DIRECTLY over the int8-quantized form
    * [[quantizeInt8]] emits — the read side of the 4×-smaller index: a
    * pure INTEGER dot product Σ q_i·p_i ranks candidates (for
    * unit-normalized quantized vectors the integer dot is a monotone
    * ~cosine surrogate within quantization error), exact and
    * engine-replayable, no float in the plan. One broadcast of the
    * quantized query + one map-side-combined per-id sum + TakeOrdered:
    * the corpus side never shuffles more than (id, partial-dot) rows.
    * Zero-norm rows ([[quantizeInt8]] emits NULL q) never rank.
    *
    * The query frame must hold exactly ONE vector: [[quantizeInt8]]
    * emits per-(vec_id, pos) rows, and this ranker sums Σ q_i·p_i per
    * corpus id — two query vectors' rows would silently mix into one
    * meaningless ranking. Guarded on the (tiny, broadcast) query
    * side: a duplicate `posCol` value — the signature of a
    * multi-vector or malformed frame — fails the plan at execution
    * with assert_true instead of returning garbage. */
  def int8TopK(qdf: DataFrame, idCol: String, posCol: String,
               qCol: String, query: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k out of [1,∞)")
    val q = broadcast(query.where(col(qCol).isNotNull)
      .groupBy(col(posCol).as("__qp"))
      .agg(max(col(qCol)).as("__q0"), count(lit(1)).as("__c"))
      .select(col("__qp"),
        (col("__q0") + coalesce(
          assert_true(col("__c") === 1,
            lit("int8TopK: query frame holds more than one vector " +
              "(duplicate pos) — pass a single quantized query"))
            .cast("long"), lit(0L))).as("__qq")))
    qdf.where(col(qCol).isNotNull)
      .join(q, col(posCol) === col("__qp"))
      .groupBy(col(idCol))
      .agg(sum(col(qCol) * col("__qq")).as("dot"))
      .orderBy(col("dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batched [[int8TopK]]: rank the quantized corpus against a PANEL
    * of quantized queries at once — the [[annTopKBatch]] /
    * [[searchIvfIndexBatch]] shape for the int8 form, and the proper
    * home for a multi-vector query frame (the single-query ranker
    * rejects one by design). `queries` is [[quantizeInt8]] output
    * KEYED by its own id column; output (q_id, idCol, dot), top-k per
    * query by the integer dot.
    *
    * Scale shape: the panel broadcasts (quantized queries are
    * dim+ε bytes each); the corpus-side join fans each (id, pos, q)
    * row out to |panel| rows INSIDE the map task and the partial
    * aggregate collapses them to one (q_id, id) row per pair before
    * the shuffle — so the exchange carries |panel|·|corpus| partial
    * dots, and the per-query window rank is the same bounded
    * top-k-per-group cut annTopKBatch takes. Exact ranking with no
    * pruning: bound the panel size, or go through
    * [[searchInt8IvfIndexBatch]] when the corpus side must be pruned
    * too — the panel shape over the persisted index, one plan, no
    * driver loop. */
  def int8TopKBatch(qdf: DataFrame, idCol: String, posCol: String,
                    qCol: String, queries: DataFrame, qIdCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k=$k out of [1,∞)")
    // same malformed-frame guard as [[int8TopK]], per panel member: a
    // duplicated (q_id, pos) — two vectors sharing a q_id — would
    // silently mix into one garbage ranking, so fail the plan instead
    val q = broadcast(queries.where(col(qCol).isNotNull)
      .groupBy(col(qIdCol).as("q_id"), col(posCol).as("__qp"))
      .agg(max(col(qCol)).as("__q0"), count(lit(1)).as("__c"))
      .select(col("q_id"), col("__qp"),
        (col("__q0") + coalesce(
          assert_true(col("__c") === 1,
            lit("int8TopKBatch: panel holds more than one vector per " +
              "q_id (duplicate (q_id, pos)) — ids must be unique"))
            .cast("long"), lit(0L))).as("__qq")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("dot").desc, col(idCol).asc)
    qdf.where(col(qCol).isNotNull)
      .join(q, col(posCol) === col("__qp"))
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col(qCol) * col("__qq")).as("dot"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** IVF search over an INT8 index — [[ivfTopK]]'s pruning composed
    * with [[quantizeInt8]]'s storage form, the full corpus-scale
    * story in one plan: the inverted lists hold int8 rows (4× smaller
    * than f32 — at 100 TB of embeddings the index is 25 TB), the
    * coarse quantizer prunes to `nprobe` lists (the scan reads
    * nprobe/k of the index), and the probed candidates rank by
    * [[int8TopK]]'s pure integer dot (no float decode of the lists,
    * ever). Exact and engine-replayable end to end: assignment is the
    * same argmin-cosine rule as [[ivfTopK]] (one oracle replay for
    * both), quantization and ranking are integer-exact.
    *
    * Plan shape: centroids broadcast twice (assignment fan-out is
    * collapsed map-side before any shuffle; probe list is an
    * nprobe-row broadcast), the int8 lists shuffle ONCE on the
    * semi-join's cid, and the ranking's per-id partial sums combine
    * map-side — candidate-side traffic is (id, partial-dot) rows.
    * `query` must hold exactly one vector ([[int8TopK]]'s guard
    * applies). Returns (idCol, dot), dot descending, k rows. */
  def int8IvfTopK(df: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame, centIdCol: String,
                  centVecCol: String, nprobe: Int,
                  query: DataFrame, queryVecCol: String,
                  k: Int): DataFrame =
    int8IvfSearch(
      int8IvfIndex(df, idCol, vecCol, centroids, centIdCol, centVecCol),
      idCol, centroids, centIdCol, centVecCol, nprobe,
      query, queryVecCol, k)

  /** Build the int8 IVF index — the PERSISTED artifact of the
    * [[int8IvfTopK]] composition (write it as parquet partitioned by
    * `cid`, the q73 ivf-index pattern, and every later search prunes
    * to nprobe partitions at the SCAN): (cid, idCol, pos, q) rows,
    * dim+ε bytes per vector vs f32's 4·dim. Assignment is
    * [[ivfTopK]]'s argmin-cosine rule; quantization is
    * [[quantizeInt8]], carried through the assignment so nothing
    * joins back onto 64×n exploded rows. */
  def int8IvfIndex(df: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, centIdCol: String,
                   centVecCol: String): DataFrame = {
    val cent = prepCent(centroids, centIdCol, centVecCol)
    val asg = assignToCentroids(df.select(col(idCol), col(vecCol)),
      idCol, vecCol, cent)
    // assignment already computed each vector's norm (__n) — reuse it
    // instead of paying a second Σx² per row on the build path
    quantizeInt8(asg, idCol, vecCol, carryCols = Seq("__cid"),
        normCol = Some("__n"))
      .withColumnRenamed("__cid", "cid")
  }

  /** Search an [[int8IvfIndex]]: prune to the query's nprobe nearest
    * lists (broadcast of nprobe rows), rank the probed candidates by
    * [[int8TopK]]'s pure integer dot. Train-once/index-once/
    * search-many: this side touches only the index — no f32 corpus
    * access, no re-quantization per query. */
  def int8IvfSearch(lists: DataFrame, idCol: String,
                    centroids: DataFrame, centIdCol: String,
                    centVecCol: String, nprobe: Int,
                    query: DataFrame, queryVecCol: String,
                    k: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe out of [1,∞)")
    val cent = prepCent(centroids, centIdCol, centVecCol)
    val probes = broadcast(query
      .select(col(queryVecCol).as("__qv"),
        norm2(col(queryVecCol)).as("__qn"))
      .join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .orderBy(col("__cs").desc, col("__cid").asc)
      .limit(nprobe)
      .select(col("__cid").as("cid")))
    val cand = lists.join(probes, Seq("cid"), "left_semi")
    int8TopK(cand, idCol, "pos", "q",
      quantizeInt8(query.select(col(queryVecCol).as("__qv"))
        .withColumn("__qid", lit(0L)), "__qid", "__qv"),
      k)
  }

  /** Batched [[int8IvfSearch]] — the in-flight half of the panel
    * matrix ([[searchInt8IvfIndexBatch]] is the persisted half; q130/
    * q132's relation, for panels): rank a query PANEL against
    * in-flight int8 lists with IVF pruning and NO driver action
    * anywhere — fully lazy, streaming-composable. Per-query probe
    * lists come from a window top-nprobe over the broadcast centroid
    * table; the (q_id, cid) probe pairs broadcast and their INNER
    * join against the lists IS the prune (a list row in an unprobed
    * cid matches nothing — no literal filter needed off-disk, no
    * probe collect, the one plan-shape difference from the persisted
    * form); the quantized panel broadcasts with [[int8TopKBatch]]'s
    * duplicate-(q_id, pos) guard; per-(q_id, id) integer dots combine
    * map-side. Returns (q_id, idCol, dot), top-k per query.
    *
    * PANEL-SIZE BOUND: the quantized panel and the (q_id, cid) probe
    * table are hint-broadcast — the whole point of the batch form is
    * that every list row sees only its probing queries without a
    * shuffle, and that requires the panel on every executor. At
    * dim 64 a panel row is ~70 bytes quantized (+ nprobe 16-byte
    * probe pairs), so the practical ceiling is a few million queries
    * against the default 8 GB broadcast limit and driver heap — a
    * PANEL, not a second corpus. Joining corpus-against-corpus is a
    * different operator (block both sides: [[nearDupPairs]] /
    * [[semanticDedup]]); feeding one through this API would OOM the
    * driver by design, not by accident. */
  def int8IvfSearchBatch(lists: DataFrame, idCol: String,
                         centroids: DataFrame, centIdCol: String,
                         centVecCol: String, nprobe: Int,
                         queries: DataFrame, qIdCol: String,
                         qVecCol: String, k: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe out of [1,∞)")
    require(k >= 1, s"k=$k out of [1,∞)")
    val cent = prepCent(centroids, centIdCol, centVecCol)
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"))
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("__cs").desc, col("__cid").asc)
    val probes = q
      .withColumn("__qn", norm2(col("__qv")))
      .join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__cid").as("cid"))
    int8PanelRank(lists, idCol, probes, q, k)
  }

  /** Shared downstream of the in-flight panel searches: broadcast the
    * quantized panel + the (q_id, cid) probe pairs, inner-join-prune
    * the lists, map-side-collapse the integer dots, window top-k per
    * query. `q` = (q_id, __qv); `probes` = (q_id, cid). */
  private def int8PanelRank(lists: DataFrame, idCol: String,
                            probes: DataFrame, q: DataFrame,
                            k: Int): DataFrame = {
    val panel = broadcast(quantizeInt8(q, "q_id", "__qv")
      .where(col("q").isNotNull)
      .groupBy(col("q_id").as("__pq"), col("pos").as("__qp"))
      .agg(max(col("q")).as("__q0"), count(lit(1)).as("__c"))
      .select(col("__pq"), col("__qp"),
        (col("__q0") + coalesce(
          assert_true(col("__c") === 1,
            lit("int8IvfSearchBatch: panel holds more than one " +
              "vector per q_id (duplicate (q_id, pos)) — ids must " +
              "be unique"))
            .cast("long"), lit(0L))).as("__qq")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dot").desc, col(idCol).asc)
    lists
      .where(col("q").isNotNull)
      .join(broadcast(probes), "cid")
      .join(panel,
        col("q_id") === col("__pq") && col("pos") === col("__qp"))
      .groupBy(col("q_id"), col(idCol))
      .agg(sum(col("q") * col("__qq")).as("dot"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** TWO-LEVEL probe assignment for the in-flight panel search — the
    * answer to the flat form's one remaining scale wall: [[
    * int8IvfSearchBatch]] scores every query against EVERY centroid
    * before its window cut (|panel|·|centroids| rows), which is right
    * up to ~2¹⁶ lists but dominates the plan at web-index scale
    * (2²⁰ lists × a 10⁶ panel = 10¹² probe rows). The standard fix
    * (IMI/two-level IVF): quantize the CENTROID SET itself through a
    * coarse quantizer — each centroid is assigned once to its nearest
    * coarse cell (query-independent: |centroids|·|coarse| rows, reuse
    * it across panels), a query scores only the |coarse| ≈
    * √|centroids| cells (top-`nprobeCoarse` by the same cosine), and
    * the final top-`nprobe` centroid selection ranks only the
    * centroids INSIDE the probed cells (≈ nprobeCoarse·|centroids|/
    * |coarse| rows per query). Probe-stage cost per query drops from
    * |centroids| to |coarse| + nprobeCoarse·|centroids|/|coarse| —
    * at 2²⁰ lists with 2¹⁰ coarse cells, ~3·10³ vs 10⁶.
    *
    * APPROXIMATE by design: a true top-nprobe centroid hiding in an
    * unprobed coarse cell is missed (the classic IVF recall trade one
    * level up); raise `nprobeCoarse` to trade cost for probe recall.
    * Downstream is [[int8PanelRank]] — identical pruning, dots and
    * ranking; results equal the flat form whenever the two-level
    * selection picks the same probes (spec'd: exhaustive nprobeCoarse
    * ≡ flat). */
  def int8IvfSearchBatchTwoLevel(lists: DataFrame, idCol: String,
                                 centroids: DataFrame,
                                 centIdCol: String, centVecCol: String,
                                 coarse: DataFrame, coarseIdCol: String,
                                 coarseVecCol: String,
                                 nprobeCoarse: Int, nprobe: Int,
                                 queries: DataFrame, qIdCol: String,
                                 qVecCol: String, k: Int): DataFrame = {
    require(nprobeCoarse >= 1,
      s"nprobeCoarse=$nprobeCoarse out of [1,∞)")
    require(nprobe >= 1, s"nprobe=$nprobe out of [1,∞)")
    require(k >= 1, s"k=$k out of [1,∞)")
    // an empty coarse set would make qcells an empty join and every
    // query silently return zero rows — fail fast like the nprobe/k
    // requires (ADVICE r20). The √|centroids|-sized projection is
    // lazily checkpointed FIRST so the guard's job is also the frame
    // every downstream join reads: an uncached expensive coarse
    // derivation is computed once, not once for the guard and again
    // per consumer (ADVICE r21).
    val coSlim = coarse.select(col(coarseIdCol).as("__cid"),
      col(coarseVecCol).as("__cv")).localCheckpoint(false)
    require(!coSlim.isEmpty,
      "int8IvfSearchBatchTwoLevel: empty coarse set")
    val co = prepCent(coSlim, "__cid", "__cv")
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"))
    // level 0 (query-independent): every centroid → its nearest
    // coarse cell, via the same map-side-collapsed argmin the corpus
    // assignment uses (a window here would SHUFFLE the full
    // |centroids|·|coarse| cross product; the struct-min collapses it
    // to |centroids| rows before the exchange). Ties on equal cosine
    // go to the smaller cell id — identical to the flat form's
    // ordering, so the oracle replays it as a window.
    val cellOf = assignToCentroids(
        centroids.select(col(centIdCol).as("__pcid"),
          col(centVecCol).as("__pcv")), "__pcid", "__pcv", co)
      .select(col("__pcid"), col("__pcv"), col("__n").as("__pcn"),
        col("__cid").as("__gid"))
    // level 1: per query, top-nprobeCoarse coarse cells (window over
    // |panel|·|coarse| rows — |coarse| ≈ √|centroids| is exactly the
    // factor this form exists to shrink)
    val gw = Window.partitionBy(col("q_id"))
      .orderBy(col("__gs").desc, col("__cid").asc)
    val qcells = q
      .withColumn("__qn", norm2(col("__qv")))
      .join(co)
      .withColumn("__gs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__rn", row_number().over(gw))
      .filter(col("__rn") <= nprobeCoarse)
      .select(col("q_id"), col("__qv"), col("__qn"),
        col("__cid").as("__gid"))
    // level 2: rank only the centroids inside the probed cells
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("__cs").desc, col("__pcid").asc)
    val probes = qcells
      .join(cellOf, "__gid")
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__pcv"), col("__qn"), col("__pcn")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__pcid").as("cid"))
    int8PanelRank(lists, idCol, probes, q, k)
  }

  /** [[int8IvfTopK]]'s panel form: build the in-flight int8 index and
    * run [[int8IvfSearchBatch]] over it — one lazy plan from raw
    * vectors to per-query top-k. */
  def int8IvfTopKBatch(df: DataFrame, idCol: String, vecCol: String,
                       centroids: DataFrame, centIdCol: String,
                       centVecCol: String, nprobe: Int,
                       queries: DataFrame, qIdCol: String,
                       qVecCol: String, k: Int): DataFrame =
    int8IvfSearchBatch(
      int8IvfIndex(df, idCol, vecCol, centroids, centIdCol,
        centVecCol),
      idCol, centroids, centIdCol, centVecCol, nprobe,
      queries, qIdCol, qVecCol, k)

  /** Persist an [[int8IvfIndex]] as the on-disk artifact (centroids +
    * int8 lists partitioned by `cid`): the int8 rendition of
    * [[buildIvfIndex]], 4× smaller on disk, and a search's
    * `cid IN (probes)` filter prunes whole partitions at the parquet
    * SCAN — the probed fraction is the only data read. */
  def buildInt8IvfIndex(df: DataFrame, idCol: String, vecCol: String,
                        centroids: DataFrame, centIdCol: String,
                        centVecCol: String, dir: String): Unit = {
    centroids.select(col(centIdCol).as("cid"), col(centVecCol).as("cv"))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    int8IvfIndex(df, idCol, vecCol, centroids, centIdCol, centVecCol)
      .select(col(idCol).as("id"), col("pos"), col("q"), col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$dir/lists")
  }

  /** Incrementally extend a persisted int8 IVF index — the
    * continuous-ingestion half of the int8 lifecycle, with
    * [[appendToIvfIndex]]'s exact contract (assignment by the index's
    * OWN persisted quantizer, appended files under the same `cid=`
    * partitions, search-after-append ≡ search over a union-built
    * index — spec'd; quantizer not retrained; ids must be new;
    * compact under high-frequency small appends).
    *
    * STREAMING-INGEST EXACTLY-ONCE: this is a blind parquet append —
    * NOT idempotent. Under an at-least-once foreachBatch, a retry
    * after a partial write duplicates (id, pos) rows, and
    * [[int8TopK]]'s per-id sum then silently double-counts those ids'
    * dots (a duplicated f32 row at worst duplicates a result row; a
    * duplicated int8 row CORRUPTS the score). The ingest pathway must
    * be exactly-once: track committed batchIds beside the index and
    * skip replays in foreachBatch, or periodically rewrite the lists
    * deduplicated by (id, pos) — e.g. at the [[compactIvfIndex]]
    * cadence. */
  def appendToInt8IvfIndex(spark: org.apache.spark.sql.SparkSession,
                           dir: String, df: DataFrame, idCol: String,
                           vecCol: String): Unit =
    int8IvfIndex(df, idCol, vecCol,
        spark.read.parquet(s"$dir/centroids"), "cid", "cv")
      .select(col(idCol).as("id"), col("pos"), col("q"), col("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(s"$dir/lists")

  /** Search a [[buildInt8IvfIndex]] artifact — [[searchIvfIndex]]'s
    * contract (single query row, probe list collected driver-side,
    * ≤ nprobe rows) over the int8 lists: partition pruning at the
    * scan + [[int8TopK]]'s integer ranking. Returns (id, dot). */
  def searchInt8IvfIndex(spark: org.apache.spark.sql.SparkSession,
                         dir: String, query: DataFrame,
                         queryVecCol: String, nprobe: Int,
                         k: Int): DataFrame = {
    val cent = prepCent(spark.read.parquet(s"$dir/centroids"),
      "cid", "cv")
    val qProj = query.select(col(queryVecCol).as("__qv"))
    val qRows = qProj.limit(2).collect()
    require(qRows.length == 1,
      s"searchInt8IvfIndex expects exactly one query row, got " +
        s"${if (qRows.isEmpty) "none" else "several"}")
    val q1 = broadcast(spark.createDataFrame(
        java.util.Collections.singletonList(qRows.head), qProj.schema)
      .withColumn("__qn", norm2(col("__qv"))))
    val probeRows = q1.join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .orderBy(col("__cs").desc, col("__cid").asc)
      .limit(nprobe)
      .select(col("__cid")).collect() // bounded: ≤ nprobe rows
    require(probeRows.nonEmpty, "empty centroid table")
    val cids = probeRows.map(_.get(0)).toSeq
    int8TopK(
      spark.read.parquet(s"$dir/lists")
        .filter(col("cid").isin(cids: _*)),
      "id", "pos", "q",
      quantizeInt8(q1.select(col("__qv"))
        .withColumn("__qid", lit(0L)), "__qid", "__qv"),
      k)
  }

  /** Batch search over a persisted [[buildInt8IvfIndex]] artifact —
    * [[searchIvfIndexBatch]]'s shape on the int8 storage, replacing
    * the per-query [[searchInt8IvfIndex]] driver loop for a PANEL:
    * per-query probe lists come from a window top-nprobe over the
    * broadcast centroid table (the panel is never collected), the
    * probe UNION is collected as the literal `cid` partition filter
    * (bounded by |centroids| distinct ids regardless of panel size,
    * so parquet partition pruning survives arbitrarily large panels),
    * and the probed candidates rank by [[int8TopKBatch]]'s pure
    * integer dot — each list row fans out ONLY to the queries that
    * probed its cid (a broadcast of |panel|·nprobe (q_id, cid) pairs,
    * not the all-pairs panel join), and the per-(q_id, id) partial
    * sums combine map-side before the one shuffle. Each (q_id, id)
    * dot is bit-identical to a [[searchInt8IvfIndex]] loop (spec'd).
    * Returns (q_id, id, dot), top-k per query by the integer dot.
    * Panel-size bound: the panel and probe broadcasts cap practical
    * panel size at a few million queries (~70 bytes/row at dim 64) —
    * see [[int8IvfSearchBatch]]'s PANEL-SIZE BOUND note; this API is
    * for panels, never a second corpus. */
  def searchInt8IvfIndexBatch(spark: org.apache.spark.sql.SparkSession,
                              dir: String, queries: DataFrame,
                              qIdCol: String, qVecCol: String,
                              nprobe: Int, k: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe out of [1,∞)")
    require(k >= 1, s"k=$k out of [1,∞)")
    val cent = prepCent(spark.read.parquet(s"$dir/centroids"),
      "cid", "cv")
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"))
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("__cs").desc, col("__cid").asc)
    val probes = q
      .withColumn("__qn", norm2(col("__qv")))
      .join(cent)
      .withColumn("__cs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("__cid").as("cid"))
    int8PersistedPanelRank(spark, dir, probes, q, k)
  }

  /** Shared downstream of the persisted panel searches: checkpoint
    * the (q_id, cid) probe pairs, collect the probe UNION as the
    * literal `cid` partition filter, broadcast the quantized panel,
    * rank the probed lists map-side. `probes` must be bounded by
    * |panel|·nprobe rows. */
  private def int8PersistedPanelRank(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      probes0: DataFrame, q: DataFrame, k: Int): DataFrame = {
    // materialize ONCE (bounded: |panel| × nprobe rows) — the
    // searchIvfIndexBatch rationale: the probe plan feeds both the
    // cids collect and the candidate join, and re-executing it over
    // a nondeterministic panel would let a probed cid vanish from
    // the literal filter, silently dropping its whole list
    val probes = probes0.localCheckpoint()
    val cids = probes.select(col("cid")).distinct()
      .collect().map(_.get(0)).toSeq
    val lists = spark.read.parquet(s"$dir/lists")
    // quantized panel, keyed by q_id — with int8TopKBatch's
    // malformed-frame guard: a duplicate (q_id, pos) means two
    // vectors share a q_id and their dots would silently mix
    val panel = broadcast(quantizeInt8(q, "q_id", "__qv")
      .where(col("q").isNotNull)
      .groupBy(col("q_id").as("__pq"), col("pos").as("__qp"))
      .agg(max(col("q")).as("__q0"), count(lit(1)).as("__c"))
      .select(col("__pq"), col("__qp"),
        (col("__q0") + coalesce(
          assert_true(col("__c") === 1,
            lit("searchInt8IvfIndexBatch: panel holds more than one " +
              "vector per q_id (duplicate (q_id, pos)) — ids must " +
              "be unique"))
            .cast("long"), lit(0L))).as("__qq")))
    // empty panel (or empty centroid table) → empty result, the
    // natural N=0 of a batch API
    if (cids.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q_id",
            q.schema("q_id").dataType),
          org.apache.spark.sql.types.StructField("id",
            lists.schema("id").dataType),
          org.apache.spark.sql.types.StructField("dot",
            org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("dot").desc, col("id").asc)
    lists
      .filter(col("cid").isin(cids: _*))
      .where(col("q").isNotNull)
      .join(broadcast(probes), "cid")
      .join(panel,
        col("q_id") === col("__pq") && col("pos") === col("__qp"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("q") * col("__qq")).as("dot"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Attach a COARSE LEVEL to a persisted int8 IVF index — the
    * build-time half of [[searchInt8IvfIndexBatchTwoLevel]]: persists
    * `dir/coarse` (gid, gv — the coarse quantizer over the CENTROID
    * set) and `dir/cellof` (cid, gid — every centroid assigned once
    * to its nearest cell, the same map-side-collapsed argmin the
    * corpus assignment uses). The assignment is query-independent, so
    * computing it at build time amortizes it across every panel the
    * index ever serves; re-run after appends only if the centroid set
    * itself changed (appends reuse the stored quantizer, so normally
    * it has not). Idempotent overwrite. */
  def addCoarseLevel(spark: org.apache.spark.sql.SparkSession,
                     dir: String, coarse: DataFrame, gIdCol: String,
                     gVecCol: String): Unit = {
    // a coarse artifact written from an empty frame would make every
    // later two-level search silently return zero rows — reject at
    // write time (ADVICE r20). Lazily checkpoint the projection first
    // so the guard and the write share ONE evaluation of the coarse
    // lineage instead of paying it twice (ADVICE r21).
    val coSlim = coarse.select(col(gIdCol).as("gid"),
      col(gVecCol).as("gv")).localCheckpoint(false)
    require(!coSlim.isEmpty, "addCoarseLevel: empty coarse set")
    coSlim.write.mode("overwrite").parquet(s"$dir/coarse")
    val co = prepCent(spark.read.parquet(s"$dir/coarse"), "gid", "gv")
    assignToCentroids(
        spark.read.parquet(s"$dir/centroids")
          .select(col("cid"), col("cv")), "cid", "cv", co)
      .select(col("cid"), col("__cid").as("gid"))
      .write.mode("overwrite").parquet(s"$dir/cellof")
  }

  /** TWO-LEVEL batch search over a persisted int8 IVF index —
    * [[int8IvfSearchBatchTwoLevel]]'s artifact form, completing the
    * {flat, two-level} × {in-flight, persisted} probe matrix: the
    * per-query probe stage costs |coarse| + nprobeCoarse·|centroids|/
    * |coarse| instead of the flat form's |centroids| (the wall at
    * 2²⁰-list web indexes), with the centroid→cell assignment READ
    * from the artifact ([[addCoarseLevel]] — computed once at build,
    * never per panel). Downstream is [[searchInt8IvfIndexBatch]]'s
    * verbatim: probe-union literal partition filter (still bounded by
    * |centroids| for any panel size), broadcast panel, map-side
    * integer dots. Same approximation contract as the in-flight form
    * (a top centroid in an unprobed cell is missed); results are
    * DEFINED identical to [[int8IvfSearchBatchTwoLevel]] over the
    * same index (spec'd). */
  def searchInt8IvfIndexBatchTwoLevel(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      nprobeCoarse: Int, nprobe: Int, k: Int): DataFrame = {
    require(nprobeCoarse >= 1,
      s"nprobeCoarse=$nprobeCoarse out of [1,∞)")
    require(nprobe >= 1, s"nprobe=$nprobe out of [1,∞)")
    require(k >= 1, s"k=$k out of [1,∞)")
    val co = prepCent(spark.read.parquet(s"$dir/coarse"), "gid", "gv")
    val cent = spark.read.parquet(s"$dir/centroids")
    val cellOf = spark.read.parquet(s"$dir/cellof")
      .select(col("cid"), col("gid").as("__gid"))
      .join(cent.select(col("cid"), col("cv"),
        norm2(col("cv")).as("__pcn")), "cid")
    val q = queries.select(col(qIdCol).as("q_id"),
      col(qVecCol).as("__qv"))
    val gw = Window.partitionBy(col("q_id"))
      .orderBy(col("__gs").desc, col("__cid").asc)
    val qcells = q
      .withColumn("__qn", norm2(col("__qv")))
      .join(co)
      .withColumn("__gs",
        cosinePre(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .withColumn("__rn", row_number().over(gw))
      .filter(col("__rn") <= nprobeCoarse)
      .select(col("q_id"), col("__qv"), col("__qn"),
        col("__cid").as("__gid"))
    val pw = Window.partitionBy(col("q_id"))
      .orderBy(col("__cs").desc, col("cid").asc)
    val probes = qcells
      .join(cellOf, "__gid")
      .withColumn("__cs",
        cosinePre(col("__qv"), col("cv"), col("__qn"), col("__pcn")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("cid"))
    int8PersistedPanelRank(spark, dir, probes, q, k)
  }

  /** Storage form of a persisted IVF index — the ONE parameter the
    * two write paths differ by. F32 lists hold (id, vec, norm) rows
    * and search returns (id, sim: Double) cosines; Int8 lists hold
    * quantized (id, pos, q) rows (4× smaller) and search returns
    * (id, dot: Long) integer dots. Everything else — directory
    * layout (`dir/centroids` + `dir/lists` partitioned by cid),
    * assignment rule, append contract, compaction, probe-literal
    * partition pruning — is shared. */
  sealed trait IvfForm
  case object IvfF32 extends IvfForm
  case object IvfInt8 extends IvfForm

  /** Over-fetch + exact-re-rank search option — the MEASURED
    * compensation for int8 thin-margin rank inversions (SCALE.md
    * recall table: int8 alone loses rank-order where real clusters
    * have thin cosine margins, 0.96 vs 1.00 at exhaustive probing;
    * over-fetching 3k+1 by the integer dot and exactly re-ranking
    * that short list against the f32 vectors recovers the f32 curve
    * at every nprobe), exposed as an operator option instead of a
    * hand-built re-join.
    *
    * `overfetch` = how many candidates the integer ranking keeps per
    * query before the exact re-rank (the measured sweet spot is
    * 3k+1). `vectors` = the exact f32 source (frame, idCol, vecCol);
    * None defaults to the index's OWN stored vectors — valid for the
    * f32 form (its lists hold them), an error for int8 (its lists
    * are quantized, so the caller must hand the f32 corpus in). The
    * re-rank touches ≤ |panel|·overfetch vector rows — its cost is
    * independent of corpus size (one scan of `vectors` pruned
    * map-side by the broadcast candidate list; no shuffle of the
    * corpus). */
  final case class Refine(
      overfetch: Int,
      vectors: Option[(DataFrame, String, String)] = None)

  /** Exact-cosine re-rank of per-query candidate lists — [[Refine]]'s
    * engine, usable standalone over ANY candidate frame (in-flight
    * int8 searches, PQ shortlists): keep the top-k of each query's
    * candidates by exact f32 cosine against `vectors`. `cands` must
    * carry (`candQIdCol`, `candIdCol`); extra columns (the integer
    * dot) are dropped — the re-rank REPLACES the coarse score.
    * Returns (q_id, candIdCol, sim), top-k per query, sim the exact
    * cosine.
    *
    * Scale shape: the candidate list broadcasts (bounded by
    * |panel|·overfetch — the panel contract), so the `vectors` scan
    * prunes map-side in ONE pass with no corpus shuffle; the query
    * panel broadcasts (same bound as every panel search here); the
    * per-query window ranks ≤ overfetch rows per query. */
  def refineTopK(cands: DataFrame, candIdCol: String,
                 queries: DataFrame, qIdCol: String, qVecCol: String,
                 vectors: DataFrame, vecIdCol: String, vecCol: String,
                 k: Int, candQIdCol: String = "q_id"): DataFrame = {
    require(k >= 1, s"k=$k out of [1,∞)")
    val c = cands.select(col(candQIdCol).as("q_id"),
      col(candIdCol).as("__rcid"))
    val v = vectors.select(col(vecIdCol).as("__rvid"),
      col(vecCol).as("__rvv"), norm2(col(vecCol)).as("__rvn"))
    val q = queries.select(col(qIdCol).as("__rqid"),
      col(qVecCol).as("__rqv"), norm2(col(qVecCol)).as("__rqn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(candIdCol).asc)
    v.join(broadcast(c), col("__rvid") === col("__rcid"))
      .join(broadcast(q), col("q_id") === col("__rqid"))
      .select(col("q_id"), col("__rvid").as(candIdCol),
        cosinePre(col("__rvv"), col("__rqv"), col("__rvn"),
          col("__rqn")).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One lifecycle API over both persisted-IVF storage forms — the
    * facade that keeps the f32 and int8 families from drifting: every
    * verb dispatches on [[IvfForm]] to the SAME implementations the
    * standalone entry points use (zero behavior change; the
    * parameterized spec matrix runs build/append/compact/search/
    * searchBatch/streaming-ingest against both forms through this
    * object). Compaction is schema-agnostic and therefore form-free.
    *
    * @see [[buildIvfIndex]]/[[buildInt8IvfIndex]],
    *      [[appendToIvfIndex]]/[[appendToInt8IvfIndex]] (including
    *      the streaming-ingest exactly-once contract),
    *      [[searchIvfIndex]]/[[searchInt8IvfIndex]],
    *      [[searchIvfIndexBatch]]/[[searchInt8IvfIndexBatch]]. */
  object IvfLifecycle {
    def build(form: IvfForm, df: DataFrame, idCol: String,
              vecCol: String, centroids: DataFrame, centIdCol: String,
              centVecCol: String, dir: String): Unit = form match {
      case IvfF32 => buildIvfIndex(df, idCol, vecCol, centroids,
        centIdCol, centVecCol, dir)
      case IvfInt8 => buildInt8IvfIndex(df, idCol, vecCol, centroids,
        centIdCol, centVecCol, dir)
    }

    def append(form: IvfForm, spark: org.apache.spark.sql.SparkSession,
               dir: String, df: DataFrame, idCol: String,
               vecCol: String): Unit = form match {
      case IvfF32 => appendToIvfIndex(spark, dir, df, idCol, vecCol)
      case IvfInt8 => appendToInt8IvfIndex(spark, dir, df, idCol,
        vecCol)
    }

    /** Form-free: rewrites whatever row schema the lists hold. */
    def compact(spark: org.apache.spark.sql.SparkSession,
                dir: String): Unit = compactIvfIndex(spark, dir)

    /** Resolve a [[Refine]]'s exact-vector source: explicit frame if
      * given; the f32 index's own stored lists otherwise; an ERROR
      * for int8 with no explicit source (its lists are quantized —
      * there is nothing exact to re-rank against). */
    private def exactVectors(form: IvfForm,
                             spark: org.apache.spark.sql.SparkSession,
                             dir: String, r: Refine)
        : (DataFrame, String, String) = r.vectors match {
      case Some(v) => v
      case None => form match {
        case IvfF32 => (spark.read.parquet(s"$dir/lists"), "id", "vec")
        case IvfInt8 => throw new IllegalArgumentException(
          "Refine on an int8 index needs Refine.vectors: the index " +
            "stores quantized rows only, so the exact re-rank must " +
            "be handed the f32 corpus (frame, idCol, vecCol)")
      }
    }

    /** Single-query search. Score column: `sim` (F32) / `dot`
      * (Int8) — with `refine`, ALWAYS `sim` (the exact f32 cosine of
      * the re-ranked short list; see [[Refine]]). */
    def search(form: IvfForm, spark: org.apache.spark.sql.SparkSession,
               dir: String, query: DataFrame, queryVecCol: String,
               nprobe: Int, k: Int,
               refine: Option[Refine] = None): DataFrame =
      refine match {
        case None => form match {
          case IvfF32 => searchIvfIndex(spark, dir, query, queryVecCol,
            nprobe, k)
          case IvfInt8 => searchInt8IvfIndex(spark, dir, query,
            queryVecCol, nprobe, k)
        }
        case Some(r) =>
          require(r.overfetch >= k,
            s"overfetch=${r.overfetch} must be >= k=$k")
          val cands = search(form, spark, dir, query, queryVecCol,
            nprobe, r.overfetch)
          val (vdf, vid, vvec) = exactVectors(form, spark, dir, r)
          refineTopK(
              cands.withColumn("__rq", lit(0L)), "id",
              query.select(lit(0L).as("__rqk"),
                col(queryVecCol).as("__rqv")),
              "__rqk", "__rqv", vdf, vid, vvec, k,
              candQIdCol = "__rq")
            .select(col("id"), col("sim"))
            .orderBy(col("sim").desc, col("id").asc)
      }

    /** Panel search, top-k per q_id — no driver loop either form.
      * With `refine`, the score column is the exact f32 cosine `sim`
      * of the re-ranked short list (see [[Refine]]). */
    def searchBatch(form: IvfForm,
                    spark: org.apache.spark.sql.SparkSession,
                    dir: String, queries: DataFrame, qIdCol: String,
                    qVecCol: String, nprobe: Int, k: Int,
                    refine: Option[Refine] = None): DataFrame =
      refine match {
        case None => form match {
          case IvfF32 => searchIvfIndexBatch(spark, dir, queries,
            qIdCol, qVecCol, nprobe, k)
          case IvfInt8 => searchInt8IvfIndexBatch(spark, dir, queries,
            qIdCol, qVecCol, nprobe, k)
        }
        case Some(r) =>
          require(r.overfetch >= k,
            s"overfetch=${r.overfetch} must be >= k=$k")
          val cands = searchBatch(form, spark, dir, queries, qIdCol,
            qVecCol, nprobe, r.overfetch)
          val (vdf, vid, vvec) = exactVectors(form, spark, dir, r)
          refineTopK(cands, "id", queries, qIdCol, qVecCol,
            vdf, vid, vvec, k)
      }

    /** Attach the coarse level to a persisted index
      * ([[addCoarseLevel]]). Int8-only for now — the two-level probe
      * path exists for web-index list counts, where int8 is the
      * storage you would be running (the f32 lists are 4× the bytes
      * before the probe stage even matters); an F32 form fails fast
      * here rather than silently probing flat. */
    def addCoarse(form: IvfForm,
                  spark: org.apache.spark.sql.SparkSession,
                  dir: String, coarse: DataFrame, gIdCol: String,
                  gVecCol: String): Unit = form match {
      case IvfInt8 => addCoarseLevel(spark, dir, coarse, gIdCol,
        gVecCol)
      case IvfF32 => throw new IllegalArgumentException(
        "two-level probing is implemented for the int8 form (the " +
          "storage used at the list counts where the probe stage " +
          "dominates); build the index as IvfInt8")
    }

    /** Two-level panel search over a [[addCoarse]]-equipped index
      * ([[searchInt8IvfIndexBatchTwoLevel]]) — probe cost |coarse| +
      * nprobeCoarse·|centroids|/|coarse| per query instead of
      * [[searchBatch]]'s |centroids|. `refine` composes exactly as on
      * [[searchBatch]] (over-fetch by the integer dot, exact f32
      * re-rank; score column becomes `sim`). */
    def searchBatchTwoLevel(form: IvfForm,
                            spark: org.apache.spark.sql.SparkSession,
                            dir: String, queries: DataFrame,
                            qIdCol: String, qVecCol: String,
                            nprobeCoarse: Int, nprobe: Int, k: Int,
                            refine: Option[Refine] = None): DataFrame =
      form match {
        case IvfInt8 => refine match {
          case None => searchInt8IvfIndexBatchTwoLevel(spark, dir,
            queries, qIdCol, qVecCol, nprobeCoarse, nprobe, k)
          case Some(r) =>
            require(r.overfetch >= k,
              s"overfetch=${r.overfetch} must be >= k=$k")
            val cands = searchInt8IvfIndexBatchTwoLevel(spark, dir,
              queries, qIdCol, qVecCol, nprobeCoarse, nprobe,
              r.overfetch)
            val (vdf, vid, vvec) = exactVectors(form, spark, dir, r)
            refineTopK(cands, "id", queries, qIdCol, qVecCol,
              vdf, vid, vvec, k)
        }
        case IvfF32 => throw new IllegalArgumentException(
          "two-level probing is implemented for the int8 form; " +
            "build the index as IvfInt8")
      }

    /** The append transform (assignment by the index's OWN persisted
      * quantizer) WITHOUT the write — shared by [[append]]'s blind
      * parquet append and [[ingestBatch]]'s staged exactly-once
      * promote, so the two ingest pathways cannot drift on placement
      * or quantization. */
    private def ingestRows(form: IvfForm,
                           spark: org.apache.spark.sql.SparkSession,
                           dir: String, df: DataFrame, idCol: String,
                           vecCol: String): DataFrame = form match {
      case IvfF32 =>
        assignToCentroids(df, idCol, vecCol,
            prepCent(spark.read.parquet(s"$dir/centroids"),
              "cid", "cv"))
          .select(col(idCol).as("id"), col(vecCol).as("vec"),
            col("__n").as("norm"), col("__cid").as("cid"))
      case IvfInt8 =>
        int8IvfIndex(df, idCol, vecCol,
            spark.read.parquet(s"$dir/centroids"), "cid", "cv")
          .select(col(idCol).as("id"), col("pos"), col("q"),
            col("cid"))
    }

    /** EXACTLY-ONCE ingest of one micro-batch — the helper the
      * [[appendToInt8IvfIndex]] contract demands instead of merely
      * documenting (an at-least-once foreachBatch replay through the
      * blind append duplicates (id, pos) rows, and the int8 per-id
      * dot then silently DOUBLE-COUNTS — corrupted scores, not just
      * duplicate result rows). A committed-batchId ledger lives
      * beside the index (`dir/_ingest/committed-<batchId>`, the
      * durable-marker shape of the reference's failed-export retry
      * dir, STEP-BY-STEP.md:446-459), and the append itself is a
      * stage-then-promote with DETERMINISTIC file names so every
      * crash window replays idempotently:
      *
      *  1. marker exists → the batch already committed: skip (and
      *     sweep any staging leftover). Replays cost one FS stat.
      *  2. stage the assigned+quantized rows to
      *     `_ingest/staged-<batchId>` with mode OVERWRITE — a replay
      *     of a half-written stage rewrites it whole;
      *  3. promote each staged `cid=` partition's files into
      *     `lists/cid=.../ingest-<batchId>-<k>.parquet` by rename,
      *     after DELETING any `ingest-<batchId>-*` leftovers there —
      *     a crash mid-promote replays to the exact same names, so a
      *     half-promoted batch can never double;
      *  4. create the marker, then drop the staging dir.
      *
      * A crash between promote and marker (the window a blind append
      * cannot survive) re-runs 2–3 on replay and lands byte-identical
      * file names — exactly-once, spec'd against the union-built
      * index with the blind-append control proving the corruption the
      * ledger prevents. Batch replays must re-deliver the same rows
      * (the Structured Streaming source contract). Returns true iff
      * the batch was applied (false = replay skipped). */
    def ingestBatch(form: IvfForm,
                    spark: org.apache.spark.sql.SparkSession,
                    dir: String, batch: DataFrame, batchId: Long,
                    idCol: String, vecCol: String): Boolean = {
      import org.apache.hadoop.fs.Path
      val conf = spark.sparkContext.hadoopConfiguration
      val ledger = new Path(s"$dir/_ingest")
      val fs = ledger.getFileSystem(conf)
      val marker = new Path(ledger, s"committed-$batchId")
      val staged = new Path(ledger, s"staged-$batchId")
      if (fs.exists(marker)) {
        if (fs.exists(staged)) fs.delete(staged, true) // crashed after
        return false                                   // marker: sweep
      }
      ingestRows(form, spark, dir, batch, idCol, vecCol)
        .write.mode("overwrite").partitionBy("cid")
        .parquet(staged.toString)
      val lists = new Path(s"$dir/lists")
      fs.listStatus(staged)
        .filter(st => st.isDirectory && st.getPath.getName
          .startsWith("cid="))
        .foreach { st =>
          val dst = new Path(lists, st.getPath.getName)
          fs.mkdirs(dst)
          fs.listStatus(dst)
            .filter(_.getPath.getName.startsWith(s"ingest-$batchId-"))
            .foreach(p => fs.delete(p.getPath, false))
          fs.listStatus(st.getPath).map(_.getPath)
            .filter(p => p.getName.endsWith(".parquet") &&
              !p.getName.startsWith("_") && !p.getName.startsWith("."))
            .sortBy(_.getName)
            .zipWithIndex.foreach { case (p, k) =>
              val to = new Path(dst, s"ingest-$batchId-$k.parquet")
              if (!fs.rename(p, to))
                sys.error(s"ingest promote failed renaming $p to $to")
            }
        }
      fs.create(marker, true).close()
      fs.delete(staged, true)
      true
    }

    /** [[ingestBatch]] curried as a foreachBatch sink — the
      * streaming-ingest pathway in one line:
      * {{{
      * feed.writeStream.foreachBatch(
      *   IvfLifecycle.streamIngest(IvfInt8, spark, dir,
      *     "vec_id", "embedding")).start()
      * }}}
      * Exactly-once under at-least-once replays and every crash
      * window — see [[ingestBatch]]. */
    def streamIngest(form: IvfForm,
                     spark: org.apache.spark.sql.SparkSession,
                     dir: String, idCol: String, vecCol: String)
        : (DataFrame, Long) => Unit =
      (batch, batchId) => {
        ingestBatch(form, spark, dir, batch, batchId, idCol, vecCol)
        ()
      }
  }

  /** All-pairs near-duplicates by embedding cosine ≥ threshold, blocked
    * by LSH bucket so no cross product forms. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   nBits: Int, minSim: Double): DataFrame = {
    val sig = lshSignature(col(vecCol), dim, nBits)
    val b = df.select(col(idCol), col(vecCol), sig.as("__sig"),
      norm2(col(vecCol)).as("__n"))
    val l = b.select(col(idCol).as("a"), col(vecCol).as("va"),
      col("__sig"), col("__n").as("na"))
    val r = b.select(col(idCol).as("b"), col(vecCol).as("vb"),
      col("__sig").as("__sig2"), col("__n").as("nb"))
    l.join(r, col("__sig") === col("__sig2") && col("a") < col("b"))
      .select(col("a"), col("b"),
        cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023 — prune
    * semantic duplicates a lexical dedup can't see): cluster the
    * embeddings with the integer-exact k-means, compare pairs ONLY
    * within a cluster, and drop every item whose cosine similarity to
    * a smaller-id item of the same cluster reaches `minSim`. Returns
    * the KEPT rows (idCol, cid).
    *
    * Representative rule: keep-the-smallest-id. Deterministic and
    * engine-portable (the paper keeps the member farthest from its
    * centroid; any single-representative rule prunes the same
    * ε-neighborhoods — documented deviation). An item is dropped when
    * ANY smaller-id cluster-mate is within ε, whether or not that mate
    * is itself kept — one relational pass, no sequential greedy chain.
    *
    * Scale shape — the whole point of SemDeDup: the quadratic pair
    * comparison is confined to single clusters, so k is chosen to hold
    * avg cluster size n/k at a pairwise-affordable bound (the paper
    * runs k≈10⁵ on web corpora). Training is the bounded Lloyd loop
    * (broadcast centroids, no n×k shuffle); assignment shuffles
    * |vectors| once; the intra-cluster self-join shuffles on cid and
    * its output collapses into a semi-join-shaped distinct before the
    * anti-join. Nothing is ever all-pairs across clusters.
    *
    * Skew guard (`maxCompare`): k bounds the AVERAGE cluster size, not
    * the largest — one pathological cluster (a boilerplate blob the
    * embeddings collapse together) re-quadratizes its self-join
    * regardless of k. With `maxCompare = c` the LEFT side of the pair
    * join is restricted to each cluster's c smallest-id members —
    * picked RANK-FREE by a bounded-heap aggregate
    * ([[graft.functions.BoundedTopK.smallestK]]: O(c) state per
    * cluster, map-side combined, ≤c-row partials on the shuffle), so
    * even the pathological mega-cluster never sorts on one task — so
    * per-cluster pair work is ≤ c·size — linear, never quadratic.
    * Non-integral id columns (the heap is over longs) fall back to
    * the windowed-rank pick — any orderable id type still works,
    * paying the per-cluster single-task sort the heap avoids.
    * This is the sampled-representative fallback: results are
    * IDENTICAL to the exact pass whenever every cluster holds ≤ c
    * distinct ε-neighborhoods — in particular the pathological
    * one-blob cluster is exact at any c ≥ 1 (every member is within ε
    * of the smallest id, which is always a representative). The
    * default (Int.MaxValue) keeps the exact pass and skips the window
    * entirely.
    *
    * Zero-norm embeddings: cosine is undefined there, and [[cosinePre]]
    * yields NULL — a NULL similarity never reaches `minSim`, so a
    * zero vector is never dropped and never drops a cluster-mate; it
    * always survives, assigned to the smallest centroid id (the
    * assignment argmin coalesces NULL to +Inf and ties break to the
    * smaller cid). Pinned by spec (ExtensionOpsSpec). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, minSim: Double,
                    scale: Long = 1000000L,
                    maxCompare: Int = Int.MaxValue): DataFrame = {
    require(maxCompare >= 1, s"maxCompare=$maxCompare out of [1,∞)")
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters, scale)
    // same assignment semantic as ivfTopK: nearest centroid by cosine,
    // ties to the smaller cid — one integer-exact trainer, one
    // assignment rule everywhere (and one oracle replay for both)
    val asg = assignToCentroids(df.select(col(idCol), col(vecCol)),
      idCol, vecCol, prepCent(cents, "cid", "cv"))
    val lBase = asg.select(col(idCol).as("a"), col(vecCol).as("va"),
      col("__n").as("na"), col("__cid"))
    val l =
      if (maxCompare == Int.MaxValue) lBase
      else {
        import org.apache.spark.sql.types.{ByteType, IntegerType,
          LongType, ShortType}
        val idType = asg.schema(idCol).dataType
        if (Seq(ByteType, ShortType, IntegerType, LongType)
            .contains(idType)) {
          val reps = asg.groupBy(col("__cid"))
            .agg(graft.functions.BoundedTopK.smallestK(maxCompare)(
              col(idCol).cast(LongType)).as("__reps"))
            .select(col("__cid"), explode(col("__reps")).as("__rep"))
            .select(col("__cid"), col("__rep").cast(idType).as("a"))
          lBase.join(reps, Seq("__cid", "a"), "left_semi")
        } else {
          // non-integral ids (the bounded heap is over longs): keep
          // the windowed-rank pick — linearithmic, single-task per
          // cluster, but any orderable id type works
          lBase.withColumn("__rk", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("__cid")).orderBy(col("a").asc)))
            .where(col("__rk") <= maxCompare).drop("__rk")
        }
      }
    val r = asg.select(col(idCol).as("b"), col(vecCol).as("vb"),
      col("__n").as("nb"), col("__cid").as("__cid2"))
    val dropped = l
      .join(r, col("__cid") === col("__cid2") && col("a") < col("b"))
      .filter(cosinePre(col("va"), col("vb"), col("na"), col("nb"))
        >= minSim)
      .select(col("b").as(idCol)).distinct()
    asg.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("__cid").as("cid"))
  }
}
