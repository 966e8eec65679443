package graft

import graft.operators.{ConnectedComponents, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-path measurement main (SCALE.md): times the three n-gram
  * Jaccard strategies on the real documents corpus at a given SF —
  * exact all-pairs (the oracle semantics, q18), hot-gram-capped, and
  * MinHash-LSH candidates → exact verify (the 100 TB path). Prints one
  * JSON line.
  *
  * `cc` mode instead measures connected-components round counts on
  * synthetic graphs engineered against the algorithm: a 2^20-node CHAIN
  * (diameter = n, the worst case that breaks min-label propagation) and
  * a 2M-edge supercritical random graph.
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.contains("cc")) { ccDemo(spark); spark.stop(); return }
    if (args.contains("ivf")) { ivfDemo(spark, sfDir); spark.stop(); return }
    if (args.contains("lsh")) { lshDemo(spark); spark.stop(); return }
    if (args.contains("ppjoin")) {
      ppjoinDemo(spark, sfDir); spark.stop(); return
    }
    if (args.contains("pktdump")) {
      pktdumpDemo(spark); spark.stop(); return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    def time(what: String)(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$what: $s%.2f s, $n rows")
      (s, n)
    }

    val (tExact, nExact) = time("exact") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2,
        blockCol = Some("lang"), minBp = 2000L).count()
    }
    val (tCapped, nCapped) = time("capped maxDf=100") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2,
        blockCol = Some("lang"), minBp = 2000L,
        maxDf = Some(100L)).count()
    }
    val (tLsh, nLsh) = time("lsh candidates + verify") {
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleK = 2, numHashes = 16, bands = 8)
      Dedup.jaccardVerify(cands, docs, "doc_id", "text", 2,
        minBp = 2000L).count()
    }

    println(s"""{"sf":"$sfDir","exact_sec":$tExact,""" +
      s""""exact_pairs":$nExact,"capped_sec":$tCapped,""" +
      s""""capped_pairs":$nCapped,"lsh_verify_sec":$tLsh,""" +
      s""""lsh_verify_pairs":$nLsh}""")
    spark.stop()
  }

  /** IVF assignment-stage shapes at coarse-quantizer scale (k ≥ 1024):
    * the old window argmin shuffles all n×k joined rows through a
    * row_number; the shipped min(struct) partial-agg collapses to one
    * row per vector map-side before the exchange. Both produce the
    * identical assignment (verified by hash compare here). */
  private def ivfDemo(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Similarity.{dot, norm2}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nVec = emb.count() // warm scan
    val k = 1024
    val step = math.max(1L, nVec / k)
    // Deterministic + materialized centroid set: limit needs an order
    // to be stable, and without persist() each timed action (and the
    // mismatch except()s) would re-evaluate `cent` and could each see a
    // different row set.
    val centRows = emb.filter(col("vec_id") % step === 0)
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("__cid"), col("embedding").as("__cv"),
        norm2(col("embedding")).as("__cn"))
      .persist()
    val kEff = centRows.count()
    val cent = broadcast(centRows)
    val base = emb.select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("__n"))
      .join(cent)
      .withColumn("__cs",
        dot(col("embedding"), col("__cv")) / (col("__n") * col("__cn")))

    def time(what: String)(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$what: $s%.2f s, $n rows")
      (s, n)
    }
    val wAsg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("__cs").desc, col("__cid").asc)
    def windowAssign = base
      .withColumn("__rn", row_number().over(wAsg))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("__cid"))
    def aggAssign = base
      .withColumn("__csNeg", -col("__cs"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("__csNeg"), col("__cid"))).as("m"))
      .select(col("vec_id"), col("m.__cid").as("__cid"))
    val (tWin, nWin) = time(s"window argmin k=$kEff")(windowAssign.count())
    val (tAgg, nAgg) = time(s"min(struct) argmin k=$kEff")(aggAssign.count())
    val mismatch = windowAssign.except(aggAssign).count() +
      aggAssign.except(windowAssign).count()
    println(s"""{"sf":"$sfDir","n_vectors":$nVec,"k":$kEff,""" +
      s""""window_sec":$tWin,"window_rows":$nWin,""" +
      s""""agg_sec":$tAgg,"agg_rows":$nAgg,"mismatch_rows":$mismatch}""")
  }

  /** lshSignature codegen-size check at high dimension: signatures over
    * synthetic vectors at the shipped shape (dim 64 × 16 bits) and the
    * previously-bloated shape (dim 1024 × 64 bits). With the typedlit
    * coefficient matrix the expression is O(1) nodes in dim, so the
    * dim-1024 plan must construct and run in the same order of time. */
  private def lshDemo(spark: SparkSession): Unit = {
    import graft.operators.Similarity
    val n = 100000L
    def run(dim: Int, nBits: Int): (Double, Double, Long) = {
      val vecs = spark.range(n).select(col("id"),
        transform(sequence(lit(1), lit(dim)),
          i => pmod(hash(col("id") * lit(dim) + i), lit(1000))
            .cast("float") - 500.0f).as("v"))
      val t0 = System.nanoTime()
      val sig = vecs.select(
        Similarity.lshSignature(col("v"), dim, nBits).as("sig"))
      sig.queryExecution.executedPlan // force analysis + planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val buckets = sig.select(countDistinct(col("sig"))).head().getLong(0)
      val tRun = (System.nanoTime() - t1) / 1e9
      System.err.println(
        f"dim=$dim nBits=$nBits: plan $tPlan%.2f s, run $tRun%.2f s, " +
          f"$buckets buckets")
      (tPlan, tRun, buckets)
    }
    val (p64, r64, b64) = run(64, 16)
    val (p1k, r1k, b1k) = run(1024, 64)
    println(s"""{"n":$n,"dim64":{"plan_sec":$p64,"run_sec":$r64,""" +
      s""""buckets":$b64},"dim1024":{"plan_sec":$p1k,"run_sec":$r1k,""" +
      s""""buckets":$b1k}}""")
  }

  /** Capture-file ingest throughput: write 32 rotated dump files of
    * self-contained packets (Soak.mkPacket — a 50/50 v9+IPFIX mix with
    * periodic options templates, one flow record each), then time the
    * full batch path — pktdump scan (one partition per file) → decode →
    * filter → fwm aggregate — the same mixed traffic the streaming
    * soak drives from the rate source, here from disk. */
  private def pktdumpDemo(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.sources.{NetflowDecoder, PktDump}
    import graft.filter.{Compiler, FilterEnv}
    import graft.operators.Fwm
    val nFiles = 32
    val perFile = 31250 // 1M packets total
    val dir = java.nio.file.Files.createTempDirectory("pktscale").toFile
    dir.deleteOnExit()
    val t0 = System.nanoTime()
    (0 until nFiles).foreach { f =>
      val pkts = (0 until perFile).map { k =>
        val i = f.toLong * perFile + k
        (Soak.mkPacket(i), 1700000000L + i % 3600, 1L + i % 64)
      }
      PktDump.write(f"$dir/$f%04d.gpkd", pkts)
    }
    val tWrite = (System.nanoTime() - t0) / 1e9
    val total = nFiles.toLong * perFile
    def run(): (Double, Long) = {
      val t1 = System.nanoTime()
      val flows = NetflowDecoder.decode(
        spark.read.format("pktdump").load(dir.getAbsolutePath))
      val env = FilterEnv.flow(spark)
      val pred = Compiler.filterColumn("proto 6 and src net 10.0.0.0/8",
        env).fold(e => sys.error(e), identity)
      val n = Fwm.batch(flows.filter(pred), env,
        Fwm.Conf("scale", Seq("octets desc", "src host"), timeSec = 600),
        tsCol = org.apache.spark.sql.functions.col("ts_sec")).count()
      ((System.nanoTime() - t1) / 1e9, n)
    }
    run() // warm
    val (tRead, groups) = run()
    System.err.println(f"write $tWrite%.1f s; " +
      f"scan+decode+fwm $tRead%.2f s = ${total / tRead}%.0f pkt/s")
    println(s"""{"files":$nFiles,"packets":$total,""" +
      s""""write_sec":$tWrite,"pipeline_sec":$tRead,""" +
      s""""packets_per_sec":${(total / tRead).toLong},""" +
      s""""fwm_groups":$groups}""")
    // ~100 MB of dumps: delete now (deleteOnExit can't remove a
    // non-empty directory)
    dir.listFiles().foreach(_.delete())
    dir.delete()
  }

  /** Connected-components round-count measurement, plus the
    * barrier-rebuild differential (ADVICE r19 #4): the same graphs
    * through the production barrier (localCheckpoint + bare-RDD
    * rebuild — the per-iteration InternalRow→Row→InternalRow
    * conversion) and the plain-localCheckpoint control, so the
    * conversion tax is a recorded number instead of an argument
    * (SCALE.md). */
  /** PPJoin prefix-filter A/B (r22, VERDICT r21 #6): exact n-gram
    * Jaccard at a HIGH similarity threshold (minBp 9500 — the
    * incremental-admit / near-exact-rerun regime) with and without the
    * prefix pruner, on the real documents corpus. Asserts the two
    * row sets are identical (the pruner's contract), prints one JSON
    * line with both timings. At minBp 9500 the prefix is ~5% of each
    * gram set, so the quadratic self-join sees ~1/400th the candidate
    * pairs; at q18's minBp 2000 the prefix is ~80% of the set and the
    * knob correctly stays off there. */
  private def ppjoinDemo(spark: SparkSession, sfDir: String): Unit = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan
    def run(pf: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2,
        blockCol = Some("lang"), minBp = 9500L,
        prefixFilter = pf).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(pf = false) // warm both codegen paths
    run(pf = true)
    val samples = (1 to 3).map(_ => (run(pf = false), run(pf = true)))
    val (offS, onS) = (samples.map(_._1._1).sorted, samples.map(_._2._1).sorted)
    val (nOff, nOn) = (samples.head._1._2, samples.head._2._2)
    val eq = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2,
        Some("lang"), 9500L, prefixFilter = true)
      .exceptAll(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2,
        Some("lang"), 9500L)).isEmpty
    require(nOff == nOn && eq,
      s"prefixFilter diverged: $nOff vs $nOn rows, exceptAll empty=$eq")
    println(s"""{"sf":"$sfDir","minBp":9500,""" +
      s""""prefix_off_med_sec":${offS(1)},""" +
      s""""prefix_on_med_sec":${onS(1)},"pairs":$nOff,""" +
      s""""identical":true}""")
  }

  private def ccDemo(spark: SparkSession): Unit = {
    def run(name: String, edges: org.apache.spark.sql.DataFrame,
            rebuild: Boolean): String = {
      val t0 = System.nanoTime()
      val (res, rounds) = ConnectedComponents.runWithStats(edges,
        "a", "b", rebuildBarrier = rebuild)
      val comps = res.select("component").distinct().count()
      val nodes = res.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$name(rebuild=$rebuild): $rounds rounds, " +
        f"$comps comps, $nodes nodes, $sec%.1f s")
      s""""${name}_rebuild_$rebuild":{"rounds":$rounds,""" +
        s""""components":$comps,"nodes":$nodes,"sec":$sec}"""
    }
    // worst case: one 2^20-node path — min-label propagation would need
    // 2^20 rounds; star contraction must stay logarithmic
    val n = 1L << 20
    val chain = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    // supercritical sparse graph: 2M deterministic pseudo-random edges
    // over 2^20 nodes (hash-derived endpoints; one giant component plus
    // dust — the shape of a real near-dup graph after verification)
    val rand = spark.range(2L * n)
      .select(pmod(hash(col("id")), lit(n)).cast("long").as("a"),
        pmod(hash(col("id") * 31 + 7), lit(n)).cast("long").as("b"))
    // warm both paths once (JIT + codegen), then measure each twice
    // in alternation so page-cache/GC drift hits both arms equally
    run("warm", rand, rebuild = true)
    val parts = Seq(
      run("chain_2^20", chain, rebuild = true),
      run("chain_2^20", chain, rebuild = false),
      run("random_2M_edges", rand, rebuild = true),
      run("random_2M_edges", rand, rebuild = false),
      run("random_2M_edges_b", rand, rebuild = true),
      run("random_2M_edges_b", rand, rebuild = false))
    println("{" + parts.mkString(",") + "}")
  }
}
