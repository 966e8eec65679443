package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Scale-path measurement main (SCALE.md): times the three n-gram
  * Jaccard strategies on the real documents corpus at a given SF —
  * exact all-pairs (the oracle semantics, q18), hot-gram-capped, and
  * MinHash-LSH candidates → exact verify (the 100 TB path). Prints one
  * JSON line.
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
}
