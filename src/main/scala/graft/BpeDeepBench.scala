package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-merge demonstration for the batched BPE trainer (SCALE.md):
  * trains ≥8K merges — tokenizer-real depth — on synthetic corpora
  * built NOT to exhaust, and prints rounds vs merges and wall time.
  *
  * Two corpus shapes bound the batching law from both sides. A round's
  * batch is the maximal symbol-disjoint prefix of the count-descending
  * snapshot (selectSafeBatch): an interacting pair raises the ceiling
  * to its own count and — the list being sorted — nothing after can
  * exceed it, so the batch ends at the first clash.
  *
  *  - `wide` (default): 2·numMerges distinct CJK-range characters
  *    paired into numMerges two-char words, word i repeated
  *    (numMerges − i) times. One live pair per word, every pair
  *    symbol-disjoint from every other, all counts distinct — each
  *    round accepts the full 64-merge cap, so rounds ≈ merges/64.
  *    This is the law's upper regime: rounds bound by the codegen cap,
  *    not by merge count.
  *  - `chain`: 4000 random words of length 12–23 over a 62-char
  *    alphabet, distinct frequencies. A word's internal pairs all
  *    carry its frequency and chain-interact, so the first sibling
  *    pair ends every batch: the ADVERSARIAL near-sequential regime
  *    (~1.7 merges/round measured) — the bound a dependency-chain
  *    corpus cannot beat, and still it trains 8K merges in one
  *    single-JVM run. Real corpora (Zipfian counts, cross-word pair
  *    sharing) sit between the two.
  */
object BpeDeepBench {
  def main(args: Array[String]): Unit = {
    val numMerges = args.headOption.flatMap(_.toIntOption)
      .getOrElse(8192)
    val shape = args.drop(1).headOption.getOrElse("wide")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rng = new scala.util.Random(42)
    val words: Seq[String] = shape match {
      case "wide" =>
        // numMerges 2-char words over globally unique characters
        (0 until numMerges).map { i =>
          new String(Array(
            (0x4E00 + 2 * i).toChar, (0x4E00 + 2 * i + 1).toChar))
        }
      case "chain" =>
        val alphabet =
          (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).map(_.toString)
        Iterator.continually {
          val len = 12 + rng.nextInt(12)
          (0 until len).map(_ => alphabet(rng.nextInt(62))).mkString
        }.distinct.take(4000).toSeq
      case other => sys.error(s"unknown corpus shape '$other'")
    }
    // word i appears (4000 - i) times: distinct frequencies per word
    val corpus = words.zipWithIndex.toDF("w", "i")
      .select(col("w"), (lit(words.size) - col("i")).as("n"))
      .select(explode(sequence(lit(1), col("n"))).as("k"),
        col("w").as("text"))
      .select("text")
      .repartition(cpus.toInt)

    val t0 = System.nanoTime()
    val (merges, _, rounds) =
      TextAnalysis.bpeCoreRounds(corpus, "text", numMerges)
    val learned = merges.count()
    val sec = math.rint((System.nanoTime() - t0) / 1e9 * 10) / 10
    require(learned == numMerges,
      s"corpus exhausted at $learned merges — widen it")
    println(s"""{"shape":"$shape","merges":$learned,""" +
      s""""rounds":$rounds,""" +
      s""""merges_per_round":${math.rint(
        learned.toDouble / rounds * 10) / 10},""" +
      s""""sec":$sec,"words":${words.size}}""")
    spark.stop()
  }
}
