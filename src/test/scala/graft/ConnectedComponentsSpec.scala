package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Connected-components (large-star/small-star) vs a union-find model. */
class ConnectedComponentsSpec extends SparkTest {

  private def edgesDf(pairs: Seq[(Long, Long)]) =
    flowDf(Seq("a", "b"), pairs.map(p => Seq(p._1, p._2)))

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edgesDf(pairs), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference: sequential union-find with min-root normalization. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to one component (diameter >> rounds)") {
    // a 40-node path: min-label propagation would need 40 rounds;
    // star-contraction must finish inside the default maxIter
    val chain = (0L until 39L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 40)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint components keep distinct min roots") {
    val got = components(Seq((5L, 3L), (3L, 9L), (20L, 21L), (7L, 7L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L,
      21L -> 20L))
  }

  test("random graphs match union-find (seeded)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 30 + trial * 10
      val pairs = Seq.fill(n)(
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter(p => p._1 != p._2)
      assert(components(pairs) == unionFind(pairs), s"trial $trial")
    }
  }

  test("resolve keeps the min-id member and all unpaired rows") {
    val docs = flowDf(Seq("doc_id"), (1L to 8L).map(Seq(_)))
    // clusters {1,2,3}, {5,7}; 4,6,8 unpaired
    val edges = edgesDf(Seq((2L, 1L), (2L, 3L), (7L, 5L)))
    val kept = ConnectedComponents.resolve(docs, "doc_id", edges, "a", "b")
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 6L, 8L))
  }
}
