package graft

import graft.operators.Similarity
import org.apache.spark.sql.{GraftBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential specs for the codegen'd vector expressions: the native
  * loops must be BIT-IDENTICAL to the higher-order-function forms they
  * replaced (same left-to-right IEEE accumulation, same NULL/short/
  * null-element semantics), because the DuckDB oracles were written
  * against the HOF forms. */
class VecExprSpec extends SparkTest {

  private def vecsDf(rows: Seq[(Long, Seq[java.lang.Float],
      Seq[java.lang.Float])]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (i, a, b) =>
        Row(i, if (a == null) null else a.asJava,
          if (b == null) null else b.asJava)
      }.asJava,
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("a", ArrayType(FloatType, true), true),
        StructField("b", ArrayType(FloatType, true), true))))
  }

  private def fseq(xs: Double*): Seq[java.lang.Float] =
    xs.map(x => java.lang.Float.valueOf(x.toFloat))

  // deterministic pseudo-random vectors (no Random: reproducible spec)
  private def pv(seed: Long, n: Int): Seq[java.lang.Float] =
    (0 until n).map { i =>
      val h = (seed * 6364136223846793005L + i * 1442695040888963407L)
      java.lang.Float.valueOf(((h >>> 16) % 2000 - 1000) / 333.0f)
    }

  test("VecDotExpr is bit-identical to the aggregate(zip_with) form, " +
    "including NULL / mismatch / null-element semantics") {
    val rows = Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])](
      (1L, fseq(1.5, -2.25, 3.125), fseq(0.5, 4.0, -1.75)),
      (2L, fseq(0.1, 0.2, 0.3), fseq(0.7, 0.11, 0.13)), // inexact decimals
      (3L, fseq(), fseq()),                             // empty → 0.0
      (4L, fseq(1.0, 2.0), fseq(1.0, 2.0, 3.0)),        // mismatch → NULL
      (5L, null, fseq(1.0)),                            // null input
      (6L, fseq(1.0) :+ null.asInstanceOf[java.lang.Float],
        fseq(2.0, 3.0)),                                // null element
      (7L, pv(42L, 64), pv(43L, 64)),
      (8L, pv(7L, 1024), pv(8L, 1024)))
    val df = vecsDf(rows)
    val out = df.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect()
    out.foreach { r =>
      val n = r.get(1); val h = r.get(2)
      assert(n == h, s"id ${r.getLong(0)}: native=$n hof=$h")
      if (n != null && h != null)
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
          s"id ${r.getLong(0)}: bit pattern differs")
    }
    assert(out.count(_.get(1) != null) == 5) // ids 1,2,3,7,8
  }

  test("LshSignatureExpr matches the nested-aggregate form on every " +
    "vector shape (normal, short, long, null-element)") {
    val dim = 16
    val rows = Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])](
      (1L, pv(1L, 16), fseq()),
      (2L, pv(2L, 16), fseq()),
      (3L, pv(3L, 8), fseq()),   // shorter than dim → 0
      (4L, pv(4L, 32), fseq()),  // longer → truncated at dim
      (5L, pv(5L, 15) :+ null.asInstanceOf[java.lang.Float], fseq()),
      (6L, Seq.fill(16)(java.lang.Float.valueOf(0.0f)), fseq()),
      (7L, null, fseq())) // NULL vector → signature 0, NOT NULL
    val df = vecsDf(rows)
    val out = df.select(col("id"),
      Similarity.lshSignature(col("a"), dim, 12).as("native"),
      Similarity.lshSignatureHof(col("a"), dim, 12).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"id ${r.getLong(0)}: native=${r.get(1)} hof=${r.get(2)}")
    }
    // sanity: the normal vectors produce distinct nonzero signatures
    val sigs = out.filter(r => Seq(1L, 2L).contains(r.getLong(0)))
      .map(_.getLong(1))
    assert(sigs.distinct.length == 2 && sigs.forall(_ != 0L))
    // short / null-element / NULL vectors → 0 (a real value: bucket
    // joins must keep these rows, not drop them via NULL keys)
    out.filter(r => Seq(3L, 5L, 7L).contains(r.getLong(0)))
      .foreach(r => assert(!r.isNullAt(1) && r.getLong(1) == 0L,
        s"id ${r.getLong(0)}"))
  }

  test("VecDotExpr widens integer element arrays like the HOF cast") {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(1L, Seq(1L, 2L, 3L), Seq(2, 4, 6))).asJava,
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("a", ArrayType(LongType, false), true),
        StructField("b", ArrayType(IntegerType, false), true))))
    val out = df.select(
      Similarity.dot(col("a"), col("b")).as("n"),
      Similarity.dotHof(col("a"), col("b")).as("h")).collect()(0)
    assert(out.getDouble(0) == 28.0 && out.getDouble(1) == 28.0)
  }

  test("VecSqDistLongExpr matches the zip_with fold over long arrays") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 0L, 3L)),
      (2L, Seq(-5L, 5L), Seq(5L, -5L)),
      (3L, Seq.empty[Long], Seq.empty[Long]),
      (4L, Seq(1L), Seq(1L, 2L))) // mismatch → NULL
    val df = spark.createDataFrame(
      rows.map { case (i, a, b) => Row(i, a, b) }.asJava,
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("a", ArrayType(LongType, false), true),
        StructField("b", ArrayType(LongType, false), true))))
    val native = GraftBridge.toColumn(graft.functions.VecSqDistLongExpr(
      GraftBridge.toExpression(col("a")),
      GraftBridge.toExpression(col("b"))))
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    val out = df.select(col("id"), native.as("n"), hof.as("h")).collect()
    out.foreach(r => assert(r.get(1) == r.get(2), s"id ${r.getLong(0)}"))
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) == 13L)
    assert(out.find(_.getLong(0) == 4L).get.get(1) == null)
  }
}
