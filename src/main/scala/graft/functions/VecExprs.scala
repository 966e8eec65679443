package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Native Catalyst expressions for the embedding hot path (SURVEY.md
  * §2.9 — "promote to Catalyst Expressions for codegen").
  *
  * The `functions.aggregate(zip_with(...))` higher-order form these
  * replace is interpreted per ELEMENT: each lambda application walks an
  * eval tree, and zip_with materializes an intermediate array per row
  * (per PLANE, for LSH signatures — nBits arrays per row). At 100 TB ×
  * dim-1024 embeddings that interpretation overhead dominates the
  * actual multiply-adds. These expressions run the same arithmetic as a
  * tight generated loop inside whole-stage codegen: no intermediate
  * arrays, no boxing, no per-element virtual calls.
  *
  * BIT-EXACT CONTRACT: accumulation is left-to-right double addition
  * starting from 0.0 with each float element widened to double first —
  * the identical IEEE op order of the higher-order form (and of the
  * DuckDB oracles written against it), so every existing oracle keeps
  * hash-matching. NULL semantics also mirror the higher-order form:
  * - dot: NULL input array, length mismatch (zip_with's null padding),
  *   or any NULL element → NULL;
  * - LSH signature: a vector shorter than `dim` or with a NULL element
  *   in the first `dim` yields sum NULL for EVERY plane → bit 0 → the
  *   signature is 0 (not NULL), exactly like the `when(s >= 0, ...)
  *   .otherwise(0)` fold.
  */
object VecExprs {

  /** Element accessor codes for [[dot]]/generated loops: 0=double,
    * 1=float, 2=long, 3=int, 4=short, 5=byte — every fixed-width
    * numeric the HOF form's per-element `cast("double")` accepted
    * (decimal arrays are not supported — quantized embeddings are
    * integer or float typed). */
  def elemKind(t: DataType): Int = t match {
    case ArrayType(DoubleType, _)  => 0
    case ArrayType(FloatType, _)   => 1
    case ArrayType(LongType, _)    => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _)   => 4
    case ArrayType(ByteType, _)    => 5
    case _                         => -1
  }

  def getD(a: ArrayData, i: Int, kind: Int): Double = kind match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case _ => a.getByte(i).toDouble
  }

  def dot(a: ArrayData, b: ArrayData, aKind: Int,
          bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += getD(a, i, aKind) * getD(b, i, bKind)
      i += 1
    }
    s
  }

  /** LSH signature over a row-major [nBits × dim] plane matrix. The
    * vector is copied to a double[] once so the per-plane loop reads
    * sequentially (nBits passes over one cache-resident buffer instead
    * of nBits ArrayData traversals). */
  def lshSig(a: ArrayData, planes: Array[Double], dim: Int,
             nBits: Int, aKind: Int): Long = {
    if (a.numElements() < dim) return 0L
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return 0L
      v(i) = getD(a, i, aKind)
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var s = 0.0
      val base = j * dim
      var k = 0
      while (k < dim) { s += v(k) * planes(base + k); k += 1 }
      if (s >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Σ (a[i]−b[i])² over long arrays — the k-means Lloyd distance
    * (integer-exact). Null on length mismatch / null element, like the
    * zip_with fold it replaces. */
  def sqDistLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  private[functions] def validVec(t: DataType): Boolean = elemKind(t) >= 0

  /** The Java expression reading element `i` of ArrayData `a` widened
    * to double — codegen twin of [[getD]]. */
  private[functions] def getterCode(t: DataType, a: String,
                                    i: String): String =
    elemKind(t) match {
      case 0 => s"$a.getDouble($i)"
      case 1 => s"((double) $a.getFloat($i))"
      case 2 => s"((double) $a.getLong($i))"
      case 3 => s"((double) $a.getInt($i))"
      case 4 => s"((double) $a.getShort($i))"
      case _ => s"((double) $a.getByte($i))"
    }

  private val helper = VecExprs.getClass.getName.stripSuffix("$") +
    "$.MODULE$"

  private[functions] def helperRef: String = helper
}

/** Σ a[i]·b[i], left-to-right double accumulation (see object doc). */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.validVec(left.dataType) &&
        VecExprs.validVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects numeric array inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private lazy val aKind = VecExprs.elemKind(left.dataType)
  private lazy val bKind = VecExprs.elemKind(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aKind, bKind)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val getA = VecExprs.getterCode(left.dataType, a, i)
      val getB = VecExprs.getterCode(right.dataType, b, i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Σ (a[i]−b[i])² over array<bigint> — integer-exact k-means distance. */
case class VecSqDistLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sqdist_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> inputs, got " +
          s"${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.sqDistLong(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** Random-hyperplane LSH signature as one generated loop; `planes` is
  * the row-major [nBits × dim] ±1 matrix (a referenced object in the
  * generated class, like the LPM tables — not an expression subtree). */
case class LshSignatureExpr(child: Expression, planes: Array[Double],
                            dim: Int, nBits: Int)
    extends UnaryExpression {
  // nBits = 64 is legal: bit 63 lands on the sign bit, matching the HOF
  // fold's `+ (1L << 63)` (distinct powers of two carry-free ≡ OR)
  require(planes.length == dim * nBits && nBits <= 64 && nBits > 0)
  override def dataType: DataType = LongType
  // NULL input → signature 0, like short/null-element vectors: the HOF
  // fold returned 0 there too (NULL sum per plane → bit 0), and bucket
  // joins must keep NULL-embedding rows in bucket 0, not drop them via
  // NULL-never-equals-NULL
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.validVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a numeric array input, got " +
        child.dataType.catalogString)

  private lazy val aKind = VecExprs.elemKind(child.dataType)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else VecExprs.lshSig(v.asInstanceOf[ArrayData], planes, dim, nBits,
      aKind)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = ${childGen.isNull} ? 0L :
         |  ${VecExprs.helperRef}.lshSig(
         |    ${childGen.value}, $planesRef, $dim, $nBits, $aKind);
       """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)

  // Array[Double] equality is by reference; compare planes by content so
  // two identical signatures canonicalize equal (plan reuse, CSE)
  override def equals(other: Any): Boolean = other match {
    case LshSignatureExpr(c, p, d, n) =>
      c == child && d == dim && n == nBits &&
        java.util.Arrays.equals(p, planes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(dim), Int.box(nBits),
      Int.box(java.util.Arrays.hashCode(planes)))
}
