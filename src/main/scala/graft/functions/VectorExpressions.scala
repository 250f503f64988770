package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math. Whole-stage-codegen'd
  * tight loops over the underlying `ArrayData` — no boxing, no UDF
  * serialization, stays inside the WholeStageCodegen span (unlike a Scala
  * UDF, which forces a codegen boundary and per-row Row conversion; at
  * 100 TB the difference is the job).
  *
  * The reference has no vector math of its own — embeddings there come
  * from LLM service readers (reference readers.py:785 LlamaCPPEmbedding)
  * and similarity is delegated to backends. Here it is a first-class,
  * codegen'd scalar surface.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }
}

/** cosine_sim(a, b): cosine similarity of two float vectors, in double
  * precision. 0.0 when either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b) in double precision. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_norm(a) in double precision. */
case class L2Norm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "l2_norm"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other                   => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double x = (double) $a.getFloat($i);
         |  $s += x * x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** lsh_band_buckets(vec): banded random-hyperplane LSH in one codegen'd
  * pass — returns `array<long>` of length `groups`, element g packing the
  * sign bits of hyperplanes [g*bitsPerGroup, (g+1)*bitsPerGroup) (bit j =
  * sign of plane g*bitsPerGroup+j, matching the shift/mask banding of a
  * packed signature). The plane matrix is derived deterministically from
  * `seed` on each executor — plan-embedded constants, no side data.
  *
  * Replaces the HOF formulation (one interpreted `aggregate` per bit —
  * 128 array traversals per row at the q50 defaults, and `shiftleft(1L,
  * i)` silently aliases mod 64 past bit 63). Here: one traversal per
  * plane in a tight generated loop, and no 64-bit packing limit.
  */
case class LshBandBuckets(
    child: Expression,
    bitsPerGroup: Int,
    groups: Int,
    dim: Int,
    seed: Long
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "lsh_band_buckets"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other                   => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $other")
  }

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bitsPerGroup * groups)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](groups)
    var bit = 0
    var g = 0
    while (g < groups) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerGroup) {
        val p = planes(bit)
        var dot = 0.0
        var i = 0
        while (i < n) {
          if (!a.isNullAt(i)) dot += a.getFloat(i).toDouble * p(i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << j)
        j += 1; bit += 1
      }
      out(g) = bucket
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val bit = ctx.freshName("bit")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("plane")
      s"""
         |long[] $out = new long[$groups];
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $bit = 0;
         |for (int $g = 0; $g < $groups; $g++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerGroup; $j++) {
         |    double[] $p = $planesRef[$bit];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if (!$a.isNullAt($i)) $dot += (double) $a.getFloat($i) * $p[$i];
         |    }
         |    if ($dot > 0) $bucket |= (1L << $j);
         |    $bit++;
         |  }
         |  $out[$g] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Engine-neutral (hash-exact) LSH band buckets: INTEGER hyperplanes over
  * components quantized to floor(v*1000) — coefficient for (hyperplane h,
  * 1-based dim i) is `(a(h)*i + b(h)) mod (2^31-1) - 2^30`, all BIGINT
  * arithmetic any engine reproduces bit-for-bit (the q78 md5 mold applied
  * to ANN). Same compiled-loop shape as [[LshBandBuckets]]: the
  * HOF-composed version of this computation re-quantized the vector and
  * ran 36 interpreted zip_with/aggregate passes per row, measuring
  * ~2.5 s on the q86 serial wall; this quantizes once and runs one
  * codegen'd loop.
  * Coefficients arrive as params so the caller (and its SQL oracle) pin
  * the exact same literals.
  */
case class PortableLshBuckets(
    child: Expression,
    bitsPerGroup: Int,
    groups: Int,
    a: Seq[Long],
    b: Seq[Long]
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(a.length == bitsPerGroup * groups && b.length == a.length,
    s"need ${bitsPerGroup * groups} coefficient pairs, got ${a.length}/${b.length}")
  override def prettyName: String = "portable_lsh_buckets"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other                   => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $other")
  }

  private val P = 2147483647L // 2^31-1; halfP below recenters to signed
  private val halfP = P / 2
  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // quantize once per row, not once per hyperplane
    val q = new Array[Long](n)
    var i = 0
    while (i < n) { q(i) = math.floor(arr.getFloat(i).toDouble * 1000).toLong; i += 1 }
    val out = new Array[Long](groups)
    var bit = 0
    var g = 0
    while (g < groups) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerGroup) {
        val ah = aArr(bit); val bh = bArr(bit)
        var dot = 0L
        i = 0
        while (i < n) { dot += q(i) * ((ah * (i + 1) + bh) % P - halfP); i += 1 }
        if (dot > 0) bucket |= (1L << j)
        j += 1; bit += 1
      }
      out(g) = bucket
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("a", aArr, "long[]")
      val bRef = ctx.addReferenceObj("b", bArr, "long[]")
      val out = ctx.freshName("out"); val q = ctx.freshName("q")
      val n = ctx.freshName("n"); val bit = ctx.freshName("bit")
      val g = ctx.freshName("g"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket")
      val ah = ctx.freshName("ah"); val bh = ctx.freshName("bh")
      s"""
         |int $n = $arr.numElements();
         |long[] $q = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $q[$i] = (long) java.lang.Math.floor((double) $arr.getFloat($i) * 1000.0);
         |}
         |long[] $out = new long[$groups];
         |int $bit = 0;
         |for (int $g = 0; $g < $groups; $g++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerGroup; $j++) {
         |    long $ah = $aRef[$bit]; long $bh = $bRef[$bit];
         |    long $dot = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $q[$i] * (($ah * ($i + 1) + $bh) % ${P}L - ${halfP}L);
         |    }
         |    if ($dot > 0) $bucket |= (1L << $j);
         |    $bit++;
         |  }
         |  $out[$g] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object VectorFunctions {
  private def f(c: Column): Expression = bridge.expression(c.cast(ArrayType(FloatType)))

  def cosineSim(a: Column, b: Column): Column = bridge.column(CosineSimilarity(f(a), f(b)))

  def dotProduct(a: Column, b: Column): Column = bridge.column(DotProduct(f(a), f(b)))

  def l2Norm(a: Column): Column = bridge.column(L2Norm(f(a)))

  def lshBandBuckets(vec: Column, bitsPerGroup: Int, groups: Int, dim: Int, seed: Long = 42L): Column =
    bridge.column(LshBandBuckets(f(vec), bitsPerGroup, groups, dim, seed))

  def portableLshBuckets(vec: Column, bitsPerGroup: Int, groups: Int, a: Seq[Long], b: Seq[Long]): Column =
    bridge.column(PortableLshBuckets(f(vec), bitsPerGroup, groups, a, b))
}
