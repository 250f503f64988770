package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** span_grams(tokens, n): every n-token window of a token array joined
  * by single spaces, in ONE compiled pass — the fused form of
  * `transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks,
  * i+1, n)))`. Higher-order functions run interpreted (ArrayTransform
  * is CodegenFallback) and that tree pays, per gram: a lambda
  * dispatch, a slice() array allocation, and an interpreted concat_ws
  * — the round-16 q88 profile put span-STRING building at most of the
  * map side. Here the only per-gram allocation is the output string
  * itself (`UTF8String.concatWs`, which also matches concat_ws's
  * null-element skipping exactly).
  *
  * Shorter-than-n token arrays produce ONE whole-sequence gram — the
  * same convention as [[graft.ops.Dedup.shingles]] (reference
  * behavior: a short doc is its own span).
  */
case class SpanGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"span_grams needs n >= 1, got $n")
  override def prettyName: String = "span_grams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    if (sz < n) {
      val buf = new Array[UTF8String](sz)
      var i = 0
      while (i < sz) { buf(i) = toks.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(space, buf: _*)))
    } else {
      val out = new Array[Any](sz - n + 1)
      val buf = new Array[UTF8String](n)
      var g = 0
      while (g <= sz - n) {
        var j = 0
        while (j < n) { buf(j) = toks.getUTF8String(g + j); j += 1 }
        out(g) = UTF8String.concatWs(space, buf: _*)
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val spaceRef = ctx.addReferenceObj("space", space, "UTF8String")
      val sz = ctx.freshName("sz"); val out = ctx.freshName("out")
      val buf = ctx.freshName("buf"); val g = ctx.freshName("g")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      s"""
         |int $sz = $toks.numElements();
         |Object[] $out;
         |if ($sz < $n) {
         |  UTF8String[] $buf = new UTF8String[$sz];
         |  for (int $i = 0; $i < $sz; $i++) { $buf[$i] = $toks.getUTF8String($i); }
         |  $out = new Object[]{ UTF8String.concatWs($spaceRef, $buf) };
         |} else {
         |  $out = new Object[$sz - $n + 1];
         |  UTF8String[] $buf = new UTF8String[$n];
         |  for (int $g = 0; $g <= $sz - $n; $g++) {
         |    for (int $j = 0; $j < $n; $j++) { $buf[$j] = $toks.getUTF8String($g + $j); }
         |    $out[$g] = UTF8String.concatWs($spaceRef, $buf);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** gram_hashes(tokens, n): the 64-bit n-gram hashes of a token array in
  * ONE compiled pass, bit-for-bit equal to the HOF formulation
  * `transform(sequence(0, size-n), i -> xxhash64(slice(transform(toks,
  * xxhash64), i+1, n)))` — each token hashes once
  * (`XXH64.hashUTF8String`, seed 42 = Spark's xxhash64 default), each
  * gram is the element-chained fold `h = hashLong(tokHash, h)` that
  * Spark's hash expressions apply to arrays. Null tokens contribute the
  * seed, exactly as `xxhash64(null)` does. The HOF tree paid, per gram,
  * an interpreted lambda dispatch + a slice() allocation + an
  * interpreted array hash; here there are zero per-gram allocations.
  *
  * Shorter-than-n arrays produce ONE whole-sequence hash — the same
  * convention as [[SpanGrams]].
  */
case class GramHashes(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"gram_hashes needs n >= 1, got $n")
  override def prettyName: String = "gram_hashes"
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $other")
  }

  private val seed = 42L

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val toks = v.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val th = new Array[Long](sz)
    var i = 0
    while (i < sz) {
      th(i) = if (toks.isNullAt(i)) seed else XXH64.hashUTF8String(toks.getUTF8String(i), seed)
      i += 1
    }
    if (sz < n) {
      var h = seed
      i = 0
      while (i < sz) { h = XXH64.hashLong(th(i), h); i += 1 }
      new GenericArrayData(Array[Long](h))
    } else {
      val out = new Array[Long](sz - n + 1)
      var g = 0
      while (g <= sz - n) {
        var h = seed
        var j = 0
        while (j < n) { h = XXH64.hashLong(th(g + j), h); j += 1 }
        out(g) = h
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val sz = ctx.freshName("sz"); val th = ctx.freshName("th")
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val j = ctx.freshName("j"); val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""
         |int $sz = $toks.numElements();
         |long[] $th = new long[$sz];
         |for (int $i = 0; $i < $sz; $i++) {
         |  $th[$i] = $toks.isNullAt($i) ? ${seed}L : $xxh.hashUTF8String($toks.getUTF8String($i), ${seed}L);
         |}
         |long[] $out;
         |if ($sz < $n) {
         |  long $h = ${seed}L;
         |  for (int $i = 0; $i < $sz; $i++) { $h = $xxh.hashLong($th[$i], $h); }
         |  $out = new long[]{ $h };
         |} else {
         |  $out = new long[$sz - $n + 1];
         |  for (int $g = 0; $g <= $sz - $n; $g++) {
         |    long $h = ${seed}L;
         |    for (int $j = 0; $j < $n; $j++) { $h = $xxh.hashLong($th[$g + $j], $h); }
         |    $out[$g] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object TextFunctions {
  /** Column wrapper for [[SpanGrams]]. */
  def spanGrams(tokens: Column, n: Int): Column =
    bridge.column(SpanGrams(bridge.expression(tokens), n))

  /** Column wrapper for [[GramHashes]]. */
  def gramHashes(tokens: Column, n: Int): Column =
    bridge.column(GramHashes(bridge.expression(tokens), n))
}
