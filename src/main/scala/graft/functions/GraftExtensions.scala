package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installing the engine's custom Catalyst
  * expressions as SQL functions, so the `spark.sql` passthrough surface
  * (the DuckSQL-parity path) can call them by name:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * Also registrable via config:
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, fi, builder) => ext.injectFunction((id, fi, builder)) }
}

object GraftExtensions {

  private def info(name: String, usage: String, impl: Class[_]) =
    new ExpressionInfo(impl.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  // Scalar-parameter extraction for SQL-surface builders: the Int/Long/
  // word-list parameters of the fused text expressions are expression
  // CONSTRUCTOR arguments (they shape the generated code), so the SQL
  // form requires foldable literals and refuses anything else loudly.
  private def litInt(e: Expression, fn: String, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
      // refuse loudly, never truncate: 4294967297L.toInt is 1, which
      // would silently reshape the expression instead of erroring
      if (v >= Int.MinValue && v <= Int.MaxValue) v.toInt
      else throw new IllegalArgumentException(
        s"$fn: $what must fit in an Int, got $v")
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }
  private def litLong(e: Expression, fn: String, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }
  private def litStrings(e: Expression, fn: String, what: String): Seq[String] = e match {
    case arr: org.apache.spark.sql.catalyst.expressions.CreateArray =>
      arr.children.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
          s.toString
        case other => throw new IllegalArgumentException(
          s"$fn: $what must be an array of string literals, got element $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be array('w1', 'w2', ...) of string literals, got $other")
  }

  private[functions] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors", classOf[CosineSimilarity]),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float vectors", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm of a float vector", classOf[L2Norm]),
      (args: Seq[Expression]) => L2Norm(args(0))),
    (FunctionIdentifier("span_grams"),
      info("span_grams", "span_grams(tokens, n) - every n-token window joined by spaces (fused)", classOf[SpanGrams]),
      (args: Seq[Expression]) => SpanGrams(args(0), litInt(args(1), "span_grams", "n"))),
    (FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(tokens, n) - 64-bit n-gram hashes of a token array (fused)", classOf[GramHashes]),
      (args: Seq[Expression]) => GramHashes(args(0), litInt(args(1), "gram_hashes", "n"))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens, shingleN, k[, seed]) - k-long MinHash signature (fused)", classOf[MinHashSig]),
      (args: Seq[Expression]) => MinHashSig(args(0),
        litInt(args(1), "minhash_sig", "shingleN"),
        litInt(args(2), "minhash_sig", "k"),
        if (args.length > 3) litLong(args(3), "minhash_sig", "seed") else 42L)),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array (fused)", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))),
    (FunctionIdentifier("whitespace_tokens"),
      info("whitespace_tokens", "whitespace_tokens(str) - maximal non-whitespace runs (fused tokenizer tail)", classOf[WhitespaceTokens]),
      (args: Seq[Expression]) => WhitespaceTokens(args(0))),
    (FunctionIdentifier("non_blank_lines"),
      info("non_blank_lines", "non_blank_lines(str) - newline-split segments with any non-space char (fused)", classOf[NonBlankLines]),
      (args: Seq[Expression]) => NonBlankLines(args(0))),
    (FunctionIdentifier("count_ascii_punct"),
      info("count_ascii_punct", "count_ascii_punct(str) - ASCII punctuation character count (fused)", classOf[CountAsciiPunct]),
      (args: Seq[Expression]) => CountAsciiPunct(args(0))),
    (FunctionIdentifier("sum_char_lengths"),
      info("sum_char_lengths", "sum_char_lengths(arr) - total character count of a string array (fused)", classOf[SumCharLengths]),
      (args: Seq[Expression]) => SumCharLengths(args(0))),
    (FunctionIdentifier("count_in_set"),
      info("count_in_set", "count_in_set(arr, array('w', ...)) - elements present in a literal word set (fused)", classOf[CountInSet]),
      (args: Seq[Expression]) => CountInSet(args(0), litStrings(args(1), "count_in_set", "word set"))),
    (FunctionIdentifier("non_empty_strings"),
      info("non_empty_strings", "non_empty_strings(arr) - the array with null and zero-length elements removed (fused)", classOf[NonEmptyStrings]),
      (args: Seq[Expression]) => NonEmptyStrings(args(0)))
  )

  /** Register into an already-running session (extensions normally bind
    * at builder time; this covers sessions the caller didn't build).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, fi, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, fi, builder)
    }
}
