package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group MinHash sketch union: merges row-level signatures
  * elementwise-min into one signature per group (SURVEY §7 "per-group
  * sketch union → Aggregator[IN,BUF,OUT]"). Lets a grouped corpus (by
  * domain, source, crawl...) carry one constant-size near-dup sketch per
  * group; union of two groups' sketches = sketch of their union, so the
  * aggregation is associative and Spark runs it partial+final (map-side
  * combine — only k longs per group cross the shuffle).
  */
object MinHashUnion extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] =
    if (buf.isEmpty) sig.toArray
    else {
      var i = 0
      while (i < buf.length && i < sig.length) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column form for DataFrame `.agg(...)`. */
  def column: TypedColumn[Seq[Long], Seq[Long]] = MinHashUnion.toColumn
}

object MinHashUtil {
  /** Estimated Jaccard similarity between two MinHash sketches. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else a.zip(b).count { case (x, y) => x == y }.toDouble / math.min(a.length, b.length)
}
