package graft.readers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton curve) clustering value, shared by the Delta and
  * Iceberg writers' OPTIMIZE-ZORDER rewrites so the two cannot drift.
  *
  * Shape at scale: ONE `approxQuantile` sketch pass over a COLUMN-
  * PRUNED scan learns `ranks` range boundaries per clustering column
  * (the sampled-boundary approach of Spark's own RangePartitioner);
  * each row's per-column rank is then pure Column arithmetic — a sum
  * of boundary comparisons — and the z value interleaves the rank
  * bits via shift/and. No UDF anywhere, so the whole computation
  * stays inside whole-stage codegen.
  */
private[readers] object ZOrder {

  def validate(zCols: Seq[String], ranks: Int, targetFileBytes: Long, op: String): Unit = {
    require(zCols.nonEmpty && zCols.size <= 4,
      s"$op: 1-4 clustering columns (got ${zCols.size}) — beyond 4 the interleaved " +
        "ranges stop being selective for any of them")
    require(ranks >= 2 && ranks <= 256 && (ranks & (ranks - 1)) == 0,
      s"$op: ranks must be a power of two in [2, 256] (got $ranks)")
    require(targetFileBytes > 0,
      s"$op: targetFileBytes must be positive (got $targetFileBytes)")
  }

  /** An order-preserving DOUBLE proxy for ranking (ranking only needs
    * order, and 48 bits of a string prefix is exact in a double).
    * Strings compare byte-wise in Spark, so the hex of the first UTF-8
    * bytes ranks identically; rpad both pads short values and
    * truncates long ones to the 12 hex chars (6 bytes) that fit. */
  def proxy(c: Column, name: String, dt: DataType, op: String): Column = dt match {
    case _: NumericType   => c.cast("double")
    case BooleanType      => c.cast("int").cast("double")
    case DateType         => unix_date(c).cast("double")
    case TimestampType    => unix_micros(c).cast("double")
    case TimestampNTZType => unix_micros(c.cast("timestamp")).cast("double")
    case StringType =>
      conv(rpad(hex(encode(substring(c, 1, 6), "UTF-8")), 12, "0"), 16, 10).cast("double")
    case other => throw new IllegalArgumentException(
      s"$op: column '$name' of type ${other.simpleString} is not orderable for " +
        "clustering (numeric/string/date/timestamp/boolean)")
  }

  /** The z value for `df`'s rows over `cols` — runs the boundary
    * sketch (an action) and returns the pure-Column interleave. Nulls
    * rank 0, the low end (delta-spark's own null placement). */
  def zColumn(df: DataFrame, cols: Seq[(String, DataType)], ranks: Int,
      op: String): Column = {
    val proxies = cols.map { case (n, dt) => proxy(df(s"`$n`"), n, dt, op) }
    val probs = (1 until ranks).map(_.toDouble / ranks).toArray
    val boundaries: Seq[Seq[Double]] = df
      .select(proxies.zipWithIndex.map { case (e, i) => e.as(s"__p$i") }: _*)
      .stat.approxQuantile(cols.indices.map(i => s"__p$i").toArray, probs, 0.01)
      .toSeq.map(_.toSeq.distinct.sorted)
    val k = cols.size
    val nBits = Integer.numberOfTrailingZeros(ranks)
    cols.indices.map { i =>
      val p = proxies(i)
      val rank = boundaries(i).foldLeft(lit(0))((acc, b) =>
        acc + when(p.isNotNull && p >= lit(b), 1).otherwise(0))
      (0 until nBits).map(j =>
        shiftleft(shiftright(rank, j).bitwiseAND(lit(1)), j * k + i).cast("long"))
        .reduce(_ + _)
    }.reduce(_ + _)
  }
}
