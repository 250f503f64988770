package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session A/B of the dupSpanStats shapes:
  * (a) checkpoint AFTER repartition(span) — partitioning lost across the
  *     AQE checkpoint, flagged chain re-exchanges twice (r17 reject);
  * (b) checkpoint raw + repartition(span) only in the flagged branch —
  *     the r17–r18 committed shape;
  * (c) NO checkpoint: one span-keyed exchange shared by the flag-set
  *     aggregation and the join-back (ReusedExchange) — the first r19
  *     cut after the third-decade probe OOM'd shape (b) at 5M docs (the
  *     checkpoint pins ~8x corpus bytes in the BlockManager; the
  *     shared exchange keeps it in disk-backed shuffle files);
  * (d) window flag: (span,doc) pre-aggregate on the exchange, doc
  *     frequency via count() OVER (PARTITION BY span), no join — ONE
  *     shuffle read instead of (c)'s two, the committed r19 shape.
  * c/d run INTERLEAVED after a shared warmup (the r18 A/B lesson).
  */
object ProfQ90 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    def statsFrom(spans: DataFrame, flaggedSrc: DataFrame): DataFrame = {
      val flagged = flaggedSrc
        .groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("_c"))
        .groupBy(col("span")).agg(count(lit(1)).as("_nd"))
        .where(col("_nd") >= 2)
        .select(col("span"), lit(1).as("_dup"))
      spans.join(flagged, Seq("span"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), count(col("_dup")).as("n_dup_spans"))
    }
    def explodeSpans(): DataFrame =
      Dedup.explodeShingles(docs, "doc_id", "text", 10, outCol = "span")

    def once(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def shapeC(): Long = {
      val spans = explodeSpans().repartition(col("span"))
      statsFrom(spans, spans).count()
    }
    def shapeD(): Long = {
      val spans = explodeSpans().repartition(col("span"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("span"))
      spans.groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("_cnt"))
        .withColumn("_ndocs", count(col("doc_id")).over(w))
        .groupBy(col("doc_id"))
        .agg(sum(col("_cnt")).as("n_spans"),
          sum(when(col("_ndocs") >= 2, col("_cnt")).otherwise(lit(0L))).as("n_dup_spans"))
        .count()
    }
    // shared untimed warmup, then interleaved c,d,c,d,...
    shapeC(); shapeD()
    (1 to 5).foreach { i =>
      val (tc, nc) = once(shapeC())
      val (td, nd) = once(shapeD())
      println(f"[round $i] c-shared-exchange=$tc%.2fs($nc)  d-window-flag=$td%.2fs($nd)")
    }
    val _ = TextOps
    spark.stop()
  }
}
