package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session A/B of the dupSpanStats checkpoint shapes (round 17):
  * (a) checkpoint AFTER repartition(span) — partitioning lost across the
  *     AQE checkpoint, flagged chain re-exchanges twice;
  * (b) checkpoint raw + repartition(span) only in the flagged branch —
  *     one exchange, the committed shape.
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

    def time(label: String)(f: => Long): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[$label] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    time("a-ckpt-after-repart") {
      val spans = explodeSpans().repartition(col("span")).localCheckpoint()
      statsFrom(spans, spans).count()
    }
    time("b-ckpt-raw") {
      val spans = explodeSpans().localCheckpoint()
      statsFrom(spans, spans.repartition(col("span"))).count()
    }
    val _ = TextOps
    spark.stop()
  }
}
