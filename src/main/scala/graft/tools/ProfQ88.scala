package graft.tools

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session A/B of q88's span-string construction (round 18):
  * (a) the pre-r18 interpreted HOF tree — staged token projection, then
  *     `transform(sequence, i -> concat_ws(' ', slice(toks, i+1, n)))`
  *     (ArrayTransform is CodegenFallback: per gram it pays a lambda
  *     dispatch, a slice() allocation, and an interpreted concat_ws);
  * (b) the fused SpanGrams codegen expression — one compiled loop, the
  *     output string is the only per-gram allocation.
  * Both run the full q88 aggregation tail so the delta is attributable
  * end-to-end and not just to the map side.
  */
object ProfQ88 {
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

    // (a) pre-r18 HOF shape, reproduced verbatim (incl. staging projection)
    def hofSpans(): DataFrame = {
      val tk = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("_tk"))
      val sh = when(size(col("_tk")) < 10, array(concat_ws(" ", col("_tk"))))
        .otherwise(transform(sequence(lit(0), size(col("_tk")) - 10),
          i => concat_ws(" ", slice(col("_tk"), i + 1, lit(10)))))
      tk.select(col("doc_id"), explode(sh).as("span"))
    }
    def aggTail(spans: DataFrame): Long =
      spans.repartition(col("span"))
        .groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("_cnt"))
        .groupBy(col("span"))
        .agg(count(col("doc_id")).as("n_docs"), sum(col("_cnt")).as("n_occurrences"),
          min(col("doc_id")).as("first_id"))
        .where(col("n_docs") >= 2)
        .count()

    def time(label: String)(f: => Long): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[$label] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    // Interleave the two shapes: a monotone warmup (C2 JIT, page cache)
    // otherwise biases whichever runs first — the round-18 first cut
    // read a 45% win that an alternated re-run shrank to ~10%.
    def runA(): Long = aggTail(hofSpans())
    def runB(): Long =
      Dedup.duplicateSpans(docs, "doc_id", "text", n = 10, minDocs = 2, hashSpans = false).count()
    runA(); runB() // shared warmup, untimed
    (1 to 4).foreach { i =>
      val tA0 = System.nanoTime(); val nA = runA(); val tA = (System.nanoTime() - tA0) / 1e9
      val tB0 = System.nanoTime(); val nB = runB(); val tB = (System.nanoTime() - tB0) / 1e9
      println(f"[ab-interleaved] round $i: a-hof $tA%.2fs (rows=$nA)  b-fused $tB%.2fs (rows=$nB)")
    }
    spark.stop()
  }
}
