package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B isolating the round-19 fused tokenizer
  * ([[graft.functions.WhitespaceTokens]]) inside the q88 hash-path
  * span-gram pipeline, against the pre-fusion HOF tokenizer
  * (regex split + interpreted ArrayFilter) feeding the SAME fused
  * GramHashes + span aggregation — so the only variable is the
  * tokenizer stage. Needed because the doc-probe walls swing ~3x
  * across box sessions (SCALE.md r18/r19 footnotes) and a sequential
  * before/after cannot attribute anything.
  * `sbt "runMain graft.tools.ProfTokenizer [docsDir]"` (defaults to
  * the DeepScaleProbe sf10 slice).
  */
object ProfTokenizer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/deepscale/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", DeepScaleProbe.shufflePartitionsFor(dir))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[prof] corpus: ${docs.count()} docs from $dir")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val n = 10
    def spanPipeline(toks: org.apache.spark.sql.Column): DataFrame = {
      val grams = graft.functions.TextFunctions.gramHashes(toks, n)
      docs.repartition(32)
        .select(col("doc_id"), explode(grams).as("span"))
        .repartition(col("span"))
        .groupBy(col("span"), col("doc_id")).agg(count(lit(1)).as("_cnt"))
        .groupBy(col("span"))
        .agg(count(col("doc_id")).as("n_docs"), sum(col("_cnt")).as("n_occurrences"),
          min(col("doc_id")).as("first_id"))
        .where(col("n_docs") >= 2)
    }
    val fused = spanPipeline(graft.ops.TextOps.tokens(col("text")))
    val hof = spanPipeline(
      filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0))
    // untimed warmup of both
    fused.count(); hof.count()
    var cf = 0L; var ch = 0L
    for (r <- 1 to 3) {
      cf = time(s"round $r fused")(fused.count())
      ch = time(s"round $r hof  ")(hof.count())
    }
    println(s"[prof] rows fused=$cf hof=$ch equal=${cf == ch}")
    spark.stop()
  }
}
