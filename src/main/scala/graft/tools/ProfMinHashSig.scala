package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the fused [[graft.functions.MinHashSig]]
  * expression vs the round-18 staged transform+UDF pipeline, on a
  * replicated doc slice so the signature map side actually dominates
  * (at plain sf0.1 both shapes sit at Spark's per-query floor).
  * `sbt "runMain graft.tools.ProfMinHashSig [sfDir] [replicas]"`.
  */
object ProfMinHashSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = if (args.length > 1) args(1).toInt else 10
    val out = s"/tmp/prof_minhash_x$replicas"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/documents.parquet").exists())
      ProbeData.replicateDocs(spark, sfDir, replicas, out)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"[prof] corpus: ${docs.count()} docs")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val fused = graft.ops.Dedup.withMinhashSignature(docs, "text", "sig", repartitionTo = Some(32))
    val staged = docs.repartition(32)
      .withColumn("sig", graft.ops.Dedup.stagedMinhashSignature(col("text"), 3, 64, 42L))
    // untimed warmup of both paths
    fused.select(sum(element_at(col("sig"), 1))).collect()
    staged.select(sum(element_at(col("sig"), 1))).collect()
    var parity = (0L, 0L)
    for (r <- 1 to 3) {
      val f = time(s"round $r fused ")(fused.select(sum(element_at(col("sig"), 1))).head.getLong(0))
      val s = time(s"round $r staged")(staged.select(sum(element_at(col("sig"), 1))).head.getLong(0))
      parity = (f, s)
    }
    println(s"[prof] checksum fused=${parity._1} staged=${parity._2} equal=${parity._1 == parity._2}")
    // SimHash: fused SimHash64 expression vs the nested-HOF tree. The
    // checksum masks to 32 bits — full-range 64-bit simhashes summed
    // over 1M rows overflow a long under ANSI mode.
    val shFused = docs.repartition(32)
      .select(graft.ops.Dedup.simhash(col("text")).bitwiseAND(lit(0xFFFFFFFFL)).as("h"))
    val shHof = docs.repartition(32)
      .select(graft.ops.Dedup.simhashHof(col("text")).bitwiseAND(lit(0xFFFFFFFFL)).as("h"))
    shFused.select(sum(col("h"))).collect(); shHof.select(sum(col("h"))).collect()
    var shParity = (0L, 0L)
    for (r <- 1 to 3) {
      val f = time(s"simhash round $r fused")(shFused.select(sum(col("h"))).head.getLong(0))
      val s = time(s"simhash round $r hof  ")(shHof.select(sum(col("h"))).head.getLong(0))
      shParity = (f, s)
    }
    println(s"[prof] simhash checksum fused=${shParity._1} hof=${shParity._2} equal=${shParity._1 == shParity._2}")
    // Token-stat fusions (NonEmptyStrings/CountInSet/SumCharLengths) vs
    // the interpreted-HOF predecessors, on the q46 lang+quality shape.
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "that", "for", "on", "with", "as", "this")
    def hofTokens(text: org.apache.spark.sql.Column) =
      filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)
    def hofStats(toksC: org.apache.spark.sql.Column) = struct(
      size(filter(toksC, t => t.isin(stopwords.map(lit): _*))).as("stop"),
      aggregate(toksC, lit(0L), (acc, t) => acc + length(t)).as("chars"),
      size(toksC).as("n"))
    def fusedStats(toksC: org.apache.spark.sql.Column) = struct(
      graft.functions.TextFunctions.countInSet(toksC, stopwords).as("stop"),
      graft.functions.TextFunctions.sumCharLengths(toksC).as("chars"),
      size(toksC).as("n"))
    val tsFused = docs.repartition(32).withColumn("_toks", graft.ops.TextOps.tokens(col("text")))
      .select(fusedStats(col("_toks")).as("s"))
      .agg(sum(col("s.stop")).as("a"), sum(col("s.chars")).as("b"), sum(col("s.n")).as("c"))
    val tsHof = docs.repartition(32).withColumn("_toks", hofTokens(col("text")))
      .select(hofStats(col("_toks")).as("s"))
      .agg(sum(col("s.stop")).as("a"), sum(col("s.chars")).as("b"), sum(col("s.n")).as("c"))
    tsFused.collect(); tsHof.collect()
    var tsF = ""; var tsH = ""
    for (r <- 1 to 3) {
      tsF = time(s"tokstats round $r fused")(tsFused.head.toSeq.mkString(","))
      tsH = time(s"tokstats round $r hof  ")(tsHof.head.toSeq.mkString(","))
    }
    println(s"[prof] tokstats checksum fused=$tsF hof=$tsH equal=${tsF == tsH}")
    spark.stop()
  }
}
