package graft.tools

import graft.queries.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session interleaved A/B for q69_chunking (VERDICT r19 #5): the
  * last >2x heavy-tail row without a formal accept record (judge-serial
  * ~0.27 s vs DuckDB 0.113 s; map-only plan, zero exchanges beyond the
  * scan at both SFs). Three shapes:
  *
  *   a) the PRE-r20 formulation — chunk windows via tokens → per-chunk
  *      array_join → chunk_tokens by RE-TOKENIZING the joined chunk
  *      text (counts literally what a downstream consumer of
  *      chunk_text would see; inlined here, NOT a Chunking call — the
  *      library ships shape (b) since the r20 fix, and the parity pin
  *      is only an independent oracle against this inlined original);
  *   b) the COMMITTED query (`Chunking.chunkByTokens`) — arithmetic
  *      chunk_tokens = least(maxTokens, n_toks - idx*step),
  *      value-identical by construction (tokens are non-empty and
  *      whitespace-free, so re-splitting the single-space join returns
  *      exactly the slice) but skipping the per-chunk regex pass;
  *   c) the floor — same scan + tokenize + window explode with a
  *      constant payload (no array_join, no counting), isolating the
  *      fixed cost (scan, tokenize once, explode skeleton) no rewrite
  *      of the chunk arithmetic can remove.
  *
  * (a)-(b) attributes the re-tokenization tax, (b)-(c) the chunk_text
  * string building (inherent — it IS the output), (c) the floor.
  * Interleaved a,b,c per round after one shared untimed warmup (the
  * ProfQ30 mold; sequential blocks bias whichever runs first).
  */
object ProfQ69 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (maxTokens, overlap) = (64, 16)
    val step = maxTokens - overlap
    def base(): DataFrame =
      table(spark, sfDir, "documents").select("doc_id", "text")
        .withColumn("_toks", graft.ops.TextOps.tokens(col("text")))
        .withColumn("_n",
          greatest(lit(1L), ceil((size(col("_toks")) - lit(overlap)) / lit(step.toDouble)).cast("long")))
    def chunks = transform(
      sequence(lit(0L), col("_n") - 1),
      i => array_join(slice(col("_toks"), (i * step + 1).cast("int"), lit(maxTokens)), " "))

    // a) the PRE-r20 formulation, INLINED (not a call into Chunking —
    //    chunkByTokens itself ships shape (b) since the r20 fix, and
    //    the parity pin below is only an independent oracle if this
    //    leg keeps re-tokenizing each chunk for its count)
    def committed(): DataFrame =
      base()
        .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_index", "chunk_text")))
        .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk_text"),
          size(graft.ops.TextOps.tokens(col("chunk_text"))).cast("long").as("chunk_tokens"))
    // b) arithmetic count, same chunk_text — what chunkByTokens ships
    def arith(): DataFrame =
      graft.ops.Chunking.chunkByTokens(
        table(spark, sfDir, "documents").select("doc_id", "text"),
        "doc_id", "text", maxTokens = maxTokens, overlap = overlap)
    // c) floor: explode the same windows, constant payload
    def floorQ(): DataFrame =
      base().select(col("doc_id"), posexplode(transform(
        sequence(lit(0L), col("_n") - 1), i => i * step)).as(Seq("chunk_index", "start")))

    // TWO consumption regimes. Bench consumes with count(), under which
    // Catalyst PRUNES every post-explode projection (the re-tokenize,
    // the arithmetic count) — only the generator input (array_join
    // array) must evaluate for cardinality. A real consumer (Verify's
    // parquet dump, any downstream op) evaluates all four columns; the
    // hash-sum consumer forces that with negligible consumption cost.
    def run(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def runFull(df: => DataFrame): (Double, Long) = {
      val d = df
      val hashed = d.select(xxhash64(d.columns.map(col): _*).as("h"))
        .agg(bit_xor(col("h"))) // xor, not sum: ANSI Long sum overflows
      val t0 = System.nanoTime()
      hashed.collect()
      ((System.nanoTime() - t0) / 1e9, 1L)
    }
    // value parity first (one pass, untimed): a == b row-for-row
    val canonA = committed().orderBy("doc_id", "chunk_index").collect().map(_.toSeq).toSeq
    val canonB = arith().orderBy("doc_id", "chunk_index").collect().map(_.toSeq).toSeq
    require(canonA == canonB, "arithmetic chunk_tokens must be value-identical to the re-tokenized count")
    println(s"[ab-q69] parity: a == b on ${canonA.size} rows")

    run(committed()); run(arith()); run(floorQ()) // shared warmup, untimed
    val acc = Array.fill(6)(List.empty[Double])
    (1 to 6).foreach { i =>
      val (ta, _) = run(committed())
      val (tb, _) = run(arith())
      val (tc, _) = run(floorQ())
      val (tA, _) = runFull(committed())
      val (tB, _) = runFull(arith())
      val (tC, _) = runFull(floorQ())
      acc(0) ::= ta; acc(1) ::= tb; acc(2) ::= tc
      acc(3) ::= tA; acc(4) ::= tB; acc(5) ::= tC
      println(f"[ab-q69] round $i: COUNT a $ta%.3fs b $tb%.3fs c $tc%.3fs | FULL a $tA%.3fs b $tB%.3fs c $tC%.3fs")
    }
    def best(l: List[Double]) = l.min
    println(f"[ab-q69] BEST count: a-retokenize ${best(acc(0))}%.3fs  b-arith ${best(acc(1))}%.3fs  c-floor ${best(acc(2))}%.3fs")
    println(f"[ab-q69] BEST full:  a-retokenize ${best(acc(3))}%.3fs  b-arith ${best(acc(4))}%.3fs  c-floor ${best(acc(5))}%.3fs")
    println(f"[ab-q69] attribution (count/bench regime — payload pruned): " +
      f"array-build ${best(acc(0)) - best(acc(2))}%.3fs  floor ${best(acc(2))}%.3fs")
    println(f"[ab-q69] attribution (full/consumer regime): retokenize-tax ${best(acc(3)) - best(acc(4))}%.3fs  " +
      f"text-build+count ${best(acc(4)) - best(acc(5))}%.3fs  floor ${best(acc(5))}%.3fs")
    spark.stop()
  }
}
