package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second-decade scale probe (VERDICT r17 #8): the round-17 10x probe
  * measured its two steepest exponents on q88 (0.54) and q85 (0.54),
  * where fixed overhead still dominates the sf0.1 wall and could mask
  * a super-linear term. This probe derives ONE MORE DECADE — an sf10
  * documents slice (100 token-prefixed replicas of sf0.1; replicas
  * share no shingles, within-replica structure exact, same derivation
  * as ScaleProbe) — and wall-clocks q88/q85/q90 across sf0.1 → sf1 →
  * sf10, printing the per-decade exponent. A healthy one-exchange
  * shape shows the second decade's exponent RISING TOWARD 1.0 (linear
  * in bytes is the design floor for full-corpus passes) but never
  * above it.
  *
  * `sbt "runMain graft.tools.DeepScaleProbe [sf0.1dir] [outBase]"` —
  * slices land under target/, never under /root/testdata.
  */
object DeepScaleProbe {

  val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q88_duplicate_spans" -> ((s, d) => SparkEntry.queries("q88_duplicate_spans")(s, d)),
    "q85_source_overlap" -> ((s, d) => SparkEntry.queries("q85_source_overlap")(s, d)),
    "q90_dup_span_stats" -> ((s, d) => SparkEntry.queries("q90_dup_span_stats")(s, d)),
    // the round-18 reshaped LSH path, FORCED at every SF (the cost-based
    // switch would take the brute path at sf0.1's 2k vectors and make
    // the exponent meaningless)
    "q50_lsh_path" -> ((s, d) =>
      graft.ops.Similarity.cosineNearDupPairs(
        s.read.parquet(s"$d/embeddings.parquet"), "vec_id", "embedding", 0.8,
        bruteForceMax = 0)))

  def main(args: Array[String]): Unit = {
    val sf01 = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outBase = if (args.length > 1) args(1) else "target/deepscale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val idStride = docs.agg(max("doc_id")).head.getLong(0) + 1
    def derive(replicas: Int, outDir: String): Unit = {
      val big = (0 until replicas).map { r =>
        docs.select(
          (col("doc_id") + lit(r * idStride)).as("doc_id"),
          (if (r == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", s"r${r}x$$1")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
      big.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      println(s"[deep] wrote ${spark.read.parquet(s"$outDir/documents.parquet").count()} docs to $outDir")
    }
    derive(10, s"$outBase/sf1")
    derive(100, s"$outBase/sf10")

    // embeddings scale under the ScaleProbe replica-wide xxhash64-parity
    // sign pattern: within-replica cosine structure exact (a common sign
    // flip cancels in the dot product), every replica's pattern distinct
    // (no cross-replica clones)
    val emb = spark.read.parquet(s"$sf01/embeddings.parquet")
    val vecStride = emb.agg(max("vec_id")).head.getLong(0) + 1
    def deriveEmb(replicas: Int, outDir: String): Unit = {
      val big = (0 until replicas).map { r =>
        emb.select(
          (col("vec_id") + lit(r * vecStride)).as("vec_id"),
          (if (r == 0) col("embedding")
           else zip_with(col("embedding"),
             transform(sequence(lit(0), size(col("embedding")) - 1),
               i => when(pmod(xxhash64(i, lit(r)), lit(2)) === 0, lit(-1.0f)).otherwise(lit(1.0f))),
             (v, sgn) => v * sgn)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
      big.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[deep] wrote ${spark.read.parquet(s"$outDir/embeddings.parquet").count()} vectors to $outDir")
    }
    deriveEmb(10, s"$outBase/sf1")
    deriveEmb(100, s"$outBase/sf10")

    def best(fn: (SparkSession, String) => DataFrame, dir: String, reps: Int): (Double, Long) =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    probes.foreach { case (q, fn) =>
      best(fn, sf01, reps = 1) // warm codegen/JIT
      val (t01, n01) = best(fn, sf01, reps = 3)
      val (t1, n1) = best(fn, s"$outBase/sf1", reps = 3)
      val (t10, n10) = best(fn, s"$outBase/sf10", reps = 2)
      val e1 = math.log10(t1 / t01)
      val e2 = math.log10(t10 / t1)
      println(f"[deep] $q%-22s sf0.1=$t01%6.2fs($n01) sf1=$t1%7.2fs($n1) sf10=$t10%8.2fs($n10) " +
        f"exp(0.1->1)=$e1%.2f exp(1->10)=$e2%.2f")
    }
    spark.stop()
  }
}
