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
    // the exponent meaningless). Two thresholds: 0.8 is the q50 oracle
    // setting — holding its recall contract on a random corpus is
    // expensive BY DESIGN (84 bands at 200k rows); 0.95 is the
    // operator's documented near-dup regime, where auto-tuned banding
    // stays at the group minimum.
    "q50_lsh_t0.8" -> ((s, d) =>
      graft.ops.Similarity.cosineNearDupPairs(
        s.read.parquet(s"$d/embeddings.parquet"), "vec_id", "embedding", 0.8,
        bruteForceMax = 0)),
    "q50_lsh_t0.95" -> ((s, d) =>
      graft.ops.Similarity.cosineNearDupPairs(
        s.read.parquet(s"$d/embeddings.parquet"), "vec_id", "embedding", 0.95,
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

    // derivation is deterministic — reuse a slice already on disk (a
    // re-probe after a code change should not pay the 100x rewrite),
    // but ONLY when a marker proves it was derived from THIS input with
    // THIS derivation (a stale slice from another corpus or an older
    // ProbeData would make per-decade exponents cross-corpus garbage)
    def marker(dir: String, t: String, replicas: Int): java.nio.file.Path =
      java.nio.file.Paths.get(dir, s"_probe_meta_$t.txt")
    def markerContent(t: String, replicas: Int): String =
      s"src=$sf01 table=$t replicas=$replicas derivation=${ProbeData.DerivationVersion}"
    def fresh(dir: String, t: String, replicas: Int): Boolean =
      scala.util.Try(java.nio.file.Files.readString(marker(dir, t, replicas)) == markerContent(t, replicas)
        && spark.read.parquet(s"$dir/$t.parquet").head(1).nonEmpty).getOrElse(false)
    def ensure(dir: String, t: String, replicas: Int)(derive: => Unit): Unit =
      if (fresh(dir, t, replicas)) println(s"[deep] reusing $dir/$t.parquet (marker matches)")
      else {
        derive
        java.nio.file.Files.writeString(marker(dir, t, replicas), markerContent(t, replicas))
      }
    ensure(s"$outBase/sf1", "documents", 10)(ProbeData.replicateDocs(spark, sf01, 10, s"$outBase/sf1"))
    ensure(s"$outBase/sf10", "documents", 100)(ProbeData.replicateDocs(spark, sf01, 100, s"$outBase/sf10"))
    ensure(s"$outBase/sf1", "embeddings", 10)(ProbeData.replicateEmbeddings(spark, sf01, 10, s"$outBase/sf1"))
    ensure(s"$outBase/sf10", "embeddings", 100)(ProbeData.replicateEmbeddings(spark, sf01, 100, s"$outBase/sf10"))

    def best(fn: (SparkSession, String) => DataFrame, dir: String, reps: Int): (Double, Long) =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    // optional third arg: comma-separated probe names (iteration aid)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").map(_.trim).toSet)
    probes.filter(p => only.forall(_.contains(p._1))).foreach { case (q, fn) =>
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
