package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second/third-decade scale probe (VERDICT r17 #8, r18 #3): the
  * round-17 10x probe measured its two steepest exponents on q88
  * (0.54) and q85 (0.54), where fixed overhead still dominates the
  * sf0.1 wall and could mask a super-linear term. This probe derives
  * FURTHER DECADES — sf1/sf10 slices (10/100 token-prefixed replicas
  * of sf0.1; replicas share no shingles, within-replica structure
  * exact, same derivation as ScaleProbe), plus an sf100 slice (1000
  * replicas, ~5M docs) for the DOCUMENT probes whose sf1→sf10
  * exponents were still rising (q88 0.75, q85 0.68) — and wall-clocks
  * each probe across its decades, printing per-decade exponents. A
  * healthy one-exchange shape shows exponents RISING TOWARD 1.0
  * (linear in bytes is the design floor for full-corpus passes) but
  * never above it. The embedding probes stay at two decades: at 2M
  * vectors the threshold-0.8 recall contract costs hours by design
  * (the s-curve price, documented in SCALE.md), which measures the
  * contract, not the plan.
  *
  * `sbt "runMain graft.tools.DeepScaleProbe [sf0.1dir] [outBase]
  * [probe,probe,...]"` — slices land under target/, never under
  * /root/testdata.
  */
object DeepScaleProbe {

  /** Document probes that run the sf100 third decade. */
  val thirdDecade: Set[String] =
    Set("q88_duplicate_spans", "q85_source_overlap", "q90_dup_span_stats",
      "q88_hash_path", "q90_hash_path", "incremental_probe")

  /** Shuffle partitions per decade — the design contract's "size
    * partitions so reducers fit executor memory" rule made executable.
    * The span exchange carries ~70 B x ~100 spans/doc, so targeting
    * <=128 MB per reducer AND several task waves per core for straggler
    * smoothing: sf0.1/sf1 keep the committed 32; sf10 (~3.5 GB span
    * exchange) gets 128 (~27 MB/reducer, 4 waves — at 32 its single
    * wave of ~110 MB tasks straggled, walls swung 6–31 s across runs);
    * sf100 (~35 GB) gets 512. The first third-decade run held 32 FIXED
    * with an 8 g heap and measured exp(10->100)=1.23 on q88 plus a q90
    * OOM — reducer-memory exhaustion (1.1 GB/reducer against ~150 MB of
    * task execution memory), i.e. the mis-sizing the rule exists to
    * prevent, not an algorithmic term. A 1000-executor cluster at this
    * corpus size would run tens of thousands of shuffle partitions; AQE
    * coalesces the small stages back down, so the higher setting does
    * not distort the cheap stages. Run the third decade with
    * SPARK_DRIVER_MEM=32g (1 GB/core — a realistic executor shape; the
    * default 8 g is ~250 MB/core, well under any production sizing).
    */
  def shufflePartitionsFor(dir: String): Int =
    if (dir.endsWith("/sf100")) 512 else if (dir.endsWith("/sf10")) 128 else 32

  val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q88_duplicate_spans" -> ((s, d) => SparkEntry.queries("q88_duplicate_spans")(s, d)),
    "q85_source_overlap" -> ((s, d) => SparkEntry.queries("q85_source_overlap")(s, d)),
    "q90_dup_span_stats" -> ((s, d) => SparkEntry.queries("q90_dup_span_stats")(s, d)),
    // the 100 TB routes of q88/q90: hashSpans=true keys the exchange on
    // the 64-bit gram hash (~8 B) instead of the literal ~65 B span
    // string — the oracle paths above exist for DuckDB string parity,
    // the hash paths are what a production pipeline runs (TextOpsSpec
    // pins them equal). Probing both separates "the algorithm scales"
    // from "the oracle's string shuffle scales".
    "q88_hash_path" -> ((s, d) =>
      graft.ops.Dedup.duplicateSpans(
        s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
        n = 10, minDocs = 2, hashSpans = true,
        repartitionTo = Some(s.sparkContext.defaultParallelism))),
    "q90_hash_path" -> ((s, d) =>
      graft.ops.Dedup.dupSpanStats(
        s.read.parquet(s"$d/documents.parquet"), "doc_id", "text",
        n = 10, minDocs = 2, hashSpans = true,
        repartitionTo = Some(s.sparkContext.defaultParallelism))),
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
        bruteForceMax = 0)),
    // Day-2 incremental probe at three decades of HISTORY growth with a
    // FIXED batch (base-replica ids only; replicas share no shingles,
    // so collided volume is constant and the growth term is the index
    // scan alone — the ScaleProbe row, two decades further). The
    // persisted index builds as a side effect of the FIRST rep per dir
    // (memo below); min-of-reps discards that build rep. As in
    // ScaleProbe, the batch's signature lineage is operator-cached
    // after the first rep, so the reported wall is the probe (incl.
    // the history-index scan) with warm batch sigs — exact for the
    // exponent, understates the constant per-day batch-sig cost.
    "incremental_probe" -> incrementalProbeFn)

  private val incIdxBuilt = scala.collection.mutable.Set[String]()
  private var incBaseMax: Option[Long] = None
  /** Base-corpus dir for the fixed-batch id split; main() sets it from
    * args(0) so a custom sf0.1 dir splits against the right corpus
    * (review r19 — a hard-coded default silently mis-split). */
  private[tools] var incBaseDir: String = "/root/testdata/sf0.1"
  private def incrementalProbeFn: (SparkSession, String) => DataFrame = (s, d) => {
    val baseMax = incBaseMax.getOrElse {
      val m = s.read.parquet(s"$incBaseDir/documents.parquet")
        .agg(max("doc_id")).head.getLong(0)
      incBaseMax = Some(m); m
    }
    val docs = s.read.parquet(s"$d/documents.parquet")
    val isBatch = col("doc_id") % 31 === 0 && col("doc_id") <= baseMax
    val idx = "target/deepscale_inc_idx/" + d.replaceAll("[^A-Za-z0-9]", "_")
    if (!incIdxBuilt.contains(d)) {
      graft.ops.Dedup.withMinhashSignature(
          docs.filter(!isBatch).select(col("doc_id"), col("text")), "text", "sig",
          shingleN = 3, k = 64, repartitionTo = Some(s.sparkContext.defaultParallelism))
        .select(col("doc_id"), col("sig"))
        .write.mode("overwrite").parquet(idx)
      incIdxBuilt += d
    }
    val batchSigs = graft.ops.Dedup.withMinhashSignature(
      docs.filter(isBatch).select(col("doc_id"), col("text")), "text", "sig",
      shingleN = 3, k = 64).select(col("doc_id"), col("sig"))
    graft.ops.Dedup.incrementalNearDupPairs(batchSigs, "doc_id", "sig",
      s.read.parquet(idx), "doc_id", "sig", bands = 16, threshold = 0.5)
  }

  def main(args: Array[String]): Unit = {
    val sf01 = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    incBaseDir = sf01
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
    // optional third arg: comma-separated probe names (iteration aid)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val selected = probes.filter(p => only.forall(_.contains(p._1)))

    // derive only the slices the selected probes will read — the sf100
    // documents slice is a 5M-row write nobody iterating on the
    // embedding probes should pay
    if (selected.exists(p => !p._1.startsWith("q50"))) {
      ensure(s"$outBase/sf1", "documents", 10)(ProbeData.replicateDocs(spark, sf01, 10, s"$outBase/sf1"))
      ensure(s"$outBase/sf10", "documents", 100)(ProbeData.replicateDocs(spark, sf01, 100, s"$outBase/sf10"))
    }
    if (selected.exists(p => thirdDecade(p._1)))
      ensure(s"$outBase/sf100", "documents", 1000)(ProbeData.replicateDocs(spark, sf01, 1000, s"$outBase/sf100"))
    if (selected.exists(p => p._1.startsWith("q50"))) {
      ensure(s"$outBase/sf1", "embeddings", 10)(ProbeData.replicateEmbeddings(spark, sf01, 10, s"$outBase/sf1"))
      ensure(s"$outBase/sf10", "embeddings", 100)(ProbeData.replicateEmbeddings(spark, sf01, 100, s"$outBase/sf10"))
    }

    def best(fn: (SparkSession, String) => DataFrame, dir: String, reps: Int): (Double, Long) =
      (1 to reps).map { _ =>
        spark.conf.set("spark.sql.shuffle.partitions", shufflePartitionsFor(dir))
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)

    selected.foreach { case (q, fn) =>
      best(fn, sf01, reps = 1) // warm codegen/JIT
      val (t01, n01) = best(fn, sf01, reps = 3)
      val (t1, n1) = best(fn, s"$outBase/sf1", reps = 3)
      val (t10, n10) = best(fn, s"$outBase/sf10", reps = 2)
      val e1 = math.log10(t1 / t01)
      val e2 = math.log10(t10 / t1)
      val third = if (thirdDecade(q)) {
        val (t100, n100) = best(fn, s"$outBase/sf100", reps = 2)
        f" sf100=$t100%8.2fs($n100) exp(10->100)=${math.log10(t100 / t10)}%.2f"
      } else ""
      println(f"[deep] $q%-22s sf0.1=$t01%6.2fs($n01) sf1=$t1%7.2fs($n1) sf10=$t10%8.2fs($n10) " +
        f"exp(0.1->1)=$e1%.2f exp(1->10)=$e2%.2f" + third)
    }
    spark.stop()
  }
}
