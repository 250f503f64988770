package graft.queries

import java.util.concurrent.Executors

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.DataFrame

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Bench submits 16 queries concurrently against one session, but the
  * correctness gate (Verify) runs serially — a concurrency bug in the
  * shared mutable state (the portable-signature FIFO cache, per-query
  * localCheckpoints, broadcast thresholds) would corrupt bench results
  * invisibly. This spec runs the cache/checkpoint-touching queries in
  * overlapping triplicate and requires every result to equal its
  * serial run row-for-row.
  */
class ConcurrentResultSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the queries whose implementations share state across invocations:
  // q78/q42 (portable/xxhash sig caches), q63/q76 (CC checkpoints +
  // driver union-find), q51/q86 (LSH bucket joins), q92 (broadcast
  // thresholds), q90 (span checkpoint)
  private val names = Seq(
    "q42_minhash_lsh", "q78_minhash_portable", "q63_neardup_clusters",
    "q76_cc_exact", "q51_lsh_knn", "q86_lsh_knn_portable",
    "q90_dup_span_stats", "q92_temperature_threshold",
    // r19 incremental probes: exercise the shared signature-cache FIFO
    // (cacheSigs) from the text and cosine entry points under overlap
    "q95_incremental_portable", "q97_incremental_cosine_portable",
    // r20 cluster maintenance: three LSH passes + CC checkpoints (q98)
    // and the exact-Jaccard + dual-CC assignment (q99) under overlap
    "q98_incremental_clusters", "q99_incremental_clusters_portable")

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map {
        case d: Double => f"$d%.6f"
        case f: Float  => f"$f%.4f"
        case v         => String.valueOf(v)
      }.mkString("|")).toSeq.sorted
  }

  test("concurrent triplicate runs equal the serial result row-for-row") {
    val serial = names.map(n => n -> canon(SparkEntry.queries(n)(spark, dir))).toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = for (rep <- 1 to 3; n <- names) yield Future {
        (n, rep, canon(SparkEntry.queries(n)(spark, dir)))
      }
      val results = Await.result(Future.sequence(futures), 15.minutes)
      results.foreach { case (n, rep, rows) =>
        assert(rows == serial(n),
          s"$n rep $rep diverged under concurrency: ${rows.size} rows vs serial ${serial(n).size}")
      }
    } finally pool.shutdown()
  }
}
