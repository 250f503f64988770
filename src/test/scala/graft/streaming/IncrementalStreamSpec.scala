package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous-ingestion dedup: incrementalDedupStream dedupes each
  * micro-batch against the persisted signature index AND advances the
  * index with the survivors, so a later micro-batch's duplicate of an
  * earlier batch's survivor is dropped — the property that
  * distinguishes an advancing index from a frozen one.
  */
class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches dedup against history and against earlier batches' survivors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_stream").toFile
    try {
      val idxPath = new java.io.File(dir, "index").getAbsolutePath
      val outPath = new java.io.File(dir, "out").getAbsolutePath
      val ckPath = new java.io.File(dir, "ck").getAbsolutePath
      // seed the index from the historical corpus (the index format:
      // same shingleN/k/seed as the stream arguments below)
      val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      graft.ops.Dedup.withMinhashSignature(history, "text", "sig", shingleN = 3, k = 64)
        .select(col("doc_id"), col("sig"))
        .write.parquet(idxPath)

      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      def runAvailable(): Unit = {
        val q = StreamOps.incrementalDedupStream(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
          idxPath, outPath, ckPath, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
        q.processAllAvailable()
        q.stop()
      }

      // batch 1: a dup of history doc 1, a unique doc, an in-batch dup pair
      ms.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of hist 1
        (11L, "unique content about lakehouse table formats and manifests"),
        (12L, "shared boilerplate sentence repeated across this increment x"),
        (13L, "shared boilerplate sentence repeated across this increment x"))
      runAvailable()
      val after1 = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(11L, 12L),
        s"batch 1: history dup 10 and in-batch dup 13 must drop, got $after1")

      // batch 2: a dup of batch 1's SURVIVOR 11 (only droppable if the
      // index advanced), plus a genuinely new doc
      ms.addData(
        (20L, "unique content about lakehouse table formats and manifests"), // dup of survivor 11
        (21L, "fresh material never seen in any earlier batch of the stream"))
      runAvailable()
      val after2 = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(11L, 12L, 21L),
        s"batch 2: the dup of survivor 11 must drop against the ADVANCED index, got $after2")

      // the index now carries history + both batches' survivors
      val idxIds = spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 11L, 12L, 21L))

      // replay convergence (the documented at-least-once contract's
      // post-index-append window): re-processing the SAME rows against
      // the already-advanced index — a fresh checkpoint replays both
      // batches — finds every doc's own signature in the index, so
      // survivors come back empty and both writes are no-ops. The
      // output must be UNCHANGED: duplicates possible in the
      // pre-index-append window, loss never.
      val ck2 = new java.io.File(dir, "ck_replay").getAbsolutePath
      val ms2 = MemoryStream[(Long, String)]
      ms2.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11L, "unique content about lakehouse table formats and manifests"),
        (12L, "shared boilerplate sentence repeated across this increment x"),
        (13L, "shared boilerplate sentence repeated across this increment x"),
        (20L, "unique content about lakehouse table formats and manifests"),
        (21L, "fresh material never seen in any earlier batch of the stream"))
      val q2 = StreamOps.incrementalDedupStream(
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxPath, outPath, ck2, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      q2.processAllAvailable()
      q2.stop()
      val afterReplay = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
      assert(afterReplay == Set(11L, 12L, 21L),
        s"a replayed batch must converge to a no-op against the advanced index, got $afterReplay")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
