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

      // the index now carries history + every doc the HISTORY probe
      // kept — including 13, the in-batch dup the output dropped: the
      // index represents content seen, the output content kept (the
      // ADVICE-r19 transitive-replay fix). 10 and 20 matched
      // history/advanced-index, so they never enter.
      val idxIds = spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 11L, 12L, 13L, 21L))

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

  test("transitive within-batch clusters replay as a no-op (every kept doc is indexed)") {
    // Chain A–B–C: sim(A,B) and sim(B,C) clear the threshold, sim(A,C)
    // does NOT. Connected components keeps only A in the output, but
    // ALL THREE signatures must enter the index — if only the canonical
    // survivor A were indexed (the pre-r20 behavior), a replayed C
    // would match nothing (its direct similarity to A is below
    // threshold) and resurface as NEW output the first attempt dropped
    // (ADVICE r19 medium).
    val a16 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa"
    val docA = s"$a16 quebec romeo sierra tango"
    val docB = s"$a16 uniform victor whiskey xray"
    val docC = "zulu yankee xeno willow " +
      a16.split(" ").drop(4).mkString(" ") + " uniform victor whiskey xray"
    val thr = 0.5

    // self-validate the chain shape under the STREAM's own recipe:
    // A–B and B–C at or above the threshold, A–C strictly below
    val chain = Seq((30L, docA), (31L, docB), (32L, docC)).toDF("doc_id", "text")
    val est = graft.ops.Dedup.minhashNearDupPairs(chain, "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((30L, 31L)) >= thr && est((31L, 32L)) >= thr,
      s"test corpus must chain A-B-C above $thr, got $est")
    assert(est.get((30L, 32L)).forall(_ < thr),
      s"A-C must sit BELOW $thr for the chain to be transitive, got $est")

    val dir = java.nio.file.Files.createTempDirectory("graft_inc_chain").toFile
    try {
      val idxPath = new java.io.File(dir, "index").getAbsolutePath
      val outPath = new java.io.File(dir, "out").getAbsolutePath
      val history = Seq((1L, "unrelated seed content about parquet footers and row groups"))
        .toDF("doc_id", "text")
      graft.ops.Dedup.writeSignatureIndex(history, "doc_id", "text", idxPath,
        shingleN = 3, k = 64)

      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      ms.addData((30L, docA), (31L, docB), (32L, docC))
      val q = StreamOps.incrementalDedupStream(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxPath, outPath, new java.io.File(dir, "ck").getAbsolutePath,
        shingleN = 3, k = 64, bands = 16, threshold = thr)
      q.processAllAvailable()
      q.stop()
      val out1 = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(30L), s"the chain must collapse to its canonical doc, got $out1")
      val idxIds = spark.read.parquet(idxPath).select("doc_id").as[Long].collect().toSet
      assert(idxIds == Set(1L, 30L, 31L, 32L),
        s"ALL history-probe survivors must be indexed, not just canonical ones, got $idxIds")

      // the post-index-append replay window: a fresh checkpoint replays
      // the whole batch — C must self-match instead of resurfacing
      val ms2 = MemoryStream[(Long, String)]
      ms2.addData((30L, docA), (31L, docB), (32L, docC))
      val q2 = StreamOps.incrementalDedupStream(
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxPath, outPath, new java.io.File(dir, "ck2").getAbsolutePath,
        shingleN = 3, k = 64, bands = 16, threshold = thr)
      q2.processAllAvailable()
      q2.stop()
      val out2 = spark.read.parquet(outPath).select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(30L),
        s"a replayed transitive cluster must land ZERO new output rows, got $out2")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("exactly-once Delta stream: every crash window lands ZERO duplicate output rows") {
    import graft.readers.{DeltaReader, DeltaWriter}
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_delta").toFile
    try {
      val idxPath = new java.io.File(dir, "idx_delta").getAbsolutePath
      val outPath = new java.io.File(dir, "out_delta").getAbsolutePath
      val ckPath = new java.io.File(dir, "ck").getAbsolutePath
      val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      // seed the index as a native Delta table + adopt its recipe
      DeltaWriter.write(spark,
        graft.ops.Dedup.withMinhashSignature(history, "text", "sig", shingleN = 3, k = 64)
          .select(col("doc_id"), col("sig")),
        idxPath)
      graft.ops.Dedup.adoptSignatureIndexRecipe(idxPath,
        graft.ops.Dedup.SignatureIndexRecipe("doc_id", 3, 64, 42L))

      val batch1 = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of hist 1
        (11L, "unique content about lakehouse table formats and manifests"),
        (12L, "shared boilerplate sentence repeated across this increment x"),
        (13L, "shared boilerplate sentence repeated across this increment x"))
      implicit val ctx = spark.sqlContext
      val ms = MemoryStream[(Long, String)]
      ms.addData(batch1: _*)
      val q = StreamOps.incrementalDedupStreamDelta(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxPath, outPath, ckPath, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      q.processAllAvailable()
      q.stop()
      def ids(path: String): Set[Long] =
        DeltaReader.read(spark, path).select("doc_id").as[Long].collect().toSet
      assert(ids(outPath) == Set(11L, 12L))
      assert(ids(idxPath) == Set(1L, 11L, 12L, 13L),
        "the Delta index must advance with every history-probe survivor")

      // FULL manual replay of the committed batch (the DeltaStreamProvider
      // mold): both txn markers are present, so both writes are no-ops —
      // row COUNTS unchanged, not just id sets
      val batchDf = batch1.toDF("doc_id", "text")
      val (outRows, idxRows) =
        (DeltaReader.read(spark, outPath).count(), DeltaReader.read(spark, idxPath).count())
      StreamOps.incrementalDedupDeltaBatch(batchDf, 0L, "doc_id", "text",
        idxPath, outPath, ckPath, 3, 64, 16, 0.8, 42L, 1000)
      assert(DeltaReader.read(spark, outPath).count() == outRows,
        "a fully-committed batch's replay must write NOTHING to the output")
      assert(DeltaReader.read(spark, idxPath).count() == idxRows,
        "...and NOTHING to the index (no replay inflation, no compaction debt)")

      // CRASH WINDOW: output committed, index not (the window the parquet
      // path duplicates in). Fresh tables; the output txn for batch 0 is
      // already on the out table; the worker must skip the output write,
      // recompute off the unchanged index, and land only the index rows.
      val idx2 = new java.io.File(dir, "idx2_delta").getAbsolutePath
      val out2 = new java.io.File(dir, "out2_delta").getAbsolutePath
      val app2 = "crash-window-app"
      DeltaWriter.write(spark,
        graft.ops.Dedup.withMinhashSignature(history, "text", "sig", shingleN = 3, k = 64)
          .select(col("doc_id"), col("sig")),
        idx2)
      DeltaWriter.write(spark, batchDf.filter(col("doc_id").isin(11L, 12L)), out2,
        txn = Some(app2 -> 0L)) // the first attempt's output commit
      StreamOps.incrementalDedupDeltaBatch(batchDf, 0L, "doc_id", "text",
        idx2, out2, app2, 3, 64, 16, 0.8, 42L, 1000)
      assert(ids(out2) == Set(11L, 12L) && DeltaReader.read(spark, out2).count() == 2,
        "the post-output-commit replay must land ZERO duplicate output rows")
      assert(ids(idx2) == Set(1L, 11L, 12L, 13L),
        "...while still landing the index append the crash skipped")

      // the RESUMED stream (same checkpoint, same appId) keeps advancing
      ms.addData(
        (20L, "unique content about lakehouse table formats and manifests"), // dup of survivor 11
        (21L, "fresh material never seen in any earlier batch of the stream"))
      val q2 = StreamOps.incrementalDedupStreamDelta(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxPath, outPath, ckPath, shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      q2.processAllAvailable()
      q2.stop()
      assert(ids(outPath) == Set(11L, 12L, 21L))
      assert(ids(idxPath) == Set(1L, 11L, 12L, 13L, 21L))

      // a mismatched index recipe refuses at stream START, same as the
      // parquet wrapper
      val e = intercept[IllegalArgumentException] {
        StreamOps.incrementalDedupStreamDelta(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
          idxPath, outPath, ckPath, shingleN = 3, k = 32, bands = 16, threshold = 0.8)
      }
      assert(e.getMessage.contains("recipe mismatch"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
