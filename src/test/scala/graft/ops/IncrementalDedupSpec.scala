package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental dedup (round 19): a new batch probed against a persisted
  * history signature index. Correctness is pinned by PARITY with the
  * batch self-join path — the crossing subset of
  * [[Dedup.minhashNearDupPairs]] over the union corpus must equal the
  * incremental probe's output under the same signature recipe — plus
  * explicit end-to-end, skew-bound, and plan-shape contracts.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // planted near-dup structure crossing any split: doc i shares its
  // template with all docs of i % 4, and templates differ strongly
  private def corpus(n: Int): DataFrame = {
    val templates = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "spark engines shuffle partitioned data across executor nodes under load",
      "training corpora require careful deduplication before any model sees them",
      "completely unrelated prose about cooking pasta with garlic and olive oil")
    Seq.tabulate(n)(i => (i.toLong, s"${templates(i % 4)} tail token $i"))
      .toDF("doc_id", "text")
  }

  private def sigsOf(df: DataFrame, k: Int = 32): DataFrame =
    Dedup.withMinhashSignature(df.select(col("doc_id"), col("text")), "text", "sig",
      shingleN = 3, k = k)
      .select(col("doc_id"), col("sig"))

  test("incremental pairs equal the crossing subset of the union self-join (xxhash path)") {
    val docs = corpus(40)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = Dedup.incrementalNearDupPairs(
      sigsOf(batch), "doc_id", "sig", sigsOf(history), "doc_id", "sig",
      bands = 8, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (n, h, j) => (math.min(n, h), math.max(n, h)) -> j }.toMap
    val union = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 8, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) } // crossing pairs only
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(inc.nonEmpty, "planted cross-split near-dups must be found")
    assert(inc == union,
      s"incremental probe must match the union self-join's crossing subset:\n" +
        s"inc-only=${inc.keySet -- union.keySet}\nunion-only=${union.keySet -- inc.keySet}")
  }

  test("portable incremental pairs equal the portable union self-join's crossing subset") {
    val docs = corpus(30)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = Dedup.incrementalNearDupPairsPortable(
      batch, history, "doc_id", "text", shingleN = 3, k = 16, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (n, h, j) => (math.min(n, h), math.max(n, h)) -> j }.toMap
    val union = Dedup.minhashNearDupPairsPortable(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) }
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(inc.nonEmpty && inc == union)
  }

  test("fuzz: incremental equals the union crossing subset on 200 adversarial strings") {
    // the FuzzParitySpec atom mix: whitespace runs, non-\s unicode
    // spaces, multibyte chars, surrogate pairs, punctuation clusters,
    // empties, and one null — blank-only docs all hash to the same
    // zero signature, so the probe's degenerate-clique handling is
    // exercised alongside the parity
    val rnd = new scala.util.Random(20260816L)
    val atoms: IndexedSeq[String] = IndexedSeq(
      "a", "b", "the", "Fox", "JUMPS", "x9", "42",
      " ", "  ", "\t", "\n", "\r", "\f", "", "\r\n", " ", "　",
      "é", "ü", "北", "🎉", "𝕊",
      ".", ",", "!", "?", "{", "}", "@", "\\", "\"",
      "...", "!!!", "a.b", "e@x.io")
    val docs = (0 until 200).map { i =>
      val n = rnd.nextInt(20)
      val t = if (i == 199) null else (1 to n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDupPairs(
      sigsOf(docs.filter(col("doc_id") % 3 === 0), k = 16), "doc_id", "sig",
      sigsOf(docs.filter(col("doc_id") % 3 =!= 0), k = 16), "doc_id", "sig",
      bands = 4, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .map { case (n, h, j) => (math.min(n, h), math.max(n, h)) -> j }.toMap
    val union = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) }
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(inc.nonEmpty, "blank-only docs alone guarantee cross-split collisions")
    assert(inc == union,
      s"adversarial parity broke:\ninc-only=${inc.keySet -- union.keySet}\n" +
        s"union-only=${union.keySet -- inc.keySet}")
  }

  test("pair direction: new_id comes from the batch, hist_id from history") {
    val docs = corpus(20)
    val out = Dedup.incrementalNearDupPairs(
      sigsOf(docs.filter(col("doc_id") % 3 === 0)), "doc_id", "sig",
      sigsOf(docs.filter(col("doc_id") % 3 =!= 0)), "doc_id", "sig",
      bands = 8, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (n, h, _) => n % 3 == 0 && h % 3 != 0 })
  }

  test("incrementalDedup drops history matches, then near-dup-dedups the survivors") {
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of hist 1
      (11L, "unique content about lakehouse table formats and manifests"),
      (12L, "shared boilerplate sentence repeated across this increment x"),
      (13L, "shared boilerplate sentence repeated across this increment x") // dup of 12
    ).toDF("doc_id", "text")
    val survivors = Dedup.incrementalDedup(
      batch, "doc_id", "text", sigsOf(history, k = 64), "doc_id", "sig",
      shingleN = 3, k = 64, bands = 16, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(11L, 12L),
      s"expected history match 10 and within-batch dup 13 dropped, got $survivors")
    // withinBatch=false keeps the in-batch clique intact
    val noWithin = Dedup.incrementalDedup(
      batch, "doc_id", "text", sigsOf(history, k = 64), "doc_id", "sig",
      shingleN = 3, k = 64, bands = 16, threshold = 0.8, withinBatch = false)
      .select("doc_id").as[Long].collect().toSet
    assert(noWithin == Set(11L, 12L, 13L))
  }

  test("incrementalDedup probes with the index's seed (seed is part of the index format)") {
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val idx7 = Dedup.withMinhashSignature(history, "text", "sig", shingleN = 3, k = 64, seed = 7L)
      .select(col("doc_id"), col("sig"))
    val matched = Dedup.incrementalDedup(batch, "doc_id", "text", idx7, "doc_id", "sig",
      threshold = 0.8, seed = 7L).select("doc_id").as[Long].collect()
    assert(matched.isEmpty, "the exact dup must drop when the probe seed matches the index")
    // a mismatched recipe silently matches nothing — the documented
    // failure mode the seed parameter exists to avoid (review r19)
    val mismatched = Dedup.incrementalDedup(batch, "doc_id", "text", idx7, "doc_id", "sig",
      threshold = 0.8).select("doc_id").as[Long].collect()
    assert(mismatched.toSeq == Seq(10L))
  }

  test("signature index is self-describing: recipe round-trips, mismatched probes refuse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sig_idx").toFile
    try {
      val path = new java.io.File(dir, "idx").getAbsolutePath
      val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      val recipe = Dedup.writeSignatureIndex(history, "doc_id", "text", path,
        shingleN = 3, k = 32, seed = 7L)
      assert(Dedup.readIndexRecipe(path).contains(recipe))
      val batch = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of hist 1
        (11L, "unique content about lakehouse table formats and manifests")
      ).toDF("doc_id", "text")
      // probing with the index's recipe drops the dup
      val kept = Dedup.incrementalDedupAgainstIndex(batch, "doc_id", "text", path,
        threshold = 0.8, shingleN = 3, k = 32, seed = 7L)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(11L))
      // a mismatched recipe is a LOUD refusal, not silent zero recall
      val e = intercept[IllegalArgumentException] {
        Dedup.incrementalDedupAgainstIndex(batch, "doc_id", "text", path,
          threshold = 0.8, shingleN = 3, k = 32, seed = 42L)
      }
      assert(e.getMessage.contains("recipe mismatch"))
      intercept[IllegalArgumentException] {
        Dedup.appendToSignatureIndex(batch, "doc_id", "text", path,
          shingleN = 2, k = 32, seed = 7L)
      }
      // appends must also match the index's ID COLUMN (divergent
      // parquet schemas read back as nulls) — and the parallel
      // writeSignatureIndex(mode="append") path validates identically
      // instead of clobbering the sidecar with a new recipe
      intercept[IllegalArgumentException] {
        Dedup.appendToSignatureIndex(batch.withColumnRenamed("doc_id", "id"),
          "id", "text", path, shingleN = 3, k = 32, seed = 7L)
      }
      intercept[IllegalArgumentException] {
        Dedup.writeSignatureIndex(batch, "doc_id", "text", path,
          shingleN = 3, k = 32, seed = 42L, mode = "append")
      }
      assert(Dedup.readIndexRecipe(path).contains(recipe),
        "a refused append must not have touched the sidecar")
      // bootstrap shape: an EMPTY index (day zero) keeps every batch
      // doc and still round-trips its recipe
      val emptyPath = new java.io.File(dir, "empty_idx").getAbsolutePath
      Dedup.writeSignatureIndex(history.filter(lit(false)), "doc_id", "text", emptyPath,
        shingleN = 3, k = 32, seed = 7L)
      assert(Dedup.readIndexRecipe(emptyPath).contains(recipe))
      val keptAll = Dedup.incrementalDedupAgainstIndex(batch, "doc_id", "text", emptyPath,
        threshold = 0.8, shingleN = 3, k = 32, seed = 7L)
        .select("doc_id").as[Long].collect().toSet
      assert(keptAll == Set(10L, 11L), s"an empty index must keep the whole batch, got $keptAll")

      // advancing under the right recipe makes the survivor visible
      Dedup.appendToSignatureIndex(
        batch.filter(col("doc_id") === 11L), "doc_id", "text", path,
        shingleN = 3, k = 32, seed = 7L)
      val kept2 = Dedup.incrementalDedupAgainstIndex(
        Seq((20L, "unique content about lakehouse table formats and manifests"))
          .toDF("doc_id", "text"),
        "doc_id", "text", path, threshold = 0.8, shingleN = 3, k = 32, seed = 7L)
      assert(kept2.count() == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("append onto a LEGACY index never stamps the caller's recipe (ADVICE r19)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sig_legacy").toFile
    try {
      // a bare pre-sidecar index: (id, sig) parquet with data, no recipe
      val legacy = new java.io.File(dir, "legacy_idx").getAbsolutePath
      val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text")
      sigsOf(history, k = 32).write.parquet(legacy)
      assert(Dedup.readIndexRecipe(legacy).isEmpty)
      val batch = Seq((11L, "unique content about lakehouse table formats and manifests"))
        .toDF("doc_id", "text")
      // appending must succeed but leave the index UNVALIDATED: stamping
      // the caller's recipe would bless the legacy rows' unknown recipe
      // and later probes would validate green over silent zero recall
      Dedup.writeSignatureIndex(batch, "doc_id", "text", legacy,
        shingleN = 3, k = 32, seed = 7L, mode = "append")
      assert(Dedup.readIndexRecipe(legacy).isEmpty,
        "a legacy append must NOT stamp a sidecar over rows of unknown recipe")
      assert(spark.read.parquet(legacy).count() == 2, "the append itself must land")
      // append to a FRESH (nonexistent) path is a first write: stamp
      val fresh = new java.io.File(dir, "fresh_idx").getAbsolutePath
      val recipe = Dedup.writeSignatureIndex(batch, "doc_id", "text", fresh,
        shingleN = 3, k = 32, seed = 7L, mode = "append")
      assert(Dedup.readIndexRecipe(fresh).contains(recipe),
        "an append that CREATES the index is a first write and must stamp")
      // a legacy append whose columns diverge from the existing files
      // refuses — it would mix parquet schemas in one directory
      val e1 = intercept[IllegalArgumentException] {
        Dedup.writeSignatureIndex(batch.withColumnRenamed("doc_id", "id"),
          "id", "text", legacy, shingleN = 3, k = 32, seed = 7L, mode = "append")
      }
      assert(e1.getMessage.contains("mix parquet schemas"))
      // mode=ignore refuses loudly: it would skip the data write yet
      // stamp the caller's recipe over data built with another
      val e2 = intercept[IllegalArgumentException] {
        Dedup.writeSignatureIndex(batch, "doc_id", "text", fresh,
          shingleN = 3, k = 32, seed = 42L, mode = "ignore")
      }
      assert(e2.getMessage.contains("not supported"))
      assert(Dedup.readIndexRecipe(fresh).contains(recipe), "refusals must not touch the sidecar")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("compactSignatureIndex: replay-inflated index shrinks, matching unchanged, sidecar rides") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sig_compact").toFile
    try {
      val path = new java.io.File(dir, "idx").getAbsolutePath
      val history = corpus(50)
      val recipe = Dedup.writeSignatureIndex(history, "doc_id", "text", path,
        shingleN = 3, k = 32, seed = 7L)
      // simulate the at-least-once crash window: the SAME batch's
      // signatures appended ten times over
      (1 to 10).foreach { _ =>
        Dedup.appendToSignatureIndex(history, "doc_id", "text", path,
          shingleN = 3, k = 32, seed = 7L)
      }
      val batch = corpus(60).filter(col("doc_id") >= 50)
      def probe(): Set[(Long, Long)] =
        Dedup.incrementalDedupAgainstIndex(batch, "doc_id", "text", path,
          threshold = 0.5, shingleN = 3, k = 32, seed = 7L, withinBatch = false)
          .select("doc_id").as[Long].collect().toSet.map((x: Long) => (x, x))
      val beforePairs = probe()
      val stats = Dedup.compactSignatureIndex(spark, path)
      assert(stats.rowsBefore == 550 && stats.rowsAfter == 50,
        s"11 copies of 50 rows must compact to 50, got $stats")
      assert(stats.bytesAfter < stats.bytesBefore, s"bytes must shrink, got $stats")
      assert(Dedup.readIndexRecipe(path).contains(recipe),
        "the recipe sidecar must ride the swap unchanged")
      assert(probe() == beforePairs, "matching must be IDENTICAL after compaction")
      // the swap leaves no staging residue
      val names = dir.list().toSet
      assert(names == Set("idx"), s"staging dirs must be gone, got $names")
      // a DELTA-backed index refuses: the raw-parquet read + dir swap
      // would resurrect removed files and destroy the _delta_log (Delta
      // indexes are exactly-once — nothing to compact; use OPTIMIZE)
      val deltaIdx = new java.io.File(dir, "delta_idx").getAbsolutePath
      graft.readers.DeltaWriter.write(spark, sigsOf(history), deltaIdx)
      val e = intercept[IllegalArgumentException] {
        Dedup.compactSignatureIndex(spark, deltaIdx)
      }
      assert(e.getMessage.contains("Delta"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("null-text rows drop from both sides without degenerate buckets") {
    val history = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]),
      (11L, "totally different words in this increment document")).toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupPairs(
      sigsOf(batch, k = 64), "doc_id", "sig", sigsOf(history, k = 64), "doc_id", "sig",
      bands = 16, threshold = 0.1)
    assert(out.count() == 0, "null-text docs must never pair (not even with each other)")
  }

  test("oversized history cliques drop whole (recall-cliff contract) and warn at job end") {
    // 8 identical history docs in a maxBucket=5 bound: every history
    // bucket they occupy exceeds the bound, so the matching batch doc
    // finds NOTHING — the documented cliff, visible via the warning.
    val clique = "identical boilerplate clique document body repeated verbatim many times"
    val history = Seq.tabulate(8)(i => (i.toLong, clique)).toDF("doc_id", "text")
      .repartition(2)
    val batch = Seq((100L, clique)).toDF("doc_id", "text").repartition(2)
    ObservedWarnings.fired.clear()
    val out = Dedup.incrementalNearDupPairs(
      sigsOf(batch, k = 64), "doc_id", "sig", sigsOf(history, k = 64), "doc_id", "sig",
      bands = 16, threshold = 0.5, maxBucket = 5)
    assert(out.count() == 0, "an over-bound history clique must match nothing")
    val deadline = System.nanoTime() + 10e9.toLong
    while (ObservedWarnings.fired.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!ObservedWarnings.fired.isEmpty, "the drop must warn at job end")
    // raising the bound restores the matches
    val ok = Dedup.incrementalNearDupPairs(
      sigsOf(batch, k = 64), "doc_id", "sig", sigsOf(history, k = 64), "doc_id", "sig",
      bands = 16, threshold = 0.5, maxBucket = 1000)
    assert(ok.count() == 8)
  }

  // ---- incremental cluster maintenance (round 20) ----

  test("assignIncrementalClusters: adopts history labels, coalesces unlabeled hist docs, mints batch-only ids") {
    val hist = Seq(
      (1L, "spark engines shuffle partitioned data across executor nodes kappa"),
      (2L, "spark engines shuffle partitioned data across executor nodes lambda"),
      (5L, "totally different historical content about cooking pasta tonight mu")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (9L, "spark engines shuffle partitioned data across executor nodes sigma"), // joins hist cluster {1,2}
      (12L, "totally different historical content about cooking pasta tonight nu"), // matches UNLABELED hist 5
      (15L, "brand new boilerplate cluster arriving entirely inside this increment alpha"),
      (18L, "brand new boilerplate cluster arriving entirely inside this increment beta"), // batch-only pair with 15
      (21L, "an utterly isolated batch document with unique vocabulary zeta")
    ).toDF("doc_id", "text")
    val union = hist.unionByName(batch)
    val ap = Dedup.exactJaccardPairs(union, "doc_id", "text", 0.5).select("id1", "id2")
    val batchPairs = ap.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0)
    val histPairs = ap.filter(col("id1") % 3 =!= 0 && col("id2") % 3 =!= 0)
    val cross = ap.filter((col("id1") % 3 === 0) =!= (col("id2") % 3 === 0))
      .select(
        when(col("id1") % 3 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
        when(col("id1") % 3 === 0, col("id2")).otherwise(col("id1")).as("hist_id"))
    // history labels cover only docs WITH edges: doc 5 is deliberately
    // absent, exercising the coalesce-to-self convention
    val histLabels = Dedup.connectedComponents(histPairs)
    val out = Dedup.assignIncrementalClusters(batch.select("doc_id"), "doc_id",
      batchPairs, cross, histLabels)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      9L -> 1L,   // adopts the existing cluster's label (min hist id)
      12L -> 5L,  // its match has no label row — the hist doc labels itself
      15L -> 15L, // batch-only cluster mints its min batch id...
      18L -> 15L, // ...for every member
      21L -> 21L  // isolated batch doc labels itself
    ), s"got $out")
  }

  test("assignIncrementalClusters REFINES the union CC (never over-merges) and adopts min labels") {
    val docs = corpus(60) // template cliques crossing the %3 split
    val ap = Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.5).select("id1", "id2")
    val batchPairs = ap.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0)
    val histPairs = ap.filter(col("id1") % 3 =!= 0 && col("id2") % 3 =!= 0)
    val cross = ap.filter((col("id1") % 3 === 0) =!= (col("id2") % 3 === 0))
      .select(
        when(col("id1") % 3 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
        when(col("id1") % 3 === 0, col("id2")).otherwise(col("id1")).as("hist_id"))
    val histLabels = Dedup.connectedComponents(histPairs)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val out = Dedup.assignIncrementalClusters(batch.select("doc_id"), "doc_id",
      batchPairs, cross, histLabels)
      .as[(Long, Long)].collect().toMap
    // every template clique crosses the split, so every batch doc adopts
    // the min HISTORY id of its template
    val expected = (0 until 60).filter(_ % 3 == 0).map { i =>
      i.toLong -> (0 until 60).filter(j => j % 4 == i % 4 && j % 3 != 0).min.toLong
    }.toMap
    assert(out == expected, s"adoption must land on min history labels: $out")
    // monotonicity: the incremental assignment REFINES the union-graph
    // CC — equal assigned labels always sit inside one union component
    val unionCC = Dedup.connectedComponents(ap)
      .as[(Long, Long)].collect().toMap
    out.groupBy(_._2).values.foreach { grp =>
      val comps = grp.keySet.map(i => unionCC.getOrElse(i, i))
      assert(comps.size == 1,
        s"docs sharing an assigned label span ${comps.size} union components: $grp")
    }
  }

  // ---- embedding-side (cosine) incremental probe ----

  // 4 well-separated gaussian bases (dim 16, cross-base cosine ~0);
  // same-base vectors differ by tiny deterministic jitter (cosine ~0.99+)
  private def embCorpus(n: Int, dim: Int = 16): DataFrame = {
    val rnd = new scala.util.Random(7)
    val bases = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    Seq.tabulate(n) { i =>
      val b = bases(i % 4)
      val v = b.zipWithIndex.map { case (x, d) => x + 0.01f * ((i * 31 + d) % 7 - 3) }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("incremental cosine pairs equal the crossing subset of the LSH self-join") {
    val emb = embCorpus(40)
    def canon(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b)) ->
          (math.rint(r.getAs[Number](2).doubleValue() * 1e4) / 1e4)
      }.toMap
    val inc = canon(Similarity.incrementalCosinePairs(
      emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding",
      emb.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding",
      threshold = 0.9, dim = 16, bitsPerGroup = 4, groups = 8).collect())
    val union = canon(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.9,
      dim = 16, bitsPerGroup = 4, groups = 8, autoTune = false, knownCorpusSize = Some(40L))
      .collect()
      .filter(r => (r.getLong(0) % 3 == 0) != (r.getLong(1) % 3 == 0)))
    assert(inc.nonEmpty, "planted cross-split near-dup vectors must be found")
    assert(inc == union,
      s"cosine incremental probe must match the LSH self-join's crossing subset:\n" +
        s"inc-only=${inc.keySet -- union.keySet}\nunion-only=${union.keySet -- inc.keySet}")
  }

  test("portable cosine incremental: directional, and never a false positive vs brute force") {
    val emb = embCorpus(30)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val history = emb.filter(col("vec_id") % 3 =!= 0)
    val out = Similarity.incrementalCosinePairsPortable(
      batch, "vec_id", "embedding", history, "vec_id", "embedding",
      threshold = 0.9, bitsPerGroup = 4, groups = 8).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 3 == 0 && r.getLong(1) % 3 != 0))
    // exact-cosine verify: the output is a SUBSET of the brute-force
    // crossing pairs at the same threshold (banding affects recall only)
    def vecs(df: DataFrame): Array[(Long, Array[Float])] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = (for {
      (bi, bv) <- vecs(batch)
      (hi, hv) <- vecs(history)
      if cos(bv, hv) >= 0.9 - 1e-6
    } yield (bi, hi)).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), s"false positives: ${got -- exact}")
  }

  test("vector index is self-describing: recipe round-trips, mismatched probes refuse, day zero keeps the batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_idx").toFile
    try {
      val path = new java.io.File(dir, "vidx").getAbsolutePath
      val emb = embCorpus(40)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      val history = emb.filter(col("vec_id") % 3 =!= 0)
      val recipe = Similarity.writeVectorIndex(history, "vec_id", "embedding", path,
        dim = 16, bitsPerGroup = 4, groups = 8, seed = 42L)
      assert(Similarity.readVectorIndexRecipe(path).contains(recipe))
      def canon(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
        rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      // probing the persisted index equals probing the frame it persisted
      val viaIndex = canon(Similarity.incrementalCosineAgainstIndex(
        batch, "vec_id", "embedding", path, threshold = 0.9,
        dim = 16, bitsPerGroup = 4, groups = 8).collect())
      val viaFrame = canon(Similarity.incrementalCosinePairs(
        batch, "vec_id", "embedding", history, "vec_id", "embedding",
        threshold = 0.9, dim = 16, bitsPerGroup = 4, groups = 8).collect())
      assert(viaIndex.nonEmpty && viaIndex == viaFrame)
      // a mismatched banding recipe is a LOUD refusal, not silent zero recall
      val e = intercept[IllegalArgumentException] {
        Similarity.incrementalCosineAgainstIndex(batch, "vec_id", "embedding", path,
          threshold = 0.9, dim = 16, bitsPerGroup = 4, groups = 8, seed = 7L)
      }
      assert(e.getMessage.contains("recipe mismatch"))
      intercept[IllegalArgumentException] {
        Similarity.incrementalCosineAgainstIndex(batch, "vec_id", "embedding", path,
          threshold = 0.9, dim = 16, bitsPerGroup = 8, groups = 8)
      }
      // appends validate banding AND column names (divergent parquet
      // schemas read back as nulls)
      intercept[IllegalArgumentException] {
        Similarity.appendToVectorIndex(batch.withColumnRenamed("vec_id", "id"),
          "id", "embedding", path, dim = 16, bitsPerGroup = 4, groups = 8)
      }
      intercept[IllegalArgumentException] {
        Similarity.writeVectorIndex(batch, "vec_id", "embedding", path,
          dim = 16, bitsPerGroup = 4, groups = 8, seed = 7L, mode = "append")
      }
      assert(Similarity.readVectorIndexRecipe(path).contains(recipe),
        "a refused append must not have touched the sidecar")
      // day zero: an EMPTY index yields zero pairs — the whole batch
      // survives the caller's anti-join
      val emptyPath = new java.io.File(dir, "empty_vidx").getAbsolutePath
      Similarity.writeVectorIndex(emb.filter(lit(false)), "vec_id", "embedding", emptyPath,
        dim = 16, bitsPerGroup = 4, groups = 8)
      val dayZero = Similarity.incrementalCosineAgainstIndex(
        batch, "vec_id", "embedding", emptyPath, threshold = 0.9,
        dim = 16, bitsPerGroup = 4, groups = 8)
      assert(dayZero.count() == 0)
      // advancing the index under its own recipe makes the batch
      // self-visible: every batch vector now matches itself at 1.0
      Similarity.appendToVectorIndex(batch, "vec_id", "embedding", path,
        dim = 16, bitsPerGroup = 4, groups = 8)
      val afterAdvance = canon(Similarity.incrementalCosineAgainstIndex(
        batch, "vec_id", "embedding", path, threshold = 0.9,
        dim = 16, bitsPerGroup = 4, groups = 8).collect())
      val batchIds = batch.select("vec_id").as[Long].collect()
      assert(batchIds.forall(i => afterAdvance.contains((i, i))),
        "an advanced index must self-match every appended vector")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("compactVectorIndex: duplicated appends shrink, recipe rides, matching unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_compact").toFile
    try {
      val path = new java.io.File(dir, "vidx").getAbsolutePath
      val emb = embCorpus(40)
      val history = emb.filter(col("vec_id") % 3 =!= 0)
      val batch = emb.filter(col("vec_id") % 3 === 0)
      val recipe = Similarity.writeVectorIndex(history, "vec_id", "embedding", path,
        dim = 16, bitsPerGroup = 4, groups = 8)
      (1 to 4).foreach { _ =>
        Similarity.appendToVectorIndex(history, "vec_id", "embedding", path,
          dim = 16, bitsPerGroup = 4, groups = 8)
      }
      def probe(): Set[(Long, Long)] =
        Similarity.incrementalCosineAgainstIndex(batch, "vec_id", "embedding", path,
          threshold = 0.9, dim = 16, bitsPerGroup = 4, groups = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val beforePairs = probe()
      val stats = Similarity.compactVectorIndex(spark, path)
      val nHist = history.count()
      assert(stats.rowsBefore == 5 * nHist && stats.rowsAfter == nHist, s"got $stats")
      assert(stats.bytesAfter < stats.bytesBefore)
      assert(Similarity.readVectorIndexRecipe(path).contains(recipe))
      assert(probe() == beforePairs && beforePairs.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("vector append onto a LEGACY index never stamps the caller's recipe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_legacy").toFile
    try {
      val legacy = new java.io.File(dir, "legacy_vidx").getAbsolutePath
      val emb = embCorpus(12)
      emb.write.parquet(legacy) // bare pre-sidecar index with data
      assert(Similarity.readVectorIndexRecipe(legacy).isEmpty)
      Similarity.writeVectorIndex(embCorpus(4), "vec_id", "embedding", legacy,
        dim = 16, bitsPerGroup = 4, groups = 8, mode = "append")
      assert(Similarity.readVectorIndexRecipe(legacy).isEmpty,
        "a legacy append must NOT stamp a sidecar over rows of unknown recipe")
      assert(spark.read.parquet(legacy).count() == 16)
      // append that CREATES the index is a first write: stamp
      val fresh = new java.io.File(dir, "fresh_vidx").getAbsolutePath
      val recipe = Similarity.writeVectorIndex(embCorpus(4), "vec_id", "embedding", fresh,
        dim = 16, bitsPerGroup = 4, groups = 8, mode = "append")
      assert(Similarity.readVectorIndexRecipe(fresh).contains(recipe))
      // a legacy append into files with a different vector TYPE refuses
      // (array<double> files + array<float> appends = one directory the
      // reader cannot serve)
      val doubleIdx = new java.io.File(dir, "double_vidx").getAbsolutePath
      embCorpus(6).select(col("vec_id"),
        col("embedding").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)).as("embedding"))
        .write.parquet(doubleIdx)
      val e1 = intercept[IllegalArgumentException] {
        Similarity.writeVectorIndex(embCorpus(4), "vec_id", "embedding", doubleIdx,
          dim = 16, bitsPerGroup = 4, groups = 8, mode = "append")
      }
      assert(e1.getMessage.contains("mix parquet schemas"))
      // mode=ignore refuses loudly (it would stamp without writing)
      val e2 = intercept[IllegalArgumentException] {
        Similarity.writeVectorIndex(embCorpus(4), "vec_id", "embedding", fresh,
          dim = 16, bitsPerGroup = 8, groups = 8, mode = "ignore")
      }
      assert(e2.getMessage.contains("not supported"))
      assert(Similarity.readVectorIndexRecipe(fresh).contains(recipe))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("plan shape: single history pass, every history-side exchange sits above the semi-join") {
    val conf = spark.conf
    val (aqe, thresh) =
      (conf.get("spark.sql.adaptive.enabled"), conf.get("spark.sql.autoBroadcastJoinThreshold"))
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_inc_plan").toFile
      try {
        val histPath = new java.io.File(dir, "inc_hist_px").getAbsolutePath
        sigsOf(corpus(60).filter(col("doc_id") % 3 =!= 0), k = 32)
          .write.mode("overwrite").parquet(histPath)
        val hist = spark.read.parquet(histPath)
        val pairs = Dedup.incrementalNearDupPairs(
          sigsOf(corpus(60).filter(col("doc_id") % 3 === 0), k = 32), "doc_id", "sig",
          hist, "doc_id", "sig", bands = 8, threshold = 0.5)
        val plan = pairs.queryExecution.executedPlan
        // ONE scan of the history table: the probe must not re-read the
        // corpus for signature re-attach (signatures ride collided rows)
        val histScans = plan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("inc_hist_px")) => s
        }
        assert(histScans.size == 1, s"expected ONE history scan, got ${histScans.size}:\n$plan")
        // every shuffle on the history lineage is above the broadcast
        // semi-join — i.e. it carries COLLIDED (signal-sized) rows, never
        // the corpus
        val histExchanges = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.toString.contains("inc_hist_px") => e
        }
        assert(histExchanges.nonEmpty, "sanity: the collided window exchange exists")
        histExchanges.foreach { e =>
          assert(e.toString.contains("LeftSemi"),
            s"a history-lineage shuffle below the semi-join would exchange the corpus:\n$e")
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    }
  }
}
