package graft.readers

import graft.SparkSpec
import java.nio.file.Files

/** Row-level writes on the native Iceberg writer (round 12, the Delta
  * twin): MERGE (upsert / delete-by-key) and DELETE WHERE with
  * data-column predicates — copy-on-write per touched file publishing
  * ONE snapshot. Covers exact semantics, untouched-file preservation,
  * partition moves and pruning after rewrites, lifecycle on transform
  * partitioning, refusal gates, the concurrent-append race, and the
  * Update-mode streaming sink.
  */
object IcebergMergeSpec {
  // local-mode rendezvous: executors share this JVM, so the victim's
  // source udf can signal "scan finished, rewrite in flight" on its
  // FIRST evaluation (always after the merge read its snapshot) and
  // then WAIT for the rival to land — load-proof determinism with no
  // guessed sleeps. (The staging dir is NOT a usable trigger: AQE's
  // broadcast-build jobs evaluate the udf before any staging exists.)
  @volatile var victimInUdf = false
  @volatile var rivalLanded = false
}

class IcebergMergeSpec extends SparkSpec {

  test("merge upserts in ONE snapshot; time travel sees the pre-merge state; changes windows gate the rewrite") {
    import spark.implicits._
    val t = Files.createTempDirectory("imup").toString
    IcebergWriter.write(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "name", "v").coalesce(1), t)
    val meta0 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration))
    val snap0 = meta0.get("current-snapshot-id").asLong()
    IcebergWriter.merge(spark,
      Seq((2L, "B", 21), (4L, "d", 40)).toDF("id", "name", "v"), t, on = Seq("id"))
    val got = IcebergReader.read(spark, t).select("id", "name", "v")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", 10), (2L, "B", 21), (3L, "c", 30), (4L, "d", 40)))
    // exactly one snapshot landed, operation=overwrite
    val meta1 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration))
    import scala.jdk.CollectionConverters._
    val snaps = meta1.get("snapshots").elements().asScala.toSeq
    assert(snaps.size == 2)
    assert(snaps.last.get("summary").get("operation").asText() == "overwrite")
    // time travel to the pre-merge snapshot
    assert(IcebergReader.read(spark, t, snapshotId = Some(snap0))
      .select("v").as[Int].collect().sorted.toSeq == Seq(10, 20, 30))
    // an incremental changes window crossing the rewrite refuses (the
    // documented overwrite gate — streams re-baseline)
    val e = intercept[Exception](IcebergReader.readChangesSince(spark, t, snap0).count())
    assert(e.getMessage.contains("overwrite"))
    // a source key matching TWO target rows updates both
    val t2 = Files.createTempDirectory("immult").toString
    IcebergWriter.write(spark, Seq((1L, "a", 1), (1L, "a2", 2), (2L, "b", 3))
      .toDF("id", "name", "v").coalesce(1), t2)
    IcebergWriter.merge(spark, Seq((1L, "X", 9)).toDF("id", "name", "v"), t2, on = Seq("id"))
    assert(IcebergReader.read(spark, t2).select("id", "name", "v")
      .as[(Long, String, Int)].collect().sortBy(r => (r._1, r._3)).toSeq ==
      Seq((1L, "X", 9), (1L, "X", 9), (2L, "b", 3)))
  }

  test("merge rewrites ONLY touched files; deleteWhere keeps NULL rows and untouched files") {
    import spark.implicits._
    val t = Files.createTempDirectory("imtouch").toString
    IcebergWriter.write(spark, Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name").coalesce(1), t)
    IcebergWriter.write(spark, Seq((3L, null.asInstanceOf[String]), (4L, "delta"))
      .toDF("id", "name").coalesce(1), t)
    val before = IcebergReader.read(spark, t).inputFiles.toSet
    assert(before.size == 2)
    IcebergWriter.merge(spark, Seq((1L, "A")).toDF("id", "name"), t, on = Seq("id"))
    val after = IcebergReader.read(spark, t).inputFiles.toSet
    assert((before -- after).size == 1, "exactly the touched file was replaced")
    assert((before & after).size == 1, "the untouched file must not be rewritten")
    // delete: predicate TRUE goes, FALSE and NULL survive
    val n = IcebergWriter.deleteWhere(spark, t, "name < 'b' AND id <= 2")
    assert(n == 1L) // only (1, "A")
    val got = IcebergReader.read(spark, t).select("id", "name")
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, Some("beta")), (3L, None), (4L, Some("delta"))))
    // no-match delete publishes NO snapshot
    val metaBefore = IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration)
    assert(IcebergWriter.deleteWhere(spark, t, "id = 999") == 0L)
    assert(IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration) == metaBefore)
    // deleting everything leaves a valid empty table
    assert(IcebergWriter.deleteWhere(spark, t, "id > 0") == 3L)
    assert(IcebergReader.read(spark, t).count() == 0L)
  }

  test("partition-move updates re-route rows; pruning stays intact after rewrites; key-only delete merge") {
    import spark.implicits._
    val t = Files.createTempDirectory("impart").toString
    val df = Seq((1L, "a", 7), (2L, "b", 7), (3L, "c", 8)).toDF("id", "name", "p")
      .repartition(2, org.apache.spark.sql.functions.col("p"))
    IcebergWriter.write(spark, df, t, partitionBy = Seq("p"))
    // id=2 moves p 7 -> 8 (iceberg data files carry partition sources,
    // so the staged rewrite recomputes the layout from row values)
    IcebergWriter.merge(spark, Seq((2L, "B", 8)).toDF("id", "name", "p"), t, on = Seq("id"))
    assert(IcebergReader.read(spark, t).select("id", "name", "p")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 7), (2L, "B", 8), (3L, "c", 8)))
    val all = IcebergReader.read(spark, t)
    val p8 = IcebergReader.read(spark, t, filter = Some("p = 8"))
    assert(p8.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(p8.inputFiles.length < all.inputFiles.length, "partition pruning intact after merge")
    // delete-by-key with a key-only source
    IcebergWriter.merge(spark, Seq(1L, 3L).toDF("id"), t, on = Seq("id"),
      whenMatched = "delete", insertNotMatched = false)
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("compact works on truncate/temporal-partitioned tables (tablePartDefs covers every staged transform)") {
    import spark.implicits._
    val t = Files.createTempDirectory("imtfcompact").toString
    def frame(rows: (Long, String)*) = rows.toDF("id", "name")
    IcebergWriter.write(spark, frame((1L, "apple")).coalesce(1), t,
      partitionBy = Seq("truncate(2, name)"))
    IcebergWriter.write(spark, frame((2L, "apex")).coalesce(1), t) // same 'ap' partition
    IcebergWriter.write(spark, frame((3L, "banana")).coalesce(1), t)
    assert(IcebergWriter.compact(spark, t) == 1) // the two 'ap' files merge
    val all = IcebergReader.read(spark, t)
    assert(all.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val ap = IcebergReader.read(spark, t, filter = Some("name = 'apple'"))
    assert(ap.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(ap.inputFiles.length < all.inputFiles.length, "truncate pruning after compact")
    // and row-level delete works over the transform layout too
    assert(IcebergWriter.deleteWhere(spark, t, "name = 'apex'") == 1L)
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("merge evaluates its source plan exactly ONCE (persisted across the four consumers)") {
    import spark.implicits._
    val t = Files.createTempDirectory("imsrc1").toString
    IcebergWriter.write(spark,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v").coalesce(1), t)
    val acc = spark.sparkContext.longAccumulator("srcEvals")
    val src = spark.createDataset(Seq((2L, "B", 21), (4L, "d", 40)))
      .map { r => acc.add(1); r }.toDF("id", "name", "v")
    IcebergWriter.merge(spark, src, t, on = Seq("id"))
    assert(acc.value == 2L,
      s"source rows were evaluated ${acc.value} times across dup-gate/keys/update/insert — expected once each")
    assert(IcebergReader.read(spark, t).select("id", "v").as[(Long, Int)]
      .collect().sortBy(_._1).toSeq == Seq((1L, 10), (2L, 21), (4L, 40)))
  }

  test("gates: duplicate source keys, nondeterministic predicates, external tables") {
    import spark.implicits._
    val t = Files.createTempDirectory("imgate").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val e1 = intercept[Exception](IcebergWriter.merge(spark,
      Seq((1L, "x"), (1L, "y")).toDF("id", "name"), t, on = Seq("id")))
    assert(e1.getMessage.contains("duplicate"))
    val e2 = intercept[Exception](IcebergWriter.deleteWhere(spark, t, "rand() < 0.5"))
    assert(e2.getMessage.contains("cannot analyze"))
    // an external (unstamped) table refuses — regenerating its metadata
    // would drop state this model does not carry
    val ext = Files.createTempDirectory("imext").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$ext/metadata"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$ext/metadata/v1.metadata.json"),
      """{"format-version": 2, "location": "x", "current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "id", "type": "long"}]}],
        |"default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": []}],
        |"current-snapshot-id": -1, "snapshots": []}""".stripMargin)
    val e3 = intercept[Exception](IcebergWriter.deleteWhere(spark, ext, "id = 1"))
    assert(e3.getMessage.contains("not written by this writer"))
    val e4 = intercept[Exception](IcebergWriter.merge(spark,
      Seq(1L).toDF("id"), ext, on = Seq("id"), whenMatched = "delete",
      insertNotMatched = false))
    assert(e4.getMessage.contains("not written by this writer"))
  }

  test("a concurrent append landing mid-rewrite refuses at commit (its rows were never probed)") {
    import spark.implicits._
    val t = Files.createTempDirectory("imrace").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    // rendezvous inside the DETECTION scan: the gate udf fires only
    // after deleteWhere read its snapshot (detection scans the live
    // files of the snapshot it resolved) and holds the scan open until
    // the rival append lands — deterministic under any load, and the
    // detection phase holds no writer lock, so the rival cannot
    // deadlock on the staged-write micros lock
    IcebergMergeSpec.victimInUdf = false
    IcebergMergeSpec.rivalLanded = false
    @volatile var rivalErr: Throwable = null
    val watcher = new Thread(() => {
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while (!IcebergMergeSpec.victimInUdf && System.nanoTime() < deadline)
          Thread.sleep(1)
        if (IcebergMergeSpec.victimInUdf)
          IcebergWriter.write(spark, Seq((7L, "rival")).toDF("id", "name"), t)
      } catch { case e: Throwable => rivalErr = e }
      finally IcebergMergeSpec.rivalLanded = true // release the victim either way
    })
    watcher.start()
    spark.udf.register("im_race_gate", (s: String) => {
      IcebergMergeSpec.victimInUdf = true
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!IcebergMergeSpec.rivalLanded && System.nanoTime() < deadline) Thread.sleep(10)
      true
    })
    val e = intercept[Exception](
      IcebergWriter.deleteWhere(spark, t, "im_race_gate(name) AND id >= 1"))
    watcher.join()
    assert(rivalErr == null, s"rival write failed: $rivalErr")
    assert(e.getMessage.contains("concurrent write added"))
    // the rewrite never committed: the original row AND the rival's
    // row are both intact
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 7L))
  }

  test("Update-mode streaming sink upserts by key — exactly-once across a restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions.count
    import org.apache.spark.sql.streaming.Trigger
    val t = Files.createTempDirectory("imupdsink").toString
    val ckpt = Files.createTempDirectory("imupdckpt").toString
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)](spark)
    def run(): Unit = {
      val q = src.toDF().toDF("k", "v").groupBy("k").agg(count("*").as("n"))
        .writeStream.format("graft-iceberg").outputMode("update")
        .option("merge_keys", "k")
        .option("path", t).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    src.addData(("a", 1L), ("a", 2L), ("b", 1L))
    run()
    assert(IcebergReader.read(spark, t).select("k", "n").as[(String, Long)]
      .collect().sortBy(_._1).toSeq == Seq(("a", 2L), ("b", 1L)))
    src.addData(("a", 5L), ("c", 9L))
    run()
    assert(IcebergReader.read(spark, t).select("k", "n").as[(String, Long)]
      .collect().sortBy(_._1).toSeq == Seq(("a", 3L), ("b", 1L), ("c", 1L)))
    // a manual replay of an old batch id is a no-op
    val before = IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration)
    val sink = new IcebergStreamSink(spark, t,
      org.apache.spark.sql.streaming.OutputMode.Update(), ckpt, Nil, Seq("k"))
    sink.addBatch(0L, Seq(("zz", 99L)).toDF("k", "n"))
    assert(IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration) == before)
    // Update without merge_keys refuses loudly
    val e = intercept[Exception] {
      src.toDF().toDF("k", "v").groupBy("k").agg(count("*").as("n"))
        .writeStream.format("graft-iceberg").outputMode("update")
        .option("path", Files.createTempDirectory("imupdbad").toString)
        .option("checkpointLocation", Files.createTempDirectory("imupdbadc").toString)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage.contains("merge_keys") ||
      Option(e.getCause).exists(_.getMessage.contains("merge_keys")))
  }

  test("deleteWhere pre-prunes detection: clean partitions' and bounds-excluded files are NEVER opened") {
    import spark.implicits._
    // identity-partition pruning: p=8's data file DANGLES (bytes
    // deleted, manifest entry live) — a detection scan that listed it
    // would fail at plan time, so a green partition-scoped delete
    // proves it was never touched (the round-13 Delta fixture, ported)
    val t = Files.createTempDirectory("imprune").toString
    val df = Seq((1L, "a", 7), (2L, "b", 7), (3L, "c", 8)).toDF("id", "name", "p")
      .repartition(2, org.apache.spark.sql.functions.col("p"))
    IcebergWriter.write(spark, df, t, partitionBy = Seq("p"))
    IcebergReader.read(spark, t, filter = Some("p = 8")).inputFiles.foreach { u =>
      assert(new java.io.File(new java.net.URI(u)).delete())
    }
    assert(IcebergWriter.deleteWhere(spark, t, "p = 7 AND id = 1") == 1L)
    assert(IcebergReader.read(spark, t, filter = Some("p = 7"))
      .select("id").as[Long].collect().toSeq == Seq(2L))
    // column-bounds pruning (unpartitioned): two files with disjoint
    // id ranges, the high-range file dangling — the manifest
    // lower/upper bounds alone must skip it
    val t2 = Files.createTempDirectory("imprune2").toString
    IcebergWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1), t2)
    IcebergWriter.write(spark, Seq((100L, "x"), (200L, "y")).toDF("id", "name").coalesce(1), t2)
    val hiFile = IcebergReader.read(spark, t2, filter = Some("id >= 100")).inputFiles
    assert(hiFile.length == 1)
    hiFile.foreach(u => assert(new java.io.File(new java.net.URI(u)).delete()))
    assert(IcebergWriter.deleteWhere(spark, t2, "id = 2") == 1L)
    assert(IcebergReader.read(spark, t2, filter = Some("id < 100"))
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("merge pre-prunes detection by the source keys' [min,max]: out-of-range files are NEVER opened") {
    import spark.implicits._
    val t = Files.createTempDirectory("imkprune").toString
    IcebergWriter.write(spark, Seq((1L, "a", 10), (2L, "b", 20))
      .toDF("id", "name", "v").coalesce(1), t)
    IcebergWriter.write(spark, Seq((100L, "x", 1), (200L, "y", 2))
      .toDF("id", "name", "v").coalesce(1), t)
    // the high-range file dangles: a detection semi-join that scanned
    // it would fail at plan time, so a green merge whose keys all sit
    // in [1,2] proves the key-bound conjuncts pruned it
    val hiFile = IcebergReader.read(spark, t, filter = Some("id >= 100")).inputFiles
    assert(hiFile.length == 1)
    hiFile.foreach(u => assert(new java.io.File(new java.net.URI(u)).delete()))
    IcebergWriter.merge(spark, Seq((2L, "B", 21)).toDF("id", "name", "v"), t,
      on = Seq("id"), insertNotMatched = false)
    assert(IcebergReader.read(spark, t, filter = Some("id < 100"))
      .select("id", "name", "v").as[(Long, String, Int)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 10), (2L, "B", 21)))
  }

  test("mergeClauses: partial-column updates, conditional delete, whenNotMatchedBySource (Delta twin)") {
    import spark.implicits._
    val t = Files.createTempDirectory("imclause").toString
    IcebergWriter.write(spark,
      Seq((1L, "a", 10, 1.0, "keep"), (2L, "b", 20, 2.0, "keep"),
          (3L, "c", 30, 3.0, "drop"), (4L, "d", 40, 4.0, "keep"))
        .toDF("id", "name", "v", "w", "tagc").coalesce(1), t)
    // source carries ONLY the key + the assigned columns
    val src = Seq((1L, 100, "x"), (3L, 300, "y"), (9L, 900, "z")).toDF("id", "nv", "nn")
    IcebergWriter.mergeClauses(spark, src, t, on = Seq("id"), clauses = Seq(
      MergeClause.matchedDelete(condition = "t.tagc = 'drop'"),
      MergeClause.matchedUpdate(set = Map("v" -> "s.nv", "name" -> "concat(t.name, '+')")),
      MergeClause.insert(set = Map("id" -> "s.id", "v" -> "s.nv", "name" -> "s.nn"),
        condition = "s.nv >= 900"),
      MergeClause.bySourceUpdate(set = Map("tagc" -> "'stale'"), condition = "t.id = 4")))
    val got = IcebergReader.read(spark, t)
      .selectExpr("id", "name", "v", "coalesce(w, -1.0) as w", "coalesce(tagc, '-') as tagc")
      .as[(Long, String, Int, Double, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a+", 100, 1.0, "keep"),
      (2L, "b", 20, 2.0, "keep"),
      (4L, "d", 40, 4.0, "stale"),
      (9L, "z", 900, -1.0, "-")))
    // unconditioned bySource delete: sync-to-source
    val t2 = Files.createTempDirectory("imbsdel").toString
    IcebergWriter.write(spark, Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "name").coalesce(1), t2)
    IcebergWriter.mergeClauses(spark, Seq((2L, "B"), (4L, "d")).toDF("id", "name"), t2,
      on = Seq("id"), clauses = Seq(
        MergeClause.matchedUpdate(), MergeClause.insert(), MergeClause.bySourceDelete()))
    assert(IcebergReader.read(spark, t2).select("id", "name").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((2L, "B"), (4L, "d")))
    // validation refuses before anything stages
    val e = intercept[Exception](IcebergWriter.mergeClauses(spark, src, t, Seq("id"),
      Seq(MergeClause.matchedDelete(condition = "rand() > 0.5"))))
    assert(e.getMessage.contains("nondeterministic"))
  }

  test("merge-on-read deleteWhere commits a position-delete file; materializeDeletes folds it back") {
    import spark.implicits._
    val t = Files.createTempDirectory("immor").toString
    IcebergWriter.write(spark,
      (0 until 100).map(i => (i.toLong, s"n$i")).toDF("id", "name").coalesce(1), t)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val snap0 = om.readTree(IcebergReader.metadataText(t,
      spark.sparkContext.hadoopConfiguration)).get("current-snapshot-id").asLong()
    val file0 = IcebergReader.read(spark, t).inputFiles
    assert(file0.length == 1)
    val p0 = java.nio.file.Paths.get(new java.net.URI(file0(0)))
    val bytes0 = java.nio.file.Files.readAllBytes(p0)
    // a 3-row point delete: ONE position-delete file, no data rewrite
    assert(IcebergWriter.deleteWhere(spark, t, "id IN (3, 5, 9)",
      mode = "merge-on-read") == 3L)
    assert(IcebergReader.read(spark, t).count() == 97L)
    assert(IcebergReader.read(spark, t).where("id IN (3, 5, 9)").count() == 0L)
    assert(java.util.Arrays.equals(bytes0, java.nio.file.Files.readAllBytes(p0)),
      "the data file's bytes must be untouched")
    // a second MoR delete stacks a second delete file; an
    // already-deleted row matching the predicate does not recount
    assert(IcebergWriter.deleteWhere(spark, t, "id IN (5, 7)",
      mode = "merge-on-read") == 1L)
    assert(IcebergReader.read(spark, t).count() == 96L)
    // the pre-delete snapshot still serves every row
    assert(IcebergReader.read(spark, t, snapshotId = Some(snap0)).count() == 100L)
    // rewrite ops refuse while delete files exist — naming the remedy
    val e = intercept[Exception](IcebergWriter.merge(spark,
      Seq((1L, "x")).toDF("id", "name"), t, on = Seq("id")))
    assert(e.getMessage.contains("materializeDeletes"))
    // materialize: deletes fold into clean data files, the full
    // rewrite surface returns
    assert(IcebergWriter.materializeDeletes(spark, t) == ((1, 2)))
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      (0L until 100L).filterNot(Set(3L, 5L, 7L, 9L)))
    assert(IcebergWriter.deleteWhere(spark, t, "id = 0") == 1L) // copy-on-write works again
    assert(IcebergReader.read(spark, t).count() == 95L)
    assert(IcebergWriter.materializeDeletes(spark, t) == ((0, 0))) // nothing left
  }

  test("merge-on-read MERGE: applied rows become position deletes, only new rows stage; all MoR ops compose") {
    import spark.implicits._
    val t = Files.createTempDirectory("immormg").toString
    IcebergWriter.write(spark,
      (0 until 100).map(i => (i.toLong, i * 10)).toDF("id", "v").coalesce(1), t)
    val file0 = IcebergReader.read(spark, t).inputFiles
    assert(file0.length == 1)
    val p0 = java.nio.file.Paths.get(new java.net.URI(file0(0)))
    val bytes0 = java.nio.file.Files.readAllBytes(p0)
    // MoR upsert: the matched row's pre-image becomes a position
    // delete; post-image + insert land in a new file — bytes untouched
    IcebergWriter.mergeClauses(spark, Seq((3L, 999), (420L, 1)).toDF("id", "v"), t,
      on = Seq("id"), clauses = Seq(MergeClause.matchedUpdate(), MergeClause.insert()),
      mode = "merge-on-read")
    assert(IcebergReader.read(spark, t).count() == 101L)
    assert(IcebergReader.read(spark, t).where("id = 3").select("v")
      .as[Int].collect().toSeq == Seq(999))
    assert(java.util.Arrays.equals(bytes0, java.nio.file.Files.readAllBytes(p0)))
    // MoR delete and a second MoR merge COMPOSE on the now
    // delete-carrying table (copy-on-write would refuse)
    assert(IcebergWriter.deleteWhere(spark, t, "id = 5", mode = "merge-on-read") == 1L)
    IcebergWriter.mergeClauses(spark, Seq((7L, -1)).toDF("id", "v"), t, on = Seq("id"),
      clauses = Seq(MergeClause.matchedUpdate()), mode = "merge-on-read")
    assert(IcebergReader.read(spark, t).count() == 100L)
    assert(IcebergReader.read(spark, t).where("id = 7").select("v")
      .as[Int].collect().toSeq == Seq(-1))
    assert(IcebergReader.read(spark, t).where("id = 5").count() == 0L)
    // materialize folds the three stacked delete files; the original
    // file (the only one any delete references) rewrites clean
    assert(IcebergWriter.materializeDeletes(spark, t) == ((1, 3)))
    assert(IcebergReader.read(spark, t).count() == 100L)
    assert(IcebergReader.read(spark, t).where("id IN (3, 7)").select("v")
      .as[Int].collect().sorted.toSeq == Seq(-1, 999))
  }

  test("expireSnapshots reclaims an expired delete file and keeps live ones (MoR lifecycle)") {
    import spark.implicits._
    val t = Files.createTempDirectory("immorexp").toString
    IcebergWriter.write(spark,
      (0 until 10).map(i => (i.toLong, s"n$i")).toDF("id", "name").coalesce(1), t)
    assert(IcebergWriter.deleteWhere(spark, t, "id = 1", mode = "merge-on-read") == 1L)
    // materialize: the delete file is now referenced ONLY by the
    // intermediate snapshot; expire drops that snapshot and its file
    assert(IcebergWriter.materializeDeletes(spark, t) == ((1, 1)))
    val delFiles = new java.io.File(t, "data").listFiles()
      .filter(_.getName.startsWith("delete-"))
    assert(delFiles.length == 1)
    assert(IcebergWriter.expireSnapshots(spark, t, keepLast = 1) == 2)
    assert(!delFiles(0).exists(), "the orphaned delete file must be reclaimed")
    assert(IcebergReader.read(spark, t).count() == 9L)
  }

  test("merge-on-read deletes on a PARTITIONED table: detection prunes, reads stay partition-pruned") {
    import spark.implicits._
    val t = Files.createTempDirectory("immorp").toString
    IcebergWriter.write(spark,
      Seq((1L, "a", 7), (2L, "b", 7), (3L, "c", 8), (4L, "d", 8))
        .toDF("id", "name", "p").repartition(2, org.apache.spark.sql.functions.col("p")),
      t, partitionBy = Seq("p"))
    assert(IcebergWriter.deleteWhere(spark, t, "p = 7 AND id = 1",
      mode = "merge-on-read") == 1L)
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L))
    assert(IcebergReader.read(spark, t, filter = Some("p = 8"))
      .select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // materialize on the partitioned layout round-trips too
    assert(IcebergWriter.materializeDeletes(spark, t) == ((1, 1)))
    assert(IcebergReader.read(spark, t).select("id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L, 4L))
  }

  test("a merge update introducing '' into a string partition source refuses (rewrite-side round-trip gate)") {
    import spark.implicits._
    val t = Files.createTempDirectory("imempty").toString
    IcebergWriter.write(spark, Seq((1L, "x"), (2L, "y")).toDF("id", "p").coalesce(1), t,
      partitionBy = Seq("p"))
    val e = intercept[Exception](IcebergWriter.merge(spark,
      Seq((1L, "")).toDF("id", "p"), t, on = Seq("id")))
    assert(e.getMessage.contains("empty-string"))
    // the table is untouched
    assert(IcebergReader.read(spark, t).select("p")
      .as[String].collect().sorted.toSeq == Seq("x", "y"))
  }
}
