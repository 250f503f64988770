package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.MetadataBuilder

/** `graft-iceberg` streaming source: snapshot-then-tail over the
  * ancestry chain, checkpointed restart, delete-snapshot refusal and
  * skip, starting_snapshot_id options.
  */
class IcebergStreamSpec extends SparkSpec {

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
  private def writeAvro(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.format(avroFmt).save(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".avro")).get
  }
  private def withFieldIds(df: org.apache.spark.sql.DataFrame, ids: Map[String, Int]) =
    df.select(df.columns.map(c => df(c).as(c,
      new MetadataBuilder().putLong("parquet.field.id", ids(c).toLong).build())).toSeq: _*)
  private def dataFile(table: String, name: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    withFieldIds(rows.toDF("id", "name"), Map("id" -> 1, "name" -> 2))
      .coalesce(1).write.parquet(s"$table/data/$name")
    Files.list(Paths.get(s"$table/data/$name")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
  }
  private def dataManifest(table: String, dir: String, files: Seq[String]): String = {
    import spark.implicits._
    val df = files.toDF("file_path").selectExpr("1 as status",
      "named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0, " +
        "'file_size_in_bytes', cast(100 as bigint)) as data_file")
    writeAvro(df, dir)
  }
  private def manifestList(table: String, dir: String, manifests: Seq[String]): String = {
    import spark.implicits._
    writeAvro(manifests.toDF("manifest_path")
      .selectExpr("manifest_path", "0 as content", "0 as partition_spec_id"), dir)
  }
  private def writeMetadata(table: String, version: Int,
      snapshots: Seq[(Long, java.lang.Long, Long, String, String)], currentId: Long): Unit = {
    val snapJson = snapshots.map { case (id, parent, ts, op, list) =>
      val parentClause = Option(parent).map(p => s""""parent-snapshot-id": $p, """).getOrElse("")
      s"""{"snapshot-id": $id, $parentClause"timestamp-ms": $ts,
         |"summary": {"operation": "$op"}, "manifest-list": "$list"}""".stripMargin
        .replace("\n", " ")
    }.mkString(",\n    ")
    Files.writeString(Paths.get(s"$table/metadata/v$version.metadata.json"),
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "11111111-2222-3333-4444-555555555555",
         |  "location": "$table",
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": []}],
         |  "current-snapshot-id": $currentId,
         |  "snapshots": [
         |    $snapJson
         |  ]
         |}""".stripMargin)
  }

  /** s1 (f0: ids 1,2). Returns (table, m1, l1). */
  private def baseTable(): (String, String, String) = {
    val root = Files.createTempDirectory("icestream")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val f0 = dataFile(table, "d0", Seq((1L, "a"), (2L, "b")))
    val m1 = dataManifest(table, s"$table/metadata/m1", Seq(f0))
    val l1 = manifestList(table, s"$table/metadata/l1", Seq(m1))
    writeMetadata(table, 1, Seq((1L, null, 1000L, "append", l1)), currentId = 1L)
    (table, m1, l1)
  }

  test("snapshot-then-tail: append snapshots arrive incrementally; replace emits nothing") {
    val (table, m1, l1) = baseTable()
    val q = spark.readStream.format("graft-iceberg").load(table)
      .writeStream.format("memory").queryName("is_mem").start()
    try {
      q.processAllAvailable()
      def ids(): Seq[Long] =
        spark.sql("SELECT id FROM is_mem").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids() == Seq(1L, 2L))
      // s2 appends f1
      val f1 = dataFile(table, "d1", Seq((3L, "c")))
      val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
      val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
      writeMetadata(table, 2, Seq(
        (1L, null, 1000L, "append", l1),
        (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2)), currentId = 2L)
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L))
      // s3 compacts both files into c0 (replace): nothing new emitted
      val c0 = dataFile(table, "c0", Seq((1L, "a"), (2L, "b"), (3L, "c")))
      val mc = dataManifest(table, s"$table/metadata/mc", Seq(c0))
      val l3 = manifestList(table, s"$table/metadata/l3", Seq(mc))
      writeMetadata(table, 3, Seq(
        (1L, null, 1000L, "append", l1),
        (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
        (3L, java.lang.Long.valueOf(2L), 3000L, "replace", l3)), currentId = 3L)
      // s4 appends f3 on top of the compaction
      val f3 = dataFile(table, "d3", Seq((4L, "d")))
      val m4 = dataManifest(table, s"$table/metadata/m4", Seq(f3))
      val l4 = manifestList(table, s"$table/metadata/l4", Seq(mc, m4))
      writeMetadata(table, 4, Seq(
        (1L, null, 1000L, "append", l1),
        (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
        (3L, java.lang.Long.valueOf(2L), 3000L, "replace", l3),
        (4L, java.lang.Long.valueOf(3L), 4000L, "append", l4)), currentId = 4L)
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L, 4L)) // no duplicates from the compaction
    } finally q.stop()
  }

  test("a checkpointed restart resumes at the committed snapshot") {
    val (table, m1, l1) = baseTable()
    val ckpt = Files.createTempDirectory("isckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg").load(table)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => seen.synchronized { seen += r.getLong(0) }); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(seen.sorted.toSeq == Seq(1L, 2L))
    // a snapshot lands while the query is DOWN
    val f1 = dataFile(table, "d1", Seq((3L, "c"), (4L, "d")))
    val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
    writeMetadata(table, 2, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2)), currentId = 2L)
    seen.clear()
    run()
    assert(seen.sorted.toSeq == Seq(3L, 4L))
  }

  test("delete snapshots refuse; skip_delete_snapshots skips pre-window deletes") {
    val (table, m1, l1) = baseTable()
    def extend(table: String): Unit = {
      // s2 appends f1; s3 DELETES f0 (pre-window data)
      val f1 = dataFile(table, "d1", Seq((3L, "c")))
      val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
      val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
      val l3 = manifestList(table, s"$table/metadata/l3", Seq(m2)) // f0's manifest dropped
      writeMetadata(table, 3, Seq(
        (1L, null, 1000L, "append", l1),
        (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
        (3L, java.lang.Long.valueOf(2L), 3000L, "delete", l3)), currentId = 3L)
    }
    val q1 = spark.readStream.format("graft-iceberg").load(table)
      .writeStream.format("memory").queryName("is_fail").start()
    try {
      q1.processAllAvailable()
      extend(table)
      val e = intercept[Exception](q1.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("skip_delete_snapshots")), chain(e).mkString("|"))
    } finally q1.stop()
    // fresh table, same story, with the skip: f1's append still arrives
    val (t2, m1b, l1b) = baseTable()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("skip_delete_snapshots", "true").load(t2)
      .writeStream.format("memory").queryName("is_skip").start()
    try {
      q2.processAllAvailable()
      val f1 = dataFile(t2, "d1", Seq((3L, "c")))
      val m2 = dataManifest(t2, s"$t2/metadata/m2", Seq(f1))
      val l2 = manifestList(t2, s"$t2/metadata/l2", Seq(m1b, m2))
      val l3 = manifestList(t2, s"$t2/metadata/l3", Seq(m2))
      writeMetadata(t2, 3, Seq(
        (1L, null, 1000L, "append", l1b),
        (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
        (3L, java.lang.Long.valueOf(2L), 3000L, "delete", l3)), currentId = 3L)
      q2.processAllAvailable()
      assert(spark.sql("SELECT id FROM is_skip").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L)) // f0's rows stay emitted (append semantics); f1 arrives
    } finally q2.stop()
  }

  test("starting_snapshot_id tails from an ancestor; 'latest' emits nothing old") {
    val (table, m1, l1) = baseTable()
    val f1 = dataFile(table, "d1", Seq((3L, "c")))
    val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
    writeMetadata(table, 2, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2)), currentId = 2L)
    val q = spark.readStream.format("graft-iceberg")
      .option("starting_snapshot_id", "1").load(table)
      .writeStream.format("memory").queryName("is_sv").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM is_sv").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(3L)) // s1's snapshot stays out
    } finally q.stop()
    val q2 = spark.readStream.format("graft-iceberg")
      .option("starting_snapshot_id", "latest").load(table)
      .writeStream.format("memory").queryName("is_latest").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("is_latest").isEmpty)
    } finally q2.stop()
  }

  test("a paced catch-up across additive evolution keeps the stream's fixed schema") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("isevolve").toString
    val ckpt = java.nio.file.Files.createTempDirectory("isevolveckpt").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Option[Int])]()
    def run(paced: Boolean): Unit = {
      val reader = spark.readStream.format("graft-iceberg")
      val q = (if (paced) reader.option("max_snapshots_per_trigger", "1") else reader)
        .load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { r =>
            val score = if (df.columns.contains("score") && !r.isNullAt(r.fieldIndex("score")))
              Some(r.getInt(r.fieldIndex("score"))) else None
            seen.synchronized { seen += ((r.getLong(r.fieldIndex("id")), score)) }
          }; ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(paced = false)
    assert(seen.map(_._1).sorted.toSeq == Seq(1L))
    // two commits land while the stream is down: a plain append, then
    // an ADDITIVE evolution append — the restarted catch-up (paced one
    // snapshot per batch, so the pre-evolution window scans PINNED)
    // must read every batch under the stream's CURRENT schema, not the
    // window snapshot's own older one
    IcebergWriter.write(spark, Seq((2L, "b")).toDF("id", "name"), t)
    IcebergWriter.write(spark, Seq((3L, "c", 7)).toDF("id", "name", "score"), t,
      mergeSchema = true)
    seen.clear()
    run(paced = true)
    assert(seen.sortBy(_._1).toSeq == Seq((2L, None), (3L, Some(7))))
  }

  test("branch option: the stream tails the branch ref; main stream stays silent until fastForward") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("isbranch").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    IcebergWriter.createBranch(spark, t, "staging")
    def tailOnce(opts: Map[String, String], ckpt: String): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer[Long]()
      val reader = opts.foldLeft(spark.readStream.format("graft-iceberg")) {
        case (r, (k, v)) => r.option(k, v) }
      val q = reader.load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => got.synchronized { got += r.getLong(0) }); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
      got.sorted.toSeq
    }
    val auditCkpt = java.nio.file.Files.createTempDirectory("isbrckpt").toString
    val mainCkpt = java.nio.file.Files.createTempDirectory("isbrmain").toString
    // snapshot batch on the branch serves the branch head (= main now)
    assert(tailOnce(Map("branch" -> "staging"), auditCkpt) == Seq(1L))
    assert(tailOnce(Map.empty, mainCkpt) == Seq(1L))
    // branch commits: the audit tail sees them, main does not
    IcebergWriter.write(spark, Seq((2L, "b")).toDF("id", "name"), t, toBranch = Some("staging"))
    IcebergWriter.write(spark, Seq((3L, "c")).toDF("id", "name"), t, toBranch = Some("staging"))
    assert(tailOnce(Map("branch" -> "staging"), auditCkpt) == Seq(2L, 3L))
    assert(tailOnce(Map.empty, mainCkpt) == Seq.empty)
    // fastForward publishes: the main tail now serves exactly the
    // branch window (ancestry-preserving pointer move)
    IcebergWriter.fastForward(spark, t, "staging")
    assert(tailOnce(Map.empty, mainCkpt) == Seq(2L, 3L))
    // a missing branch refuses loudly (silent emptiness would hide typos)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-iceberg").option("branch", "nope").load(t)
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("no branch 'nope'") ||
      Option(e.getCause).exists(_.getMessage.contains("no branch 'nope'")))
  }

  test("read_change_feed: row-level changes stream — deletes and merge updates flow as change rows") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("iscdf").toString
    val ckpt = java.nio.file.Files.createTempDirectory("iscdfckpt").toString
    IcebergWriter.write(spark, (1 to 3).map(i => (i.toLong, s"r$i")).toDF("id", "name"), t)
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("read_change_feed", "true").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "_change_type").collect().foreach(r =>
            seen.synchronized { seen += ((r.getLong(0), r.getString(1))) }); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.sorted.toSeq == Seq((1L, "insert"), (2L, "insert"), (3L, "insert")))
    // a copy-on-write delete and a merge-update land while the stream
    // is down — the append-only source would refuse both snapshots;
    // the feed serves them as row-level changes
    IcebergWriter.deleteWhere(spark, t, "id = 1")
    IcebergWriter.mergeClauses(spark, Seq((2L, "R2")).toDF("id", "nv"), t, on = Seq("id"),
      clauses = Seq(MergeClause.matchedUpdate(set = Map("name" -> "s.nv"))))
    seen.clear()
    run()
    // file-level diff truth: the delete surfaces as a delete row; the
    // update as delete+insert of the touched file's rows (the feed's
    // documented add/remove derivation)
    assert(seen.count(_ == (1L, "delete")) == 1)
    assert(seen.exists(r => r._1 == 2L && r._2 == "insert"))
    // contradictory options refuse inside the query thread
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-iceberg")
        .option("read_change_feed", "true").option("skip_delete_snapshots", "true").load(t)
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains("contradict"))))
  }

  test("max_snapshots_per_trigger paces a fresh catch-up along the ancestry") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("ispaced").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val first = {
      import scala.jdk.CollectionConverters._
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration))
        .get("snapshots").elements().asScala.next().get("snapshot-id").asLong()
    }
    IcebergWriter.write(spark, Seq((2L, "b")).toDF("id", "name"), t)
    IcebergWriter.write(spark, Seq((3L, "c")).toDF("id", "name"), t)
    IcebergWriter.write(spark, Seq((4L, "d")).toDF("id", "name"), t)
    val q = spark.readStream.format("graft-iceberg")
      .option("starting_snapshot_id", first.toString)
      .option("max_snapshots_per_trigger", "1").load(t)
      .writeStream.format("memory").queryName("is_paced")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM is_paced").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 3L, 4L))
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty == 3, s"expected 3 paced batches, saw $nonEmpty")
    } finally q.stop()
  }

  test("a merge under the stream refuses; skip_overwrite_snapshots skips it wholesale, appends keep flowing") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("isovr").toString
    IcebergWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    val q = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.format("memory").queryName("is_ovr").start()
    try {
      q.processAllAvailable()
      assert(spark.table("is_ovr").count() == 2L)
      IcebergWriter.merge(spark, Seq((1L, "A"), (3L, "c")).toDF("id", "name"), t, on = Seq("id"))
      val e = intercept[Exception](q.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("skip_overwrite_snapshots")), chain(e).mkString("|"))
    } finally q.stop()
    // with the option, the rewrite snapshot skips wholesale and later
    // plain appends keep flowing (the skipped upserts never emit —
    // readChangeFeed carries the row-level diffs)
    val q2 = spark.readStream.format("graft-iceberg")
      .option("skip_overwrite_snapshots", "true").load(t)
      .writeStream.format("memory").queryName("is_ovr2").start()
    try {
      q2.processAllAvailable()
      val snap = spark.table("is_ovr2").count() // full current snapshot first
      IcebergWriter.merge(spark, Seq((2L, "B"), (4L, "d")).toDF("id", "name"), t, on = Seq("id"))
      IcebergWriter.write(spark, Seq((9L, "z")).toDF("id", "name"), t)
      q2.processAllAvailable()
      val vals = spark.sql("SELECT id FROM is_ovr2").collect().map(_.getLong(0)).toSet
      assert(vals.contains(9L), s"the append after the skipped merge must flow: $vals")
      assert(!vals.contains(4L), s"the skipped merge's upserts must NOT emit: $vals")
      assert(spark.table("is_ovr2").count() == snap + 1)
    } finally q2.stop()
  }

  test("max_files_per_trigger splits an oversized snapshot across triggers — no loss/duplication across restart") {
    val (table, m1, l1) = baseTable() // s1: f0 with ids 1, 2
    // ONE snapshot appending 12 files: with a 5-file cap it must arrive
    // as partial offsets over the snapshot's path-sorted adds (5 + 5 + 2)
    val gFiles = (0 until 12).map(i => dataFile(table, f"g$i%02d", Seq((100L + i, s"g$i"))))
    val m2 = dataManifest(table, s"$table/metadata/m2", gFiles)
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
    writeMetadata(table, 2, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2)), currentId = 2L)
    val ckpt = Files.createTempDirectory("isfiles").toString
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-iceberg")
        .option("starting_snapshot_id", "1").option("max_files_per_trigger", "5")
        .load(table)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("id").collect().map(_.getLong(0))
          seen.synchronized { seen ++= ids; if (ids.nonEmpty) sizes += ids.length.toLong }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.sorted.toSeq == (0 until 12).map(100L + _),
      s"split snapshot must reassemble exactly: $seen")
    assert(sizes.toSeq == Seq(5L, 5L, 2L), s"expected 5+5+2 file-paced batches: $sizes")
    // a restart mid-history replays NOTHING (offsets carry the partial
    // coordinates), and a new oversized snapshot splits the same way
    seen.clear(); sizes.clear()
    val hFiles = (0 until 7).map(i => dataFile(table, s"h$i", Seq((200L + i, s"h$i"))))
    val m3 = dataManifest(table, s"$table/metadata/m3", hFiles)
    val l3 = manifestList(table, s"$table/metadata/l3", Seq(m1, m2, m3))
    writeMetadata(table, 3, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
      (3L, java.lang.Long.valueOf(2L), 3000L, "append", l3)), currentId = 3L)
    run()
    assert(seen.sorted.toSeq == (0 until 7).map(200L + _), s"got $seen")
    assert(sizes.toSeq == Seq(5L, 2L), s"expected 5+2: $sizes")
    // and nothing more on a no-op run
    seen.clear(); sizes.clear()
    run()
    assert(seen.isEmpty && sizes.isEmpty)
    // max_bytes_per_trigger is the byte-budget twin — a SOFT cap, so a
    // 1-byte budget admits exactly one file per batch (the first file
    // always fits; the fixture manifests carry file_size_in_bytes=100);
    // totals reassemble exactly
    val ckptB = Files.createTempDirectory("isbytes").toString
    val seenB = scala.collection.mutable.ArrayBuffer[Long]()
    val sizesB = scala.collection.mutable.ArrayBuffer[Long]()
    val qb = spark.readStream.format("graft-iceberg")
      .option("starting_snapshot_id", "2").option("max_bytes_per_trigger", "1")
      .load(table)
      .writeStream.option("checkpointLocation", ckptB)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("id").collect().map(_.getLong(0))
        seenB.synchronized { seenB ++= ids; if (ids.nonEmpty) sizesB += ids.length.toLong }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(25)).start()
    try qb.processAllAvailable() finally qb.stop()
    assert(seenB.sorted.toSeq == (0 until 7).map(200L + _), s"got $seenB")
    assert(sizesB.toSeq == Seq.fill(7)(1L), s"one file per 1-byte batch: $sizesB")

    // the partial coordinate round-trips serialization both ways — a
    // restart recovering a mid-split offset resumes at the same slice
    assert(IcebergSnapshotOffset(3L, Some(4L)).json == "3:4")
    val src = new IcebergStreamSource(spark, table, Map.empty)
    assert(src.ver(new org.apache.spark.sql.execution.streaming.Offset {
      override def json(): String = "3:4" }) == ((3L, Some(4L))))
    assert(src.ver(new org.apache.spark.sql.execution.streaming.Offset {
      override def json(): String = "7" }) == ((7L, None)))
  }
}
