package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** `graft-delta` streaming source: full-snapshot first batch, appended
  * versions arrive per trigger, checkpointed restarts resume at the
  * committed version, data-removing versions refuse (or skip on
  * request), metadata changes refuse, startingVersion options.
  */
class DeltaStreamSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  private val schemaJson = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))).json
  private def metaAction: String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schemaJson)},
       |"partitionColumns":[],"configuration":{},"createdTime":1}}""".stripMargin.replace("\n", "")
  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def addAction(path: String, dataChange: Boolean = true): String =
    s"""{"add":{"path":${js(path)},"partitionValues":{},"size":1,"modificationTime":1,"dataChange":$dataChange}}"""
  private def removeAction(path: String, dataChange: Boolean = true): String =
    s"""{"remove":{"path":${js(path)},"deletionTimestamp":1,"dataChange":$dataChange}}"""
  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }
  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dsparts").toString
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }
  private def baseTable(): JPath = {
    val t = Files.createTempDirectory("dstream")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a"), (2L, "b")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    t
  }

  test("snapshot-then-tail: first batch is the full table, appended versions arrive incrementally") {
    val t = baseTable()
    val q = spark.readStream.format("graft-delta").load(t.toString)
      .writeStream.format("memory").queryName("ds_mem")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      def ids(): Seq[Long] =
        spark.sql("SELECT id FROM ds_mem").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids() == Seq(1L, 2L))
      writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
      writeCommit(t, 1, Seq(addAction("f1.parquet")))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L))
      // a dataChange=false OPTIMIZE version contributes nothing
      writeParquetFile(t, "c0.parquet", Seq((1L, "a"), (2L, "b"), (3L, "c")))
      writeCommit(t, 2, Seq(removeAction("f0.parquet", dataChange = false),
        removeAction("f1.parquet", dataChange = false),
        addAction("c0.parquet", dataChange = false)))
      writeParquetFile(t, "f3.parquet", Seq((4L, "d")))
      writeCommit(t, 3, Seq(addAction("f3.parquet")))
      q.processAllAvailable()
      assert(ids() == Seq(1L, 2L, 3L, 4L)) // no duplicates from the compaction
    } finally q.stop()
  }

  test("a checkpointed restart resumes at the committed version, not the snapshot") {
    val t = baseTable()
    val ckpt = Files.createTempDirectory("dsckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta").load(t.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id").collect().foreach(r => seen.synchronized { seen += r.getLong(0) }); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(seen.sorted.toSeq == Seq(1L, 2L))
    // two versions land while the query is DOWN — the restart delivers
    // exactly their rows (the checkpoint carries the version through
    // SerializedOffset → the source's json round-trip)
    writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    writeParquetFile(t, "f2.parquet", Seq((4L, "d"), (5L, "e")))
    writeCommit(t, 2, Seq(addAction("f2.parquet")))
    seen.clear()
    run()
    assert(seen.sorted.toSeq == Seq(3L, 4L, 5L))
  }

  test("data-removing versions refuse; skip_change_commits skips them wholesale") {
    // the change commit must land WHILE streaming — a snapshot taken
    // after it simply reads the head and never walks the window
    def updateUnderStream(t: JPath): Unit = {
      writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
      writeCommit(t, 1, Seq(addAction("f1.parquet")))
      // an UPDATE rewrites f1 into u1 — a remove the stream cannot retract
      writeParquetFile(t, "u1.parquet", Seq((3L, "C!")))
      writeCommit(t, 2, Seq(removeAction("f1.parquet"), addAction("u1.parquet")))
      writeParquetFile(t, "f3.parquet", Seq((4L, "d")))
      writeCommit(t, 3, Seq(addAction("f3.parquet")))
    }
    val t1 = baseTable()
    val q1 = spark.readStream.format("graft-delta").load(t1.toString)
      .writeStream.format("memory").queryName("ds_fail").start()
    try {
      q1.processAllAvailable() // snapshot at v0: ids 1, 2
      updateUnderStream(t1)
      // default: the stream fails at the change commit, naming the option
      val e = intercept[Exception](q1.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("skip_change_commits")), chain(e).mkString("|"))
    } finally q1.stop()
    // skip_change_commits: version 2 is skipped (its add AND remove);
    // the stream carries on with versions 1 and 3
    val t2 = baseTable()
    val q2 = spark.readStream.format("graft-delta")
      .option("skip_change_commits", "true").load(t2.toString)
      .writeStream.format("memory").queryName("ds_skip").start()
    try {
      q2.processAllAvailable()
      updateUnderStream(t2)
      q2.processAllAvailable()
      val ids = spark.sql("SELECT id FROM ds_skip").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L)) // u1's rewrite (C!) never emitted
    } finally q2.stop()
  }

  test("startingVersion: a number starts at that version's changes; 'latest' tails only") {
    val t = baseTable()
    writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    writeParquetFile(t, "f2.parquet", Seq((4L, "d")))
    writeCommit(t, 2, Seq(addAction("f2.parquet")))
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "1").load(t.toString)
      .writeStream.format("memory").queryName("ds_sv").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM ds_sv").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(3L, 4L)) // version 0's snapshot stays out
    } finally q.stop()
    val q2 = spark.readStream.format("graft-delta")
      .option("startingVersion", "latest").load(t.toString)
      .writeStream.format("memory").queryName("ds_latest").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("ds_latest").isEmpty) // nothing old
      writeParquetFile(t, "f3.parquet", Seq((9L, "z")))
      writeCommit(t, 3, Seq(addAction("f3.parquet")))
      q2.processAllAvailable()
      assert(spark.sql("SELECT id FROM ds_latest").collect().map(_.getLong(0)).toSeq == Seq(9L))
    } finally q2.stop()
  }

  test("read_change_feed: row-level changes stream — snapshot seeds as inserts, deletes and update pairs flow, restart resumes") {
    import spark.implicits._
    val t = Files.createTempDirectory("dscdf").toString
    val ckpt = Files.createTempDirectory("dscdfckpt").toString
    DeltaWriter.write(spark, (1 to 3).map(i => (i.toLong, s"r$i")).toDF("id", "name"), t,
      tableConf = Map("delta.enableChangeDataFeed" -> "true"))
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("read_change_feed", "true").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("id", "_change_type", "_commit_version").collect().foreach(r =>
            seen.synchronized { seen += ((r.getLong(0), r.getString(1), r.getLong(2))) }); ()
        }
        .trigger(Trigger.ProcessingTime(50)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // the initial snapshot seeds as insert rows at the anchor version
    assert(seen.sorted.toSeq == Seq((1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 0L)))
    // a delete and a merge-update land while the stream is down; the
    // restarted tail serves the precise row-level changes — the
    // append-only source would have refused both commits
    DeltaWriter.deleteWhere(spark, t, "id = 1")
    DeltaWriter.mergeClauses(spark, Seq((2L, "R2")).toDF("id", "nv"), t, on = Seq("id"),
      clauses = Seq(MergeClause.matchedUpdate(set = Map("name" -> "s.nv"))))
    seen.clear()
    run()
    assert(seen.sortBy(r => (r._3, r._2)).toSeq == Seq(
      (1L, "delete", 1L),
      (2L, "update_postimage", 2L), (2L, "update_preimage", 2L)))
    // contradictory options refuse (inside the query thread)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-delta")
        .option("read_change_feed", "true").option("skip_change_commits", "true").load(t)
        .writeStream.format("noop").start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10)
      .exists(c => Option(c.getMessage).exists(_.contains("contradicts"))))
  }

  test("a metadata change under the stream refuses loudly") {
    val t = baseTable()
    val q = spark.readStream.format("graft-delta").load(t.toString)
      .writeStream.format("memory").queryName("ds_meta").start()
    try {
      q.processAllAvailable()
      writeCommit(t, 1, Seq(metaAction)) // schema rewrite mid-stream
      val e = intercept[Exception](q.processAllAvailable())
      def chain(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
      assert(chain(e).exists(_.contains("schema must be constant")), chain(e).mkString("|"))
    } finally q.stop()
  }

  test("max_versions_per_trigger paces a fresh catch-up in bounded micro-batches") {
    val t = baseTable()
    writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
    writeParquetFile(t, "f2.parquet", Seq((4L, "d")))
    writeParquetFile(t, "f3.parquet", Seq((5L, "e")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    writeCommit(t, 2, Seq(addAction("f2.parquet")))
    writeCommit(t, 3, Seq(addAction("f3.parquet")))
    // startingVersion=1 + cap 1: the catch-up 1..3 must land as THREE
    // one-version batches, not one
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "1").option("max_versions_per_trigger", "1")
      .load(t.toString)
      .writeStream.format("memory").queryName("ds_paced")
      .trigger(Trigger.ProcessingTime(50)).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM ds_paced").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(3L, 4L, 5L))
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty == 3, s"expected 3 paced batches, saw $nonEmpty")
    } finally q.stop()
  }

  test("max_files_per_trigger splits an oversized commit across triggers — no loss/duplication across restart") {
    val t = baseTable() // v0: f0 with ids 1, 2
    // ONE commit adding 12 files: with a 5-file cap it must arrive as
    // partial offsets over the version's sorted adds (5 + 5 + 2)
    (0 until 12).foreach(i => writeParquetFile(t, f"g$i%02d.parquet", Seq((100L + i, s"g$i"))))
    writeCommit(t, 1, (0 until 12).map(i => addAction(f"g$i%02d.parquet")))
    val ckpt = Files.createTempDirectory("dsfiles").toString
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    def run(): Unit = {
      val q = spark.readStream.format("graft-delta")
        .option("startingVersion", "1").option("max_files_per_trigger", "5")
        .load(t.toString)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("id").collect().map(_.getLong(0))
          seen.synchronized { seen ++= ids; if (ids.nonEmpty) sizes += ids.length.toLong }
          ()
        }
        .trigger(Trigger.ProcessingTime(25)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.sorted.toSeq == (0 until 12).map(100L + _),
      s"split commit must reassemble exactly: $seen")
    assert(sizes.toSeq == Seq(5L, 5L, 2L), s"expected 5+5+2 file-paced batches: $sizes")
    // a restart mid-history replays NOTHING (offsets carry the partial
    // coordinates), and a new oversized commit splits the same way
    seen.clear(); sizes.clear()
    (0 until 7).foreach(i => writeParquetFile(t, f"h$i.parquet", Seq((200L + i, s"h$i"))))
    writeCommit(t, 2, (0 until 7).map(i => addAction(s"h$i.parquet")))
    run()
    assert(seen.sorted.toSeq == (0 until 7).map(200L + _), s"got $seen")
    assert(sizes.toSeq == Seq(5L, 2L), s"expected 5+2: $sizes")
    // and nothing more on a no-op run
    seen.clear(); sizes.clear()
    run()
    assert(seen.isEmpty && sizes.isEmpty)
    // max_bytes_per_trigger is the byte-budget twin — a SOFT cap, so a
    // 1-byte budget admits exactly one file per batch (the first file
    // always fits); totals reassemble exactly
    val ckptB = Files.createTempDirectory("dsbytes").toString
    val seenB = scala.collection.mutable.ArrayBuffer[Long]()
    val sizesB = scala.collection.mutable.ArrayBuffer[Long]()
    val qb = spark.readStream.format("graft-delta")
      .option("startingVersion", "2").option("max_bytes_per_trigger", "1")
      .load(t.toString)
      .writeStream.option("checkpointLocation", ckptB)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.select("id").collect().map(_.getLong(0))
        seenB.synchronized { seenB ++= ids; if (ids.nonEmpty) sizesB += ids.length.toLong }
        ()
      }
      .trigger(Trigger.ProcessingTime(25)).start()
    try qb.processAllAvailable() finally qb.stop()
    assert(seenB.sorted.toSeq == (0 until 7).map(200L + _), s"got $seenB")
    assert(sizesB.toSeq == Seq.fill(7)(1L), s"one file per 1-byte batch: $sizesB")

    // the partial coordinate round-trips serialization both ways — a
    // restart recovering a mid-split offset resumes at the same slice
    assert(DeltaVersionOffset(3L, Some(4L)).json == "3:4")
    val src = new DeltaStreamSource(spark, t.toString, Map.empty)
    assert(src.ver(new org.apache.spark.sql.execution.streaming.Offset {
      override def json(): String = "3:4" }) == ((3L, Some(4L))))
    assert(src.ver(new org.apache.spark.sql.execution.streaming.Offset {
      override def json(): String = "7" }) == ((7L, None)))
  }
}
