package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths, StandardOpenOption}
import org.apache.spark.sql.types._

/** Snapshot/metadata caching for the native table readers (VERDICT r9
  * #3): repeated queries over an unchanged table must not replay the
  * table's metadata — proven the unfalsifiable way, by CORRUPTING the
  * already-read metadata files on disk between queries (a re-read
  * cannot even parse, let alone return rows), while a NEW commit /
  * snapshot must still be picked up (live-table semantics).
  */
class SnapshotCacheSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  // ---- delta fixture (DeferredScanSpec mold, all files real) ---------

  private val schemaJson = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))).json
  private def metaAction: String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schemaJson)},
       |"partitionColumns":[],"configuration":{},"createdTime":1}}""".stripMargin.replace("\n", "")
  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def addAction(path: String): String =
    s"""{"add":{"path":${js(path)},"partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): JPath = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }
  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("scparts").toString
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  /** Corrupt a file's CONTENT while preserving its length and mtime:
    * the cache probe validates by file STATUS (it must never read
    * bodies), so a status-preserving corruption is exactly the state a
    * cached table must keep answering through — while an ordinary
    * in-place rewrite (length or mtime changed) now reads as a
    * REGENERATED table and must invalidate (ADVICE r10). */
  private def corruptPreservingStatus(p: JPath): Unit = {
    val mtime = Files.getLastModifiedTime(p)
    val size = Files.size(p)
    Files.write(p, Array.fill[Byte](size.toInt)('Z'.toByte),
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.setLastModifiedTime(p, mtime)
  }

  test("delta: unchanged tables replay nothing; new commits apply incrementally; metadata bails to full") {
    val t = Files.createTempDirectory("scdelta")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a"), (2L, "b")))
    writeParquetFile(t, "f1.parquet", Seq((3L, "c")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    assert(DeltaReader.read(spark, t.toString).count() == 3L)

    // corrupt BOTH replayed commit bodies in place, preserving each
    // file's length and mtime (names, sizes, mtimes unchanged — the
    // log-tail probe, which reads only statuses, cannot distinguish):
    // any re-read would die parsing, so answers can only come from the
    // cached state
    val log = t.resolve("_delta_log")
    Seq(0L, 1L).foreach(v => corruptPreservingStatus(log.resolve(f"$v%020d.json")))
    assert(DeltaReader.read(spark, t.toString).count() == 3L) // cache, not disk

    // a NEW add-only commit applies INCREMENTALLY on the cached state:
    // the corrupt earlier bodies are never touched, only v2 is read
    writeParquetFile(t, "f2.parquet", Seq((4L, "d"), (5L, "e")))
    writeCommit(t, 2, Seq(addAction("f2.parquet")))
    assert(DeltaReader.read(spark, t.toString).count() == 5L)

    // a metaData-carrying commit must NOT apply incrementally (schema /
    // profile gates need the full chain): the full replay then hits the
    // corrupt v0 — proving the bail-out engaged rather than guessing
    writeCommit(t, 3, Seq(metaAction))
    intercept[Exception](DeltaReader.read(spark, t.toString).count())
  }

  test("delta: a checkpoint-only state chains incremental replay from the checkpoint version") {
    import spark.implicits._
    val t = Files.createTempDirectory("scdeltacp")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeParquetFile(t, "f1.parquet", Seq((2L, "b"), (3L, "c")))
    val log = t.resolve("_delta_log"); Files.createDirectories(log)
    // checkpoint at v0, NO commit jsons — the cached tail is the
    // checkpoint version, not a commit number
    val cpLines = Seq(protocolAction, metaAction, addAction("f0.parquet")).toDS()
    val cpTmp = Files.createTempDirectory("sccpw").toString
    spark.read.json(cpLines).coalesce(1).write.mode("overwrite").parquet(cpTmp + "/out")
    val cpPart = Files.list(Paths.get(cpTmp + "/out")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    Files.copy(Paths.get(cpPart), log.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3}""")
    assert(DeltaReader.read(spark, t.toString).count() == 1L)

    // corrupt the checkpoint parquet: a full replay would die reading
    // it, so the add-only commit can only land incrementally — chained
    // from the CHECKPOINT version, not from commit -1
    Files.write(log.resolve(f"${0L}%020d.checkpoint.parquet"),
      Array.fill[Byte](64)(0x5a), StandardOpenOption.TRUNCATE_EXISTING)
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    assert(DeltaReader.read(spark, t.toString).count() == 3L)
  }

  test("delta: a version-pinned read caches independently of the live tail") {
    val t = Files.createTempDirectory("scdeltapin")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L)).count() == 1L)
    // new commits never invalidate a pinned version's state: corrupting
    // v0's body (status-preserving — the pinned probe validates the
    // commit file's mtime+length) and appending v1 must leave the
    // pinned read serving v0
    val v0 = t.resolve("_delta_log").resolve(f"${0L}%020d.json")
    corruptPreservingStatus(v0)
    writeParquetFile(t, "f1.parquet", Seq((2L, "b")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L)).count() == 1L)
  }

  // ---- regeneration-in-place invalidation (ADVICE r10 medium) --------
  // Delta commit filenames are pure version counters, so a table
  // deleted and rebuilt at the same path with the same commit count
  // reproduces every version number — only the anchor file's
  // mtime+length tells the two lives apart.

  test("delta: a table regenerated in place (same path, same commit count) is not served stale") {
    val t = Files.createTempDirectory("scdeltaregen")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    assert(DeltaReader.read(spark, t.toString).count() == 1L) // cached
    val log = t.resolve("_delta_log")
    Files.delete(log.resolve(f"${0L}%020d.json"))
    Files.delete(t.resolve("f0.parquet"))
    writeParquetFile(t, "g0_regen.parquet", Seq((5L, "x"), (6L, "y"), (7L, "z")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("g0_regen.parquet")))
    // same (checkpoint, tail) token as the dead table; serving the
    // cached state would return 1 row over a vanished file
    assert(DeltaReader.read(spark, t.toString).count() == 3L)
  }

  test("delta: a PINNED read is not served a dead table's state after regeneration") {
    val t = Files.createTempDirectory("scdeltaregenpin")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L)).count() == 1L)
    val log = t.resolve("_delta_log")
    Files.delete(log.resolve(f"${0L}%020d.json"))
    Files.delete(t.resolve("f0.parquet"))
    writeParquetFile(t, "g0_regen.parquet", Seq((5L, "x"), (6L, "y")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("g0_regen.parquet")))
    // the pinned key (table, Some(0)) is identical across both lives —
    // the anchor status in the token is what invalidates
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L)).count() == 2L)
  }

  test("delta: regeneration with MORE commits cannot chain incrementally onto the dead state") {
    val t = Files.createTempDirectory("scdeltaregeninc")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeParquetFile(t, "f1.parquet", Seq((2L, "b")))
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("f0.parquet")))
    writeCommit(t, 1, Seq(addAction("f1.parquet")))
    assert(DeltaReader.read(spark, t.toString).count() == 2L) // cached, tail=1
    val log = t.resolve("_delta_log")
    Seq(0L, 1L).foreach(v => Files.delete(log.resolve(f"$v%020d.json")))
    Seq("f0.parquet", "f1.parquet").foreach(p => Files.delete(t.resolve(p)))
    Seq("g0_regen.parquet", "g1_regen.parquet", "g2_regen.parquet").zipWithIndex.foreach {
      case (p, i) => writeParquetFile(t, p, Seq((10L + i, s"r$i")))
    }
    writeCommit(t, 0, Seq(protocolAction, metaAction, addAction("g0_regen.parquet")))
    writeCommit(t, 1, Seq(addAction("g1_regen.parquet")))
    writeCommit(t, 2, Seq(addAction("g2_regen.parquet")))
    // tail moved 1 → 2, so a naive incremental replay would chain v2
    // onto the DEAD table's live set {f0, f1} (now vanished files); the
    // prefix guard compares v1's current status against the cached
    // anchor and falls back to a full replay of the new life
    assert(DeltaReader.read(spark, t.toString).count() == 3L)
  }

  // ---- iceberg fixture (DeferredScanSpec mold, all files real) -------

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
  private def writeAvro(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.format(avroFmt).save(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".avro")).get
  }
  private def withFieldIds(df: org.apache.spark.sql.DataFrame, ids: Map[String, Int]) =
    df.select(df.columns.map(c => df(c).as(c,
      new MetadataBuilder().putLong("parquet.field.id", ids(c).toLong).build())).toSeq: _*)

  private def dataManifest(table: String, dir: String, files: Seq[String]): String = {
    import spark.implicits._
    val df = files.toDF("file_path").selectExpr("1 as status",
      "named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0) as data_file")
    writeAvro(df, dir)
  }
  private def manifestList(table: String, dir: String, manifests: Seq[String]): String = {
    import spark.implicits._
    writeAvro(manifests.toDF("manifest_path")
      .selectExpr("manifest_path", "0 as content", "0 as partition_spec_id"), dir)
  }
  private def writeMetadata(table: String, version: Int, listPath: String): Unit =
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
         |  "current-snapshot-id": ${76 + version},
         |  "snapshots": [{"snapshot-id": ${76 + version}, "manifest-list": "$listPath"}]
         |}""".stripMargin)
  private def dataFile(table: String, name: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val ids = Map("id" -> 1, "name" -> 2)
    withFieldIds(rows.toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/$name")
    Files.list(Paths.get(s"$table/data/$name")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
  }

  test("iceberg: cached manifests survive corruption; a new snapshot mixes cache and fresh") {
    val root = Files.createTempDirectory("sciceberg")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val f0 = dataFile(table, "d0", Seq((1L, "a"), (2L, "b")))
    val m1 = dataManifest(table, s"$table/metadata/manifest1", Seq(f0))
    val l1 = manifestList(table, s"$table/metadata/snap1", Seq(m1))
    writeMetadata(table, 1, l1)
    assert(IcebergReader.read(spark, table).count() == 2L)

    // the per-read entry cap holds even when every manifest is a cache
    // hit — the refusal contract must not depend on cache temperature
    val capped = intercept[IllegalArgumentException](
      IcebergReader.read(spark, table, maxManifestEntries = 0L))
    assert(capped.getMessage.contains("connector"))

    // corrupt the manifest Avro AND the manifest list in place: a
    // re-read of either cannot parse, so rows can only come from the
    // manifest + manifest-list caches (immutable-file keys)
    Files.write(Paths.get(m1), Array.fill[Byte](64)(0x5a),
      StandardOpenOption.TRUNCATE_EXISTING)
    Files.write(Paths.get(l1), Array.fill[Byte](64)(0x5a),
      StandardOpenOption.TRUNCATE_EXISTING)
    assert(IcebergReader.read(spark, table).count() == 2L)

    // a new snapshot lists the (still corrupt) old manifest next to a
    // fresh one: the old serves from cache, the new reads from disk,
    // and the new metadata version is picked up — live semantics
    val f1 = dataFile(table, "d1", Seq((3L, "c")))
    val m2 = dataManifest(table, s"$table/metadata/manifest2", Seq(f1))
    val l2 = manifestList(table, s"$table/metadata/snap2", Seq(m1, m2))
    writeMetadata(table, 2, l2)
    assert(IcebergReader.read(spark, table).count() == 3L)
  }
}
