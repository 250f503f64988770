package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.MetadataBuilder

/** `IcebergReader.readChangesSince` (the Delta changes twin): adds-only
  * incremental batch read over the snapshot ancestry chain — rows of
  * files that became live after a given snapshot and are still live at
  * head, tagged `_snapshot_id`/`_committed_at`. Snapshot operations
  * gate the walk: append contributes, replace contributes nothing (and
  * refuses when it rewrites an in-window add), delete retracts,
  * overwrite refuses.
  */
class IcebergChangesSpec extends SparkSpec {

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
      "named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0) as data_file")
    writeAvro(df, dir)
  }
  private def manifestList(table: String, dir: String, manifests: Seq[String]): String = {
    import spark.implicits._
    writeAvro(manifests.toDF("manifest_path")
      .selectExpr("manifest_path", "0 as content", "0 as partition_spec_id"), dir)
  }

  /** snapshots: (id, parentOrNull, timestampMs, operation, listPath). */
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

  /** Chain s1 --append--> s2 --append--> s3: f0@s1, f1@s2, f2@s3.
    * Returns (table, manifests m1/m2/m3). */
  private def appendChain(): (String, Seq[String]) = {
    val root = Files.createTempDirectory("icechanges")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val f0 = dataFile(table, "d0", Seq((1L, "a"), (2L, "b")))
    val f1 = dataFile(table, "d1", Seq((3L, "c")))
    val f2 = dataFile(table, "d2", Seq((4L, "d"), (5L, "e")))
    val m1 = dataManifest(table, s"$table/metadata/m1", Seq(f0))
    val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
    val m3 = dataManifest(table, s"$table/metadata/m3", Seq(f2))
    val l1 = manifestList(table, s"$table/metadata/l1", Seq(m1))
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
    val l3 = manifestList(table, s"$table/metadata/l3", Seq(m1, m2, m3))
    writeMetadata(table, 3, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
      (3L, java.lang.Long.valueOf(2L), 3000L, "append", l3)), currentId = 3L)
    (table, Seq(m1, m2, m3))
  }

  test("appends along the ancestry chain surface exactly the new rows, tagged with their snapshot") {
    import spark.implicits._
    val (table, _) = appendChain()
    val ch = IcebergReader.readChangesSince(spark, table, 1L)
    assert(ch.columns.toSeq == Seq("id", "name", "_snapshot_id", "_committed_at"))
    val got = ch.select("id", "_snapshot_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((3L, 2L), (4L, 3L), (5L, 3L))) // s1's rows stay out
    val ts = ch.where("id = 3").select("_committed_at").collect().head.getTimestamp(0)
    assert(ts.getTime == 2000L)
    assert(IcebergReader.readChangesSince(spark, table, 2L).count() == 2L)
    // since = -1: from the root — every live file, tagged per snapshot
    assert(IcebergReader.readChangesSince(spark, table, -1L).count() == 5L)
    // since = head: typed empty with the same columns
    val empty = IcebergReader.readChangesSince(spark, table, 3L)
    assert(empty.columns.toSeq == Seq("id", "name", "_snapshot_id", "_committed_at"))
    assert(empty.count() == 0L)
    // a snapshot that never existed on the chain refuses loudly
    val e = intercept[Exception](IcebergReader.readChangesSince(spark, table, 999L))
    assert(e.getMessage.contains("not an ancestor"))
  }

  test("a delete snapshot retracts in-window adds") {
    import spark.implicits._
    val (table, ms) = appendChain()
    val Seq(m1, m2, m3) = ms
    // s4 (delete): the list simply stops carrying f1's manifest —
    // live set {f0, f2}; the s1/s2/s3 history is byte-identical
    val l1 = manifestList(table, s"$table/metadata/l1d", Seq(m1))
    val l2 = manifestList(table, s"$table/metadata/l2d", Seq(m1, m2))
    val l3 = manifestList(table, s"$table/metadata/l3d", Seq(m1, m2, m3))
    val l4 = manifestList(table, s"$table/metadata/l4d", Seq(m1, m3))
    writeMetadata(table, 4, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
      (3L, java.lang.Long.valueOf(2L), 3000L, "append", l3),
      (4L, java.lang.Long.valueOf(3L), 4000L, "delete", l4)), currentId = 4L)
    val got = IcebergReader.readChangesSince(spark, table, 1L)
      .select("id", "_snapshot_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((4L, 3L), (5L, 3L))) // f1's rows (id 3) retracted at s4
  }

  test("replace refuses when it rewrites an in-window add; pre-window-only compaction is fine") {
    import spark.implicits._
    val root = Files.createTempDirectory("icechrepl")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val f0 = dataFile(table, "d0", Seq((1L, "a")))
    val f1 = dataFile(table, "d1", Seq((2L, "b")))
    val c0 = dataFile(table, "c0", Seq((1L, "a"), (2L, "b")))
    val m1 = dataManifest(table, s"$table/metadata/m1", Seq(f0))
    val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
    val mc = dataManifest(table, s"$table/metadata/mc", Seq(c0))
    val l1 = manifestList(table, s"$table/metadata/l1", Seq(m1))
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m1, m2))
    val l3 = manifestList(table, s"$table/metadata/l3", Seq(mc)) // compacts f0+f1 → c0
    writeMetadata(table, 3, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "append", l2),
      (3L, java.lang.Long.valueOf(2L), 3000L, "replace", l3)), currentId = 3L)
    // window (1, 3]: the replace rewrote f1 (added at s2, IN-window) —
    // its rows moved into c0, which an adds-only read must skip; refuse
    val e = intercept[Exception](IcebergReader.readChangesSince(spark, table, 1L))
    assert(e.getMessage.contains("compacted away"))
    // window (2, 3]: f1 is PRE-window — the replace contributes nothing
    // and nothing in-window was lost; empty result, loudly typed
    assert(IcebergReader.readChangesSince(spark, table, 2L).count() == 0L)
  }

  test("overwrite snapshots and non-ancestor (rolled back) baselines refuse loudly") {
    val root = Files.createTempDirectory("icechow")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val f0 = dataFile(table, "d0", Seq((1L, "a")))
    val f1 = dataFile(table, "d1", Seq((2L, "b")))
    val m1 = dataManifest(table, s"$table/metadata/m1", Seq(f0))
    val m2 = dataManifest(table, s"$table/metadata/m2", Seq(f1))
    val l1 = manifestList(table, s"$table/metadata/l1", Seq(m1))
    val l2 = manifestList(table, s"$table/metadata/l2", Seq(m2))
    writeMetadata(table, 2, Seq(
      (1L, null, 1000L, "append", l1),
      (2L, java.lang.Long.valueOf(1L), 2000L, "overwrite", l2)), currentId = 2L)
    val e1 = intercept[Exception](IcebergReader.readChangesSince(spark, table, 1L))
    assert(e1.getMessage.contains("overwrite"))
    // rollback: head is s1 again; s3 exists in metadata but is not an
    // ancestor — serving "changes since s3" would need negative time
    writeMetadata(table, 3, Seq(
      (1L, null, 1000L, "append", l1),
      (3L, java.lang.Long.valueOf(1L), 3000L, "append", l2)), currentId = 1L)
    val e2 = intercept[Exception](IcebergReader.readChangesSince(spark, table, 3L))
    assert(e2.getMessage.contains("not an ancestor"))
  }

  test("registry option changesSinceSnapshot serves the eager changes read; filter composes") {
    import spark.implicits._
    val (table, _) = appendChain()
    val df = new IcebergReaderImpl().read(spark,
      DataRef("iceberg", table, Map("changesSinceSnapshot" -> "1", "filter" -> "id >= 4")))
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
  }

  test("row-level change feed over writer history: inserts, update pairs, deletes; compaction invisible") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val t = Files.createTempDirectory("icefeed").toString
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def snapId(): Long = om.readTree(IcebergReader.metadataText(
      t, spark.sparkContext.hadoopConfiguration)).get("current-snapshot-id").asLong()
    IcebergWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1), t)
    val s0 = snapId()
    IcebergWriter.write(spark, Seq((3L, "c")).toDF("id", "name").coalesce(1), t) // append
    val s1 = snapId()
    IcebergWriter.merge(spark, Seq((2L, "B"), (4L, "d")).toDF("id", "name"), t, on = Seq("id"))
    val s2 = snapId()
    assert(IcebergWriter.deleteWhere(spark, t, "id = 3") == 1L)
    val s3 = snapId()
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
      df.select(col("id"), col("name"), col("_change_type"), col("_snapshot_id"))
        .as[(Long, String, String, Long)].collect().toSet
    // full feed: creation inserts, append insert, the merge's
    // delete+insert pairs over its touched file, the delete's pair-less
    // retractions
    val full = rows(IcebergReader.readChangeFeed(spark, t, -1L))
    assert(full == Set(
      (1L, "a", "insert", s0), (2L, "b", "insert", s0),
      (3L, "c", "insert", s1),
      // merge touched the (1,2) file: both rows delete, survivors +
      // update + the new key re-insert
      (1L, "a", "delete", s2), (2L, "b", "delete", s2),
      (1L, "a", "insert", s2), (2L, "B", "insert", s2), (4L, "d", "insert", s2),
      // delete-where removed the whole (3) file: no survivors staged
      (3L, "c", "delete", s3)))
    // a bounded window sees only its own snapshots
    assert(rows(IcebergReader.readChangeFeed(spark, t, s1)).forall(r => r._4 == s2 || r._4 == s3))
    // compaction (replace) contributes nothing
    IcebergWriter.write(spark, Seq((5L, "e")).toDF("id", "name").coalesce(1), t)
    val s4 = snapId()
    IcebergWriter.compact(spark, t)
    val afterCompact = rows(IcebergReader.readChangeFeed(spark, t, s3))
    assert(afterCompact == Set((5L, "e", "insert", s4)))
    // filter + registry option route
    val reg = new IcebergReaderImpl().read(spark, DataRef("iceberg", t,
      Map("changeFeedSinceSnapshot" -> s1.toString, "filter" -> "_change_type = 'delete'")))
    assert(reg.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // empty window: typed empty frame
    val cur = snapId()
    val empty = IcebergReader.readChangeFeed(spark, t, cur)
    assert(empty.count() == 0L && empty.columns.contains("_change_type"))
    // a non-ancestor baseline refuses
    val e = intercept[Exception](IcebergReader.readChangeFeed(spark, t, 999999L))
    assert(e.getMessage.contains("not an ancestor"))
  }
}
