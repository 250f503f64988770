package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.types._

/** `DeltaReader.readChangeFeed`: the row-level change feed
  * (delta-spark `table_changes` surface) — cdc-action commits serve
  * their change files verbatim; cdc-less commits derive insert/delete
  * from dataChange=true adds/removes; OPTIMIZE contributes nothing;
  * the unservable shapes (DVs without cdc, vacuumed removes, schema
  * evolution mid-window, tuple-less partitioned removes) refuse loudly
  * naming a re-baseline.
  */
class DeltaChangeFeedSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  private val schemaJson = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))).json
  private def metaAction(schema: String = schemaJson, partitionCols: Seq[String] = Nil): String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schema)},
       |"partitionColumns":[${partitionCols.map(js).mkString(",")}],
       |"configuration":{},"createdTime":1}}""".stripMargin.replace("\n", "")
  private def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
  private def addAction(path: String, pv: String = "{}", dataChange: Boolean = true,
      dv: Boolean = false): String =
    s"""{"add":{"path":${js(path)},"partitionValues":$pv,"size":1,"modificationTime":1,""" +
      s""""dataChange":$dataChange${if (dv)
        ""","deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}"""
      else ""}}}"""
  private def removeAction(path: String, dataChange: Boolean = true,
      pv: Option[String] = Some("{}")): String =
    s"""{"remove":{"path":${js(path)},"deletionTimestamp":1,"dataChange":$dataChange""" +
      pv.map(p => s""","partitionValues":$p""").getOrElse("") + "}}"
  private def cdcAction(path: String, pv: String = "{}"): String =
    s"""{"cdc":{"path":${js(path)},"partitionValues":$pv,"size":1,"dataChange":false}}"""
  private def commitInfo(tsMs: Long): String =
    s"""{"commitInfo":{"timestamp":$tsMs,"operation":"WRITE"}}"""
  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }
  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit =
    writeFrame(table, rel) { import spark.implicits._; rows.toDF("id", "name") }
  private def writeCdcFile(table: JPath, rel: String, rows: Seq[(Long, String, String)]): Unit =
    writeFrame(table, rel) { import spark.implicits._; rows.toDF("id", "name", "_change_type") }
  private def writeFrame(table: JPath, rel: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
    val tmp = Files.createTempDirectory("cdfparts").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }
  private def feedRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] = {
    import spark.implicits._
    df.select("id", "_change_type", "_commit_version").as[(Long, String, Long)].collect().toSeq
  }

  test("derive path over writer history: creates/appends insert, overwrite is delete+insert, OPTIMIZE is invisible") {
    import spark.implicits._
    val t = Files.createTempDirectory("cdfwriter").toString
    DeltaWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t) // v0
    DeltaWriter.write(spark, Seq((3L, "c")).toDF("id", "name"), t)            // v1
    DeltaWriter.write(spark, Seq((9L, "z")).toDF("id", "name"), t, mode = "overwrite") // v2
    val full = DeltaReader.readChangeFeed(spark, t, -1L)
    assert(full.columns.toSeq ==
      Seq("id", "name", "_change_type", "_commit_version", "_commit_timestamp"))
    assert(feedRows(full).sortBy(r => (r._3, r._2, r._1)) == Seq(
      (1L, "insert", 0L), (2L, "insert", 0L), (3L, "insert", 1L),
      (1L, "delete", 2L), (2L, "delete", 2L), (3L, "delete", 2L), (9L, "insert", 2L))
      .sortBy(r => (r._3, r._2, r._1)))
    // a later window sees only its own commits
    assert(feedRows(DeltaReader.readChangeFeed(spark, t, 1L)).toSet ==
      Set((1L, "delete", 2L), (2L, "delete", 2L), (3L, "delete", 2L), (9L, "insert", 2L)))
    // OPTIMIZE inside the window contributes nothing (dataChange=false
    // both sides) — where the adds-only readChangesSince must refuse
    DeltaWriter.write(spark, Seq((10L, "y")).toDF("id", "name"), t) // v3
    DeltaWriter.compact(spark, t)                                    // v4
    assert(feedRows(DeltaReader.readChangeFeed(spark, t, 2L)) == Seq((10L, "insert", 3L)))
    // empty window: typed empty frame
    val empty = DeltaReader.readChangeFeed(spark, t, 4L)
    assert(empty.count() == 0L && empty.columns.contains("_change_type"))
  }

  test("a cdc-action commit serves its change files verbatim and its add/remove actions are not derived") {
    val t = Files.createTempDirectory("cdfcdc")
    writeParquetFile(t, "f0.parquet", Seq((1L, "a")))
    writeCdcFile(t, "_change_data/c1.parquet",
      Seq((1L, "a", "update_preimage"), (1L, "a2", "update_postimage")))
    writeCommit(t, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    // the commit's add/remove point at NONEXISTENT files: deriving
    // instead of serving the cdc files would fail loudly at scan
    writeCommit(t, 1, Seq(commitInfo(1700000001000L),
      cdcAction("_change_data/c1.parquet"),
      removeAction("f0.parquet"), addAction("DOES_NOT_EXIST.parquet")))
    val feed = DeltaReader.readChangeFeed(spark, t.toString, 0L)
    import spark.implicits._
    assert(feed.select("id", "name", "_change_type").as[(Long, String, String)].collect().toSet ==
      Set((1L, "a", "update_preimage"), (1L, "a2", "update_postimage")))
    assert(feed.select("_commit_version").distinct().as[Long].collect().toSeq == Seq(1L))
  }

  test("partitioned tables: derived deletes carry the writer's remove partitionValues; replaceWhere scopes the feed") {
    import spark.implicits._
    val t = Files.createTempDirectory("cdfpart").toString
    DeltaWriter.write(spark, Seq((1L, 1), (2L, 2)).toDF("id", "p"), t,
      partitionBy = Seq("p"))                                              // v0
    DeltaWriter.write(spark, Seq((9L, 1)).toDF("id", "p"), t,
      mode = "overwrite", replaceWhere = Some("p = 1"))                    // v1
    val feed = DeltaReader.readChangeFeed(spark, t, 0L)
    val got = feed.select("id", "p", "_change_type").as[(Long, Int, String)].collect().toSet
    // only p=1 was replaced: its old row deletes (tuple attached from
    // the remove's partitionValues), the new row inserts; p=2 untouched
    assert(got == Set((1L, 1, "delete"), (9L, 1, "insert")))
  }

  test("unservable shapes refuse loudly: DVs without cdc, vacuumed removes, schema evolution, tuple-less partitioned removes") {
    // a deletion vector on a cdc-less commit
    val t1 = Files.createTempDirectory("cdfdv")
    writeParquetFile(t1, "f0.parquet", Seq((1L, "a")))
    writeCommit(t1, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    writeCommit(t1, 1, Seq(commitInfo(2), addAction("f0.parquet", dv = true)))
    val e1 = intercept[Exception](DeltaReader.readChangeFeed(spark, t1.toString, 0L))
    assert(e1.getMessage.contains("deletion vector"))
    // a remove whose file was vacuumed
    val t2 = Files.createTempDirectory("cdfvac")
    writeParquetFile(t2, "f0.parquet", Seq((1L, "a")))
    writeCommit(t2, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    writeCommit(t2, 1, Seq(commitInfo(2), removeAction("GONE.parquet")))
    val e2 = intercept[Exception](DeltaReader.readChangeFeed(spark, t2.toString, 0L))
    assert(e2.getMessage.contains("vacuumed"))
    // a metaData action mid-window that differs from the head state
    val t3 = Files.createTempDirectory("cdfmeta")
    writeParquetFile(t3, "f0.parquet", Seq((1L, "a")))
    val otherSchema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("extra", LongType))).json
    writeCommit(t3, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    writeCommit(t3, 1, Seq(commitInfo(2), metaAction(schema = otherSchema)))
    writeCommit(t3, 2, Seq(commitInfo(3), metaAction())) // restored at head
    val e3 = intercept[Exception](DeltaReader.readChangeFeed(spark, t3.toString, -1L))
    assert(e3.getMessage.contains("metadata"))
    // …but the creation commit's own metaData (== head) is fine
    val t4 = Files.createTempDirectory("cdfcreate")
    writeParquetFile(t4, "f0.parquet", Seq((1L, "a")))
    writeCommit(t4, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    assert(feedRows(DeltaReader.readChangeFeed(spark, t4.toString, -1L)) ==
      Seq((1L, "insert", 0L)))
    // a partitioned remove without partitionValues
    val t5 = Files.createTempDirectory("cdfnopv")
    val partSchema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("p", IntegerType))).json
    writeParquetFile(t5, "f0.parquet", Seq((1L, "a")))
    writeParquetFile(t5, "f1.parquet", Seq((2L, "b")))
    writeCommit(t5, 0, Seq(protocolAction,
      metaAction(schema = partSchema, partitionCols = Seq("p")),
      addAction("f0.parquet", pv = """{"p":"1"}"""),
      addAction("f1.parquet", pv = """{"p":"2"}""")))
    writeCommit(t5, 1, Seq(commitInfo(2), removeAction("f0.parquet", pv = None)))
    val e5 = intercept[Exception](DeltaReader.readChangeFeed(spark, t5.toString, 0L))
    assert(e5.getMessage.contains("partitionValues"))
    // …and an EMPTY tuple is just as unrecoverable as a missing one —
    // deriving would emit the deletes into the (null) partition
    val t6 = Files.createTempDirectory("cdfemptypv")
    writeParquetFile(t6, "f0.parquet", Seq((1L, "a")))
    writeParquetFile(t6, "f1.parquet", Seq((2L, "b")))
    writeCommit(t6, 0, Seq(protocolAction,
      metaAction(schema = partSchema, partitionCols = Seq("p")),
      addAction("f0.parquet", pv = """{"p":"1"}"""),
      addAction("f1.parquet", pv = """{"p":"2"}""")))
    writeCommit(t6, 1, Seq(commitInfo(2), removeAction("f0.parquet", pv = Some("{}"))))
    val e6 = intercept[Exception](DeltaReader.readChangeFeed(spark, t6.toString, 0L))
    assert(e6.getMessage.contains("partitionValues"))
  }

  test("a column-mapping RENAME mid-window serves under the head names; a drop still refuses") {
    import spark.implicits._
    def mMeta(phys: String, id: Int) = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    def mappedSchema(nameCol: String): String = StructType(Seq(
      StructField("id", LongType, nullable = true, mMeta("col-aaa", 1)),
      StructField(nameCol, StringType, nullable = true, mMeta("col-bbb", 2)))).json
    def mappedMeta(nameCol: String): String =
      s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${js(mappedSchema(nameCol))},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1}}"""
    def writePhys(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit =
      writeFrame(table, rel) {
        import spark.implicits._; rows.toDF("col-aaa", "col-bbb")
      }
    val t = Files.createTempDirectory("cdfrename")
    writePhys(t, "f0.parquet", Seq((1L, "a")))
    writeCommit(t, 0, Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      mappedMeta("name"), addAction("f0.parquet")))
    writePhys(t, "f1.parquet", Seq((2L, "b")))
    writeCommit(t, 1, Seq(commitInfo(2), addAction("f1.parquet")))
    // v2 RENAMES name -> label (same physical name + id); v3 adds more
    writeCommit(t, 2, Seq(commitInfo(3), mappedMeta("label")))
    writePhys(t, "f2.parquet", Seq((3L, "c")))
    writeCommit(t, 3, Seq(commitInfo(4), addAction("f2.parquet")))
    val feed = DeltaReader.readChangeFeed(spark, t.toString, -1L)
    assert(feed.columns.take(2).toSeq == Seq("id", "label"))
    assert(feed.select("id", "label", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet ==
      Set((1L, "a", "insert", 0L), (2L, "b", "insert", 1L), (3L, "c", "insert", 3L)))
    // the rename AFTER a bounded window end is additive under the same
    // identity — the (−1, 1] window serves too
    assert(DeltaReader.readChangeFeed(spark, t.toString, -1L, endVersion = Some(1L))
      .count() == 2L)
    // a DROP under mapping changes the field-id layout — still refuses
    val dropped = StructType(Seq(
      StructField("id", LongType, nullable = true, mMeta("col-aaa", 1)))).json
    writeCommit(t, 4, Seq(commitInfo(5),
      s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${js(dropped)},"partitionColumns":[],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1}}"""))
    val e = intercept[Exception](DeltaReader.readChangeFeed(spark, t.toString, -1L))
    assert(e.getMessage.contains("metadata"))
  }

  test("non-additive evolution AFTER endVersion refuses; additive post-end evolution serves with nulled columns") {
    // the bounded feed serves under the HEAD schema, so a post-end
    // schema REPLACEMENT (outside the in-window gate's reach) must
    // refuse — old files would come back with retyped/dropped columns
    // silently nulled instead
    val t1 = Files.createTempDirectory("cdfpostend")
    writeParquetFile(t1, "f0.parquet", Seq((1L, "a")))
    writeCommit(t1, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    writeParquetFile(t1, "f1.parquet", Seq((2L, "b")))
    writeCommit(t1, 1, Seq(commitInfo(2), addAction("f1.parquet")))
    val retyped = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType))).json
    writeCommit(t1, 2, Seq(commitInfo(3), metaAction(schema = retyped)))
    val e = intercept[Exception](
      DeltaReader.readChangeFeed(spark, t1.toString, 0L, endVersion = Some(1L)))
    assert(e.getMessage.contains("after the window end"))
    // ...but ADDITIVE post-end evolution (appended nullable column) is
    // delta's own old-file semantics: the window serves under the head
    // schema with the appended column nulled
    val t2 = Files.createTempDirectory("cdfpostendok")
    writeParquetFile(t2, "f0.parquet", Seq((1L, "a")))
    writeCommit(t2, 0, Seq(protocolAction, metaAction(), addAction("f0.parquet")))
    writeParquetFile(t2, "f1.parquet", Seq((2L, "b")))
    writeCommit(t2, 1, Seq(commitInfo(2), addAction("f1.parquet")))
    val widened = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("extra", LongType))).json
    writeCommit(t2, 2, Seq(commitInfo(3), metaAction(schema = widened)))
    val feed = DeltaReader.readChangeFeed(spark, t2.toString, 0L, endVersion = Some(1L))
    assert(feed.columns.toSeq == Seq("id", "name", "extra",
      "_change_type", "_commit_version", "_commit_timestamp"))
    import spark.implicits._
    assert(feed.select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq == Seq((2L, "insert", 1L)))
    assert(feed.select("extra").as[Option[Long]].collect().toSeq == Seq(None))
  }

  test("registry option changeFeedSince routes a DataRef read through the feed; endVersion bounds it") {
    import spark.implicits._
    val t = Files.createTempDirectory("cdfreg").toString
    DeltaWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    DeltaWriter.write(spark, Seq((2L, "b")).toDF("id", "name"), t)
    DeltaWriter.write(spark, Seq((3L, "c")).toDF("id", "name"), t)
    val df = new DeltaReaderImpl().read(spark,
      DataRef("delta", t, Map("changeFeedSince" -> "0", "filter" -> "id = 2")))
    assert(feedRows(df) == Seq((2L, "insert", 1L)))
    // a bounded window (0, 1] excludes version 2's insert
    val bounded = new DeltaReaderImpl().read(spark,
      DataRef("delta", t, Map("changeFeedSince" -> "0", "changeFeedEnd" -> "1")))
    assert(feedRows(bounded) == Seq((2L, "insert", 1L)))
    val e = intercept[Exception](DeltaReader.readChangeFeed(spark, t, 0L,
      endVersion = Some(99L)).count())
    assert(e.getMessage.contains("outside the log"))
  }
}
