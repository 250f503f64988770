package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths}

/** Spec for the native Iceberg metadata walk over a fixture table laid
  * out per the Iceberg table spec: versioned metadata JSON, an Avro
  * manifest list, Avro manifests with `data_file` structs, and parquet
  * data files — all written with Spark's own avro/parquet sources so
  * the bytes are independent of the reader under test.
  */
class IcebergReaderSpec extends SparkSpec {

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** Write a single-file avro dataset and return the part file's path. */
  private def writeAvro(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.format(avroFmt).save(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString)
      .find(p => p.endsWith(".avro")).get
  }

  /** Stamp `parquet.field.id` metadata so written parquet carries field
    * ids, as every real Iceberg writer does. */
  private def withFieldIds(df: org.apache.spark.sql.DataFrame, ids: Map[String, Int]): org.apache.spark.sql.DataFrame =
    df.select(df.columns.map(c => df(c).as(c,
      new org.apache.spark.sql.types.MetadataBuilder().putLong("parquet.field.id", ids(c).toLong).build())).toSeq: _*)

  /** Build a table: two parquet data files (one later marked deleted),
    * v2 metadata with two snapshots (current = latest). `posDeletes`
    * adds a position-delete parquet targeting rows of data file f1. */
  private def fixture(deleteDataFile: Boolean = false,
      posDeletes: Seq[Long] = Nil): JPath = {
    import spark.implicits._
    val root = Files.createTempDirectory("iceberg")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))

    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$table/data/f1")
    Seq((3L, "gamma")).toDF("id", "name")
      .coalesce(1).write.parquet(s"$table/data/f2")
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val (p1, p2) = (partFile(s"$table/data/f1"), partFile(s"$table/data/f2"))

    var entries = Seq(
      (1, p1, "PARQUET", 0),
      (if (deleteDataFile) 2 else 1, p2, "PARQUET", 0))
    if (posDeletes.nonEmpty) {
      // position-delete parquet: (file_path, pos) rows targeting f1
      posDeletes.map(p => (p1, p)).toDF("file_path", "pos")
        .coalesce(1).write.parquet(s"$table/data/del1")
      entries = entries :+ ((1, partFile(s"$table/data/del1"), "PARQUET", 1))
    }
    val manifestDf = entries.toDF("status", "file_path", "file_format", "content")
      .selectExpr("status", "named_struct('file_path', file_path, 'file_format', file_format, 'content', content) as data_file")
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")

    val listDf = Seq((manifestPath, 0)).toDF("manifest_path", "content")
    val listPath = writeAvro(listDf, s"$table/metadata/snap1")

    val metadata =
      s"""{
         |  "format-version": 2,
         |  "table-uuid": "11111111-2222-3333-4444-555555555555",
         |  "location": "$table",
         |  "current-snapshot-id": 77,
         |  "snapshots": [
         |    {"snapshot-id": 11, "manifest-list": "$listPath"},
         |    {"snapshot-id": 77, "manifest-list": "$listPath"}
         |  ]
         |}""".stripMargin
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"), """{"format-version":2,"current-snapshot-id":-1,"snapshots":[]}""")
    Files.writeString(Paths.get(s"$table/metadata/v2.metadata.json"), metadata)
    root
  }

  test("reads the current snapshot's live parquet files via the metadata walk") {
    import spark.implicits._
    val table = fixture()
    val df = IcebergReader.read(spark, table.toString)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("DELETED manifest entries (status 2) drop their data files") {
    import spark.implicits._
    val table = fixture(deleteDataFile = true)
    val df = IcebergReader.read(spark, table.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("position deletes drop exactly the (file, pos) rows via the metadata anti-join") {
    import spark.implicits._
    val table = fixture(posDeletes = Seq(0L)) // drop row 0 of f1 = "alpha"
    val df = IcebergReader.read(spark, table.toString)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "beta"), (3L, "gamma")))
  }

  test("equality deletes honor sequence-number ordering") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergeq")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    // f1 @ seq 1 holds (1,alpha),(2,beta); f2 @ seq 3 holds (2,beta2),(3,gamma);
    // the delete @ seq 2 on id=2 removes beta (seq 1 < 2) but NOT beta2 (seq 3 > 2)
    val ids = Map("id" -> 1, "name" -> 2)
    withFieldIds(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/f1")
    withFieldIds(Seq((2L, "beta2"), (3L, "gamma")).toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/f2")
    withFieldIds(Seq(Tuple1(2L)).toDF("id"), Map("id" -> 1))
      .coalesce(1).write.parquet(s"$table/data/eqdel")
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val entries = Seq(
      (1, partFile(s"$table/data/f1"), "PARQUET", 0, 1L, null.asInstanceOf[Array[Int]]),
      (1, partFile(s"$table/data/f2"), "PARQUET", 0, 3L, null.asInstanceOf[Array[Int]]),
      (1, partFile(s"$table/data/eqdel"), "PARQUET", 2, 2L, Array(1)))
    val manifestDf = entries
      .toDF("status", "file_path", "file_format", "content", "sequence_number", "eq_ids")
      .selectExpr("status", "sequence_number",
        "named_struct('file_path', file_path, 'file_format', file_format, 'content', content, 'equality_ids', eq_ids) as data_file")
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
    assert(df.as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq ==
      Seq((1L, "alpha"), (2L, "beta2"), (3L, "gamma")))
  }

  test("mixed parquet+orc data files union; position delete hits the orc side") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergorc")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    Seq((1L, "alpha")).toDF("id", "name").coalesce(1).write.parquet(s"$table/data/f1")
    Seq((2L, "beta"), (3L, "gamma")).toDF("id", "name").coalesce(1).write.orc(s"$table/data/f2")
    def partFile(dir: String, ext: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(ext)).get
    val orcPath = partFile(s"$table/data/f2", ".orc")
    Seq((orcPath, 0L)).toDF("file_path", "pos").coalesce(1).write.parquet(s"$table/data/del1")
    def writeMeta(withPosDelete: Boolean): Unit = {
      val entries = Seq(
        (1, partFile(s"$table/data/f1", ".parquet"), "PARQUET", 0),
        (1, orcPath, "ORC", 0)) ++
        (if (withPosDelete) Seq((1, partFile(s"$table/data/del1", ".parquet"), "PARQUET", 1)) else Nil)
      val manifestDf = entries.toDF("status", "file_path", "file_format", "content")
        .selectExpr("status", "named_struct('file_path', file_path, 'file_format', file_format, 'content', content) as data_file")
      val tag = if (withPosDelete) "pd" else "plain"
      val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest_$tag")
      val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap_$tag")
      Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
        s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
           |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    }
    writeMeta(withPosDelete = false)
    val df = IcebergReader.read(spark, table)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // position deletes cannot key ORC rows (no row_index metadata):
    // the combination must refuse, never silently resurrect
    writeMeta(withPosDelete = true)
    val e = intercept[IllegalArgumentException](IcebergReader.read(spark, table))
    assert(e.getMessage.contains("ORC"))
  }

  test("null entry sequence numbers inherit from the manifest list (spec inheritance)") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergseq")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2)
    // f1 rides a manifest whose LIST seq is 1; f2 rides one at seq 3;
    // the delete (id=2) rides one at seq 2 — all three entries store
    // sequence_number NULL, the normal Avro encoding for ADDED entries
    withFieldIds(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/f1")
    withFieldIds(Seq((2L, "beta2"), (3L, "gamma")).toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/f2")
    withFieldIds(Seq(Tuple1(2L)).toDF("id"), Map("id" -> 1))
      .coalesce(1).write.parquet(s"$table/data/eqdel")
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    def manifest(dir: String, path: String, content: Int, eqIds: Option[Seq[Int]]): String = {
      val df = Seq((1, path, "PARQUET", content, Option.empty[Long], eqIds))
        .toDF("status", "file_path", "file_format", "content", "sequence_number", "eq_ids")
        .selectExpr("status", "sequence_number",
          "named_struct('file_path', file_path, 'file_format', file_format, 'content', content, 'equality_ids', eq_ids) as data_file")
      writeAvro(df, dir)
    }
    val m1 = manifest(s"$table/metadata/m1", partFile(s"$table/data/f1"), 0, None)
    val m2 = manifest(s"$table/metadata/m2", partFile(s"$table/data/f2"), 0, None)
    val m3 = manifest(s"$table/metadata/m3", partFile(s"$table/data/eqdel"), 2, Some(Seq(1)))
    val listPath = writeAvro(Seq((m1, 0, 1L), (m2, 0, 3L), (m3, 1, 2L))
      .toDF("manifest_path", "content", "sequence_number"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table)
    // delete @ inherited seq 2 removes beta (f1 @ inherited 1) but NOT
    // beta2 (f2 @ inherited 3)
    assert(df.as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq ==
      Seq((1L, "alpha"), (2L, "beta2"), (3L, "gamma")))
  }

  test("schema evolution: renames resolve by field id; added columns null on old files") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergevo")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    // f1 written under the ORIGINAL schema (id, label); the table then
    // renames label→title (same field id 2) and adds score (id 3); f2
    // written under the new schema. A by-name read would null 'title'
    // for every f1 row — field-id resolution recovers it.
    withFieldIds(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "label"), Map("id" -> 1, "label" -> 2))
      .coalesce(1).write.parquet(s"$table/data/f1")
    withFieldIds(Seq((3L, "gamma", 0.5)).toDF("id", "title", "score"),
      Map("id" -> 1, "title" -> 2, "score" -> 3))
      .coalesce(1).write.parquet(s"$table/data/f2")
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val manifestDf = Seq(
      (1, partFile(s"$table/data/f1"), "PARQUET", 0),
      (1, partFile(s"$table/data/f2"), "PARQUET", 0))
      .toDF("status", "file_path", "file_format", "content")
      .selectExpr("status", "named_struct('file_path', file_path, 'file_format', file_format, 'content', content) as data_file")
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 1,
         |  "schemas": [
         |    {"schema-id": 0, "fields": [
         |      {"id": 1, "name": "id", "type": "long"},
         |      {"id": 2, "name": "label", "type": "string"}]},
         |    {"schema-id": 1, "fields": [
         |      {"id": 1, "name": "id", "type": "long"},
         |      {"id": 2, "name": "title", "type": "string"},
         |      {"id": 3, "name": "score", "type": "double"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table)
    assert(df.columns.toSeq == Seq("id", "title", "score"))
    val got = df.as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "alpha", None), (2L, "beta", None), (3L, "gamma", Some(0.5))))

    // field-id resolution is SCOPED to the reader's session clone: the
    // caller session's conf is untouched, and a plain parquet read on
    // the caller session with a field-id-bearing requested schema still
    // resolves BY NAME (f1 has no column 'title' → nulls), while the
    // Iceberg frame above recovered the rename through its clone.
    assert(spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled").forall(_ == "false"))
    val byNameSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType,
        nullable = true, new org.apache.spark.sql.types.MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      org.apache.spark.sql.types.StructField("title", org.apache.spark.sql.types.StringType,
        nullable = true, new org.apache.spark.sql.types.MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    val plain = spark.read.schema(byNameSchema).parquet(partFile(s"$table/data/f1"))
    assert(plain.where(org.apache.spark.sql.functions.col("title").isNotNull).count() == 0)
    // ...and the returned frame belongs to the CALLER session: temp
    // views registered on it are visible to the caller's spark.sql
    df.createOrReplaceTempView("iceberg_evo_view")
    assert(spark.sql("SELECT title FROM iceberg_evo_view WHERE title IS NOT NULL").count() == 3)
  }

  test("snapshotId pins a referenced snapshot; unknown ids error") {
    val table = fixture()
    assert(IcebergReader.read(spark, table.toString, snapshotId = Some(11L)).count() == 3)
    val e = intercept[IllegalArgumentException](
      IcebergReader.read(spark, table.toString, snapshotId = Some(99L)))
    assert(e.getMessage.contains("99"))
  }

  test("timestampAsOf follows snapshot-log; staged snapshots are never returned") {
    val table = fixture().toString
    // re-stamp the metadata: snapshot timestamps, a STAGED snapshot 99
    // (in `snapshots`, with the newest timestamp, absent from
    // snapshot-log — the WAP/rollback shape), and the history log
    val meta = Files.readString(Paths.get(s"$table/metadata/v2.metadata.json"))
      .replace("""{"snapshot-id": 11,""", """{"snapshot-id": 11, "timestamp-ms": 1000,""")
      .replace("""{"snapshot-id": 77,""", """{"snapshot-id": 99, "timestamp-ms": 3000, "manifest-list": "/nonexistent-staged"},
                 |    {"snapshot-id": 77, "timestamp-ms": 2000,""".stripMargin)
      .replace("""  "snapshots": [""",
        """  "snapshot-log": [
          |    {"snapshot-id": 11, "timestamp-ms": 1000},
          |    {"snapshot-id": 77, "timestamp-ms": 2000}
          |  ],
          |  "snapshots": [""".stripMargin)
    Files.writeString(Paths.get(s"$table/metadata/v2.metadata.json"), meta)
    assert(IcebergReader.readAsOfTimestamp(spark, table, 1500L).count() == 3) // snapshot 11
    // staged snapshot 99 has the max timestamp but is NOT history: the
    // as-of read must return 77, never the unpublished snapshot
    assert(IcebergReader.readAsOfTimestamp(spark, table, 5000L).count() == 3) // snapshot 77
    val e = intercept[IllegalArgumentException](IcebergReader.readAsOfTimestamp(spark, table, 500L))
    assert(e.getMessage.contains("no snapshot at or before"))
  }

  test("name mapping without a schema in the metadata refuses loudly") {
    // the fixture's metadata carries no schema node, so the mapping has
    // nothing to resolve field ids against — refuse, don't guess
    val table = fixture().toString
    val meta = Files.readString(Paths.get(s"$table/metadata/v2.metadata.json"))
      .replace("""  "current-snapshot-id": 77,""",
        """  "current-snapshot-id": 77,
          |  "properties": {"schema.name-mapping.default": "[{\"field-id\": 1, \"names\": [\"id\"]}]"},""".stripMargin)
    Files.writeString(Paths.get(s"$table/metadata/v2.metadata.json"), meta)
    val e = intercept[IllegalArgumentException](IcebergReader.read(spark, table))
    assert(e.getMessage.contains("name-mapping"))
  }

  /** Table whose current schema is (id:1, title:2) with a name mapping
    * listing historical aliases; data files per `files` as
    * (dirName, columns, withIds, rows). */
  private def nameMappedTable(files: Seq[(String, Seq[String], Boolean, Seq[(Long, String)])],
      mappingJson: String): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergnm")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val entries = files.map { case (dir, cols, withIds, rows) =>
      val df0 = rows.toDF(cols: _*)
      val df = if (withIds) withFieldIds(df0, cols.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap) else df0
      df.coalesce(1).write.parquet(s"$table/data/$dir")
      (1, Files.list(Paths.get(s"$table/data/$dir")).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get, "PARQUET", 0)
    }
    val manifestDf = entries.toDF("status", "file_path", "file_format", "content")
      .selectExpr("status", "named_struct('file_path', file_path, 'file_format', file_format, 'content', content) as data_file")
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"), s"$table/metadata/snap1")
    val mappingEsc = mappingJson.replace("\"", "\\\"")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "title", "type": "string"}]}],
         |  "properties": {"schema.name-mapping.default": "$mappingEsc"},
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    table
  }

  test("name mapping resolves id-less imported files, per alias era") {
    import spark.implicits._
    // f1: Hive-import era, NO field ids, original column name `label`;
    // f2: a different id-less era using alias `old_title`; f3: written
    // by a real Iceberg writer WITH ids under the current names. The
    // mapping must route each era's column into `title`.
    val table = nameMappedTable(
      Seq(
        ("f1", Seq("id", "label"), false, Seq((1L, "alpha"))),
        ("f2", Seq("id", "old_title"), false, Seq((2L, "beta"))),
        ("f3", Seq("id", "title"), true, Seq((3L, "gamma")))),
      """[{"field-id": 1, "names": ["id"]}, {"field-id": 2, "names": ["label", "old_title", "title"]}]""")
    val df = IcebergReader.read(spark, table)
    assert(df.columns.toSeq == Seq("id", "title"))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    // a filter composes with the mapping (footer scan + residual apply)
    val filtered = IcebergReader.read(spark, table, filter = Some("id >= 2"))
    assert(filtered.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "beta"), (3L, "gamma")))
  }

  test("an unmapped field reads NULL, never a coincidentally-named column") {
    import spark.implicits._
    // the id-less file HAS a column literally named `title`, but the
    // mapping for field 2 lists only `label` — per the spec's projection
    // rule the field must read null, not the unrelated same-named data
    val table = nameMappedTable(
      Seq(("f1", Seq("id", "title"), false, Seq((1L, "IMPOSTOR")))),
      """[{"field-id": 1, "names": ["id"]}, {"field-id": 2, "names": ["label"]}]""")
    val got = IcebergReader.read(spark, table)
      .as[(Long, Option[String])].collect().toSeq
    assert(got == Seq((1L, None)))
  }

  test("an id-less file matching neither ids nor mapping refuses loudly") {
    val table = nameMappedTable(
      Seq(("f1", Seq("foo", "bar"), false, Seq((1L, "alpha")))),
      """[{"field-id": 1, "names": ["id"]}, {"field-id": 2, "names": ["label"]}]""")
    val e = intercept[Exception](IcebergReader.read(spark, table).count())
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("matches neither ids nor mapping")))
  }

  test("v1 data manifests mix with v2 delete manifests after an upgrade") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergmix")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/data"))
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val ids = Map("id" -> 1, "name" -> 2)
    withFieldIds(Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name"), ids)
      .coalesce(1).write.parquet(s"$table/data/f1")
    withFieldIds(Seq(Tuple1(1L)).toDF("id"), Map("id" -> 1))
      .coalesce(1).write.parquet(s"$table/data/eqdel")
    def partFile(dir: String): String =
      Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    // pre-upgrade v1 data manifest: NO entry sequence_number, NO
    // data_file.content, NO equality_ids columns at all
    val v1Manifest = writeAvro(
      Seq((1, partFile(s"$table/data/f1"), "PARQUET")).toDF("status", "file_path", "file_format")
        .selectExpr("status", "named_struct('file_path', file_path, 'file_format', file_format) as data_file"),
      s"$table/metadata/m_v1")
    // post-upgrade v2 delete manifest (content + equality_ids + seq)
    val v2Delete = writeAvro(
      Seq((1, partFile(s"$table/data/eqdel"), "PARQUET", 2, 2L, Array(1)))
        .toDF("status", "file_path", "file_format", "content", "sequence_number", "eq_ids")
        .selectExpr("status", "sequence_number",
          "named_struct('file_path', file_path, 'file_format', file_format, 'content', content, 'equality_ids', eq_ids) as data_file"),
      s"$table/metadata/m_v2del")
    val listPath = writeAvro(Seq((v1Manifest, 0, Option.empty[Long]), (v2Delete, 1, Some(2L)))
      .toDF("manifest_path", "content", "sequence_number"), s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    // the v1 data file (inherited seq 0 < delete seq 2) loses id=1;
    // a mixed-schema single read would have misclassified instead
    val df = IcebergReader.read(spark, table)
    assert(df.as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
  }

  test("manifest-entry cap refuses loudly before collecting driver state") {
    val table = fixture()
    val e = intercept[IllegalArgumentException](
      IcebergReader.read(spark, table.toString, maxManifestEntries = 1L)) // fixture manifest has 2 entries
    assert(e.getMessage.contains("connector"))
    assert(IcebergReader.read(spark, table.toString).count() == 3) // default cap reads fine
  }

  test("version-hint.text pins the metadata version") {
    val table = fixture()
    // hint at v1 (the empty table) → no current snapshot
    Files.writeString(Paths.get(s"$table/metadata/version-hint.text"), "1")
    val e = intercept[IllegalArgumentException](IcebergReader.read(spark, table.toString))
    assert(e.getMessage.contains("no current snapshot"))
    Files.writeString(Paths.get(s"$table/metadata/version-hint.text"), "2")
    assert(IcebergReader.read(spark, table.toString).count() == 3)
  }

  test("filters push down to the parquet scan (scale contract)") {
    val table = fixture()
    val df = IcebergReader.read(spark, table.toString).where("id > 2")
    val physical = df.queryExecution.executedPlan.toString
    // the native walk must hand Catalyst a plain parquet relation:
    // predicate pushdown reaching the scan is what keeps a 100 TB read
    // from materializing rows the filter would drop
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"filter did not reach the scan:\n$physical")
    assert(df.count() == 1)
  }

  test("registered reader routes the iceberg kind and detection classifies it") {
    val table = fixture()
    val ref = graft.datatypes.DataRef("iceberg", table.toString)
    val reader = SparkReaders.recommend(ref)._1.headOption
    assert(reader.exists(_.name == "iceberg_native"))
    assert(reader.get.read(spark, ref).count() == 3)
  }
}
