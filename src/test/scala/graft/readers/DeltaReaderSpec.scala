package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Spec for the native Delta log replay over fixture tables laid out
  * per the Delta transaction-log protocol: zero-padded JSON commits,
  * optional parquet checkpoint + `_last_checkpoint`, partitionValues
  * carried by `add` actions (data files omit partition columns).
  */
class DeltaReaderSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def js(s: String): String = mapper.writeValueAsString(s)

  private val schemaIdName = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))).json
  private val schemaWithDs = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("ds", DateType))).json

  private def metaAction(schema: String, partitionCols: Seq[String] = Nil,
      config: String = "{}"): String =
    s"""{"metaData":{"id":"m1","format":{"provider":"parquet","options":{}},
       |"schemaString":${js(schema)},
       |"partitionColumns":[${partitionCols.map(js).mkString(",")}],
       |"configuration":$config,"createdTime":1}}""".stripMargin.replace("\n", "")

  private def protocolAction(v: Int = 1): String =
    s"""{"protocol":{"minReaderVersion":$v,"minWriterVersion":2}}"""

  private def addAction(path: String, pv: String = "{}", extra: String = ""): String =
    s"""{"add":{"path":${js(path)},"partitionValues":$pv,"size":1,"modificationTime":1,"dataChange":true$extra}}"""

  private def removeAction(path: String): String =
    s"""{"remove":{"path":${js(path)},"deletionTimestamp":2,"dataChange":true}}"""

  private def writeCommit(table: JPath, version: Long, actions: Seq[String]): Unit = {
    val log = table.resolve("_delta_log")
    Files.createDirectories(log)
    Files.writeString(log.resolve(f"$version%020d.json"), actions.mkString("\n") + "\n")
  }

  private def writeParquetFile(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("deltapart").toString
    rows.toDF("id", "name").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  test("replays adds and removes across commits (unpartitioned)") {
    import spark.implicits._
    val t = Files.createTempDirectory("delta1")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    writeParquetFile(t, "f2.parquet", Seq((3L, "gamma")))
    writeParquetFile(t, "f3.parquet", Seq((4L, "delta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName),
      addAction("f1.parquet"), addAction("f2.parquet")))
    writeCommit(t, 1, Seq(removeAction("f2.parquet"), addAction("f3.parquet")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta"), (4L, "delta")))
  }

  test("partition values attach as typed columns from the add actions") {
    import spark.implicits._
    val t = Files.createTempDirectory("delta2")
    writeParquetFile(t, "ds=2024-01-01/f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "ds=2024-01-02/f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaWithDs, Seq("ds")),
      addAction("ds=2024-01-01/f1.parquet", """{"ds":"2024-01-01"}"""),
      addAction("ds=2024-01-02/f2.parquet", """{"ds":"2024-01-02"}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.columns.toSeq == Seq("id", "name", "ds"))
    assert(df.schema("ds").dataType == DateType)
    val got = df.selectExpr("id", "name", "cast(ds as string)")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha", "2024-01-01"), (2L, "beta", "2024-01-02")))
  }

  test("checkpoint parquet seeds the state; later commits apply on top") {
    import spark.implicits._
    val t = Files.createTempDirectory("delta3")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f2.parquet", Seq((2L, "beta")))
    val log = t.resolve("_delta_log"); Files.createDirectories(log)
    // checkpoint at version 0: metaData + protocol + one live add,
    // written through spark.read.json so the structs are real parquet
    val cpLines = Seq(
      protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")).toDS()
    val cpTmp = Files.createTempDirectory("cpw").toString
    spark.read.json(cpLines).coalesce(1).write.mode("overwrite").parquet(cpTmp + "/out")
    val cpPart = Files.list(Paths.get(cpTmp + "/out")).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    Files.copy(Paths.get(cpPart), log.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3}""")
    writeCommit(t, 1, Seq(addAction("f2.parquet")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  /** spark-written single parquet part copied to an exact destination */
  private def jsonLinesToParquet(lines: Seq[String], dest: JPath): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("j2p").toString
    spark.read.json(lines.toDS()).coalesce(1).write.mode("overwrite").parquet(tmp + "/out")
    val part = Files.list(Paths.get(tmp + "/out")).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  test("v2 uuid-named checkpoint parquet resolves sidecar file actions") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltav2cp")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f2.parquet", Seq((2L, "beta")))
    val log = t.resolve("_delta_log")
    // sidecar holds the add; the main checkpoint holds meta/protocol/sidecar
    jsonLinesToParquet(Seq(addAction("f1.parquet")), log.resolve("_sidecars/sc1.parquet"))
    jsonLinesToParquet(Seq(protocolAction(), metaAction(schemaIdName),
      """{"sidecar":{"path":"sc1.parquet","sizeInBytes":100}}"""),
      log.resolve(f"${0L}%020d.checkpoint.0a1b2c3d-1111-2222-3333-444455556666.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3}""")
    writeCommit(t, 1, Seq(addAction("f2.parquet")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("v2 json checkpoint manifest replays inline actions") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltav2cpj")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    val log = t.resolve("_delta_log"); Files.createDirectories(log)
    Files.writeString(log.resolve(f"${0L}%020d.checkpoint.0a1b2c3d-1111-2222-3333-444455556666.json"),
      Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")).mkString("\n") + "\n")
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3}""")
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().toSeq == Seq((1L, "alpha")))
  }

  test("versionAsOf replays only through the pinned commit") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltatt")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")))
    writeCommit(t, 1, Seq(removeAction("f1.parquet"), addAction("f2.parquet")))
    assert(DeltaReader.read(spark, t.toString).as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L))
      .as[(Long, String)].collect().toSeq == Seq((1L, "alpha")))
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, t.toString, versionAsOf = Some(5L)))
    assert(e.getMessage.contains("version 5"))
  }

  // ---- deletion-vector fixtures ------------------------------------

  private def z85Encode(raw: Array[Byte]): String = {
    // delta's Base85Codec zero-pads to a multiple of 4; the decoder's
    // bitmap walk is self-delimiting so the tail is ignored
    val b = if (raw.length % 4 == 0) raw else raw ++ new Array[Byte](4 - raw.length % 4)
    val alpha = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    val sb = new StringBuilder
    var i = 0
    while (i < b.length) {
      var v = 0L
      for (k <- 0 until 4) v = (v << 8) | (b(i + k) & 0xffL)
      val cs = new Array[Char](5)
      for (k <- 4 to 0 by -1) { cs(k) = alpha((v % 85).toInt); v /= 85 }
      sb.appendAll(cs); i += 4
    }
    sb.toString
  }

  /** DV payload deleting `positions` (all < 2^16): magic + roaring64
    * with one keyed roaring32 array container (PROTOCOL.md layout). */
  private def dvData(positions: Seq[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + 16 + 2 * positions.size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377).putLong(1L).putInt(0) // magic, nBitmaps, key 0
    bb.putInt(12346).putInt(1)                  // roaring32 no-run cookie, 1 container
    bb.putShort(0).putShort((positions.size - 1).toShort) // container key, card-1
    bb.putInt(16)                               // offsets table (1 entry)
    positions.sorted.foreach(p => bb.putShort(p.toShort))
    bb.array()
  }

  private def dvProtocol: String =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""

  test("inline deletion vector drops the flagged rows") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadv1")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    writeParquetFile(t, "f2.parquet", Seq((4L, "delta")))
    val data = dvData(Seq(0, 2)) // delete rows 0 and 2 of f1
    writeCommit(t, 0, Seq(dvProtocol, metaAction(schemaIdName),
      addAction("f1.parquet"), addAction("f2.parquet")))
    writeCommit(t, 1, Seq(addAction("f1.parquet", extra =
      s""","deletionVector":{"storageType":"i","pathOrInlineDv":${js(z85Encode(data))},"sizeInBytes":${data.length},"cardinality":2}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, "beta"), (4L, "delta")))
    // time travel to the pre-DV version resurrects the full file
    assert(DeltaReader.read(spark, t.toString, versionAsOf = Some(0L)).count() == 4)
  }

  test("on-disk deletion vector ('u' uuid path) verifies CRC and applies") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadv2")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val data = dvData(Seq(1))
    val uuidBytes = Array.tabulate[Byte](16)(_.toByte)
    val bbU = java.nio.ByteBuffer.wrap(uuidBytes)
    val uuid = new java.util.UUID(bbU.getLong, bbU.getLong)
    val crc = new java.util.zip.CRC32(); crc.update(data)
    val blob = java.nio.ByteBuffer.allocate(1 + 4 + data.length + 4) // version byte, BE size, data, BE crc
      .put(1.toByte).putInt(data.length).put(data).putInt(crc.getValue.toInt).array()
    Files.write(t.resolve(s"deletion_vector_$uuid.bin"), blob)
    writeCommit(t, 0, Seq(dvProtocol, metaAction(schemaIdName),
      addAction("f1.parquet", extra =
        s""","deletionVector":{"storageType":"u","pathOrInlineDv":${js(z85Encode(uuidBytes))},"offset":1,"sizeInBytes":${data.length},"cardinality":1}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (3L, "gamma")))
    // corrupt one data byte inside the blob → CRC gate refuses
    blob(7) = (blob(7) ^ 0x1).toByte
    Files.write(t.resolve(s"deletion_vector_$uuid.bin"), blob)
    val e = intercept[Exception](DeltaReader.read(spark, t.toString).count())
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(m => m.contains("delta dv"))) // refuses, never silently resurrects

  }

  // logical (id, name[, ds]) with delta.columnMapping physical names
  private def mappedSchema(withDs: Boolean): String = {
    def meta(phys: String, id: Int) = new MetadataBuilder()
      .putString("delta.columnMapping.physicalName", phys)
      .putLong("delta.columnMapping.id", id.toLong).build()
    val base = Seq(
      StructField("id", LongType, nullable = true, meta("col-aaa", 1)),
      StructField("name", StringType, nullable = true, meta("col-bbb", 2)))
    StructType(if (withDs) base :+ StructField("ds", DateType, nullable = true, meta("col-ddd", 3)) else base).json
  }

  private def writeMappedParquet(table: JPath, rel: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("deltaphys").toString
    rows.toDF("col-aaa", "col-bbb").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    val dest = table.resolve(rel)
    Files.createDirectories(dest.getParent)
    Files.copy(Paths.get(part), dest)
  }

  test("deletion vector applies inside a partitioned table's union") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadvp")
    writeParquetFile(t, "ds=2024-01-01/f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    writeParquetFile(t, "ds=2024-01-02/f2.parquet", Seq((3L, "gamma")))
    val data = dvData(Seq(0)) // delete row 0 of f1 ("alpha")
    writeCommit(t, 0, Seq(dvProtocol, metaAction(schemaWithDs, Seq("ds")),
      addAction("ds=2024-01-01/f1.parquet", """{"ds":"2024-01-01"}""", extra =
        s""","deletionVector":{"storageType":"i","pathOrInlineDv":${js(z85Encode(data))},"sizeInBytes":${data.length},"cardinality":1}"""),
      addAction("ds=2024-01-02/f2.parquet", """{"ds":"2024-01-02"}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.columns.toSeq == Seq("id", "name", "ds"))
    val got = df.selectExpr("id", "name", "cast(ds as string)")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, "beta", "2024-01-01"), (3L, "gamma", "2024-01-02")))
  }

  test("deletion vector applies to files whose paths need URI encoding") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadvsp")
    // log paths are URL-encoded; the on-disk name has a real space, and
    // _metadata.file_path reports the percent-encoded URI form — the
    // delete-side key must match that form or rows silently resurrect
    writeParquetFile(t, "part a/f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    val data = dvData(Seq(0))
    writeCommit(t, 0, Seq(dvProtocol, metaAction(schemaIdName),
      addAction("part%20a/f1.parquet", extra =
        s""","deletionVector":{"storageType":"i","pathOrInlineDv":${js(z85Encode(data))},"sizeInBytes":${data.length},"cardinality":1}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
  }

  test("incomplete multipart checkpoint refuses instead of truncating state") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltamp")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    val log = t.resolve("_delta_log")
    jsonLinesToParquet(Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")),
      log.resolve(f"${0L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")) // part 1 of 2; part 2 missing
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3,"parts":2}""")
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, t.toString))
    assert(e.getMessage.contains("incomplete"))
  }

  test("deletion vector survives the checkpoint parquet round-trip") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltadv3")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val data = dvData(Seq(1))
    val addWithDv = addAction("f1.parquet", extra =
      s""","deletionVector":{"storageType":"i","pathOrInlineDv":${js(z85Encode(data))},"sizeInBytes":${data.length},"cardinality":1}""")
    val log = t.resolve("_delta_log"); Files.createDirectories(log)
    val cpLines = Seq(dvProtocol, metaAction(schemaIdName), addWithDv).toDS()
    val cpTmp = Files.createTempDirectory("cpwdv").toString
    spark.read.json(cpLines).coalesce(1).write.mode("overwrite").parquet(cpTmp + "/out")
    val cpPart = Files.list(Paths.get(cpTmp + "/out")).toArray.map(_.toString).find(_.endsWith(".parquet")).get
    Files.copy(Paths.get(cpPart), log.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(log.resolve("_last_checkpoint"), """{"version":0,"size":3}""")
    val df = DeltaReader.read(spark, t.toString)
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (3L, "gamma")))
  }

  test("column mapping 'name' reads physical columns back under logical names") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltacm1")
    writeMappedParquet(t, "f1.parquet", Seq((1L, "alpha"), (2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(2), metaAction(mappedSchema(withDs = false),
      config = """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"2"}"""),
      addAction("f1.parquet")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(df.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "alpha"), (2L, "beta")))
  }

  test("column mapping with partitions: partitionValues keyed by physical name") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltacm2")
    writeMappedParquet(t, "part0/f1.parquet", Seq((1L, "alpha")))
    writeMappedParquet(t, "part1/f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(2), metaAction(mappedSchema(withDs = true), Seq("ds"),
      config = """{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"}"""),
      addAction("part0/f1.parquet", """{"col-ddd":"2024-01-01"}"""),
      addAction("part1/f2.parquet", """{"col-ddd":"2024-01-02"}""")))
    val df = DeltaReader.read(spark, t.toString)
    assert(df.columns.toSeq == Seq("id", "name", "ds"))
    val got = df.selectExpr("id", "name", "cast(ds as string)")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha", "2024-01-01"), (2L, "beta", "2024-01-02")))
  }

  test("unknown column mapping mode refuses loudly") {
    val t2 = Files.createTempDirectory("delta5")
    writeParquetFile(t2, "f1.parquet", Seq((1L, "alpha")))
    writeCommit(t2, 0, Seq(protocolAction(2), metaAction(schemaIdName,
      config = """{"delta.columnMapping.mode":"bogus"}"""),
      addAction("f1.parquet")))
    val e2 = intercept[IllegalArgumentException](DeltaReader.read(spark, t2.toString))
    assert(e2.getMessage.contains("column mapping"))
  }

  test("partition filter prunes non-matching files from the plan (scale contract)") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltaprune")
    writeParquetFile(t, "ds=2024-01-01/f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "ds=2024-01-02/f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaWithDs, Seq("ds")),
      addAction("ds=2024-01-01/f1.parquet", """{"ds":"2024-01-01"}"""),
      addAction("ds=2024-01-02/f2.parquet", """{"ds":"2024-01-02"}""")))
    val df = DeltaReader.read(spark, t.toString).where(col("ds") === lit("2024-01-01").cast("date"))
    // the partition value is a per-group literal, so Catalyst constant-
    // folds the filter and prunes the non-matching partition's scan
    // entirely — at 100 TB the filter never opens the other files
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("f1.parquet") || physical.contains("ds=2024-01-01"))
    assert(!physical.contains("f2.parquet") && !physical.contains("ds=2024-01-02"),
      s"pruned partition still scanned:\n$physical")
    assert(df.as[(Long, String, java.sql.Date)].collect().map(_._1).toSeq == Seq(1L))
  }

  test("timestampAsOf picks the last commit at or before the instant") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltats")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")))
    writeCommit(t, 1, Seq(removeAction("f1.parquet"), addAction("f2.parquet")))
    val log = t.resolve("_delta_log")
    java.nio.file.Files.setLastModifiedTime(log.resolve(f"${0L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(1000000L))
    java.nio.file.Files.setLastModifiedTime(log.resolve(f"${1L}%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(2000000L))
    assert(DeltaReader.readAsOfTimestamp(spark, t.toString, 1500000L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "alpha")))
    assert(DeltaReader.readAsOfTimestamp(spark, t.toString, 2000000L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "beta")))
    val e = intercept[IllegalArgumentException](
      DeltaReader.readAsOfTimestamp(spark, t.toString, 500L))
    assert(e.getMessage.contains("no commit at or before"))
    // the registry option path parses ISO instants
    val ref = graft.datatypes.DataRef("delta", t.toString,
      options = Map("timestampAsOf" -> "1970-01-01T00:25:00Z")) // 1.5e6 ms
    val viaRef = new DeltaReaderImpl().read(spark, ref)
    assert(viaRef.as[(Long, String)].collect().toSeq == Seq((1L, "alpha")))
  }

  test("a gap in the commit chain refuses instead of replaying a subset") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltagap")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f3.parquet", Seq((3L, "gamma")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")))
    writeCommit(t, 2, Seq(addAction("f3.parquet"))) // commit 1 vacuumed/lost
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, t.toString))
    assert(e.getMessage.contains("incomplete"))
  }

  test("high-cardinality partitioning switches to one scan + broadcast pv join") {
    import spark.implicits._
    val t = Files.createTempDirectory("deltahc")
    writeParquetFile(t, "ds=2024-01-01/f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "ds=2024-01-02/f2.parquet", Seq((2L, "beta")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaWithDs, Seq("ds")),
      addAction("ds=2024-01-01/f1.parquet", """{"ds":"2024-01-01"}"""),
      addAction("ds=2024-01-02/f2.parquet", """{"ds":"2024-01-02"}""")))
    val df = DeltaReader.read(spark, t.toString, maxPartitionScans = 1) // force the single-scan path
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, s"expected ONE data scan:\n$plan")
    val got = df.selectExpr("id", "name", "cast(ds as string)")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "alpha", "2024-01-01"), (2L, "beta", "2024-01-02")))
  }

  test("live-file cap refuses loudly instead of exhausting driver heap") {
    val t = Files.createTempDirectory("deltacap")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeParquetFile(t, "f2.parquet", Seq((2L, "beta")))
    writeParquetFile(t, "f3.parquet", Seq((3L, "gamma")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName),
      addAction("f1.parquet"), addAction("f2.parquet"), addAction("f3.parquet")))
    val e = intercept[IllegalArgumentException](
      DeltaReader.read(spark, t.toString, maxLiveFiles = 2))
    assert(e.getMessage.contains("connector"))
    assert(DeltaReader.read(spark, t.toString).count() == 3) // default cap reads fine
  }

  test("registered reader routes the delta kind as the importable fallback") {
    import spark.implicits._
    val t = Files.createTempDirectory("delta6")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName), addAction("f1.parquet")))
    val ref = graft.datatypes.DataRef("delta", t.toString)
    val reader = SparkReaders.recommend(ref)._1.headOption
    assert(reader.exists(_.name == "delta_native"))
    assert(reader.get.read(spark, ref).as[(Long, String)].collect().toSeq == Seq((1L, "alpha")))
  }
}
