package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Path => JPath, Paths}
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

  test("deletion vectors and column mapping refuse loudly") {
    val t = Files.createTempDirectory("delta4")
    writeParquetFile(t, "f1.parquet", Seq((1L, "alpha")))
    writeCommit(t, 0, Seq(protocolAction(), metaAction(schemaIdName),
      addAction("f1.parquet", extra = ""","deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":1,"cardinality":1}""")))
    val e = intercept[IllegalArgumentException](DeltaReader.read(spark, t.toString))
    assert(e.getMessage.contains("deletion vector"))

    val t2 = Files.createTempDirectory("delta5")
    writeParquetFile(t2, "f1.parquet", Seq((1L, "alpha")))
    writeCommit(t2, 0, Seq(protocolAction(2), metaAction(schemaIdName,
      config = """{"delta.columnMapping.mode":"name"}"""),
      addAction("f1.parquet")))
    val e2 = intercept[IllegalArgumentException](DeltaReader.read(spark, t2.toString))
    assert(e2.getMessage.contains("column mapping"))
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
