package graft.readers

import graft.SparkSpec
import java.nio.file.Files

/** Native Iceberg writer (unpartitioned append/overwrite profile):
  * round-trips through the native reader, time travel, changes reads
  * and the graft-iceberg stream; profile gates refuse loudly.
  */
class IcebergWriterSpec extends SparkSpec {

  test("create + append + overwrite round-trip; snapshots chain for time travel and changes") {
    import spark.implicits._
    val t = Files.createTempDirectory("iw").toString
    IcebergWriter.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"), t)
    assert(IcebergReader.read(spark, t).count() == 2L)
    IcebergWriter.write(spark, Seq((3L, "c")).toDF("id", "name"), t)
    val got = IcebergReader.read(spark, t).select("id", "name")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // snapshot time travel back to the first write
    val conf = spark.sparkContext.hadoopConfiguration
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(IcebergReader.metadataText(t, conf))
    import scala.jdk.CollectionConverters._
    val snapIds = meta.get("snapshots").elements().asScala
      .map(_.get("snapshot-id").asLong()).toSeq
    assert(snapIds.size == 2)
    assert(IcebergReader.read(spark, t, snapshotId = Some(snapIds.head)).count() == 2L)
    // incremental changes since the first snapshot: only the append
    val ch = IcebergReader.readChangesSince(spark, t, snapIds.head)
    assert(ch.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(3L))
    // overwrite resets the table to the new frame
    IcebergWriter.write(spark, Seq((9L, "z")).toDF("id", "name"), t, mode = "overwrite")
    assert(IcebergReader.read(spark, t).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSeq == Seq(9L))
    val e = intercept[Exception](IcebergWriter.write(spark,
      Seq((1L, "x")).toDF("id", "name"), t, mode = "errorifexists"))
    assert(e.getMessage.contains("already exists"))
  }

  test("the graft-iceberg stream tails a written table across appends") {
    import spark.implicits._
    val t = Files.createTempDirectory("iwstream").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    val q = spark.readStream.format("graft-iceberg").load(t)
      .writeStream.format("memory").queryName("iw_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("iw_tail").count() == 1L)
      IcebergWriter.write(spark, Seq((2L, "b"), (3L, "c")).toDF("id", "name"), t)
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM iw_tail").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming sink: exactly-once appends via snapshot-summary txn markers") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val t = Files.createTempDirectory("iwsink").toString
    val ckpt = Files.createTempDirectory("iwsinkckpt").toString
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    src.addData((1L, "a"), (2L, "b"))
    def run(): Unit = {
      val q = src.toDF().toDF("id", "name").writeStream.format("graft-iceberg")
        .option("path", t).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(IcebergReader.read(spark, t).count() == 2L)
    src.addData((3L, "c"))
    run()
    assert(IcebergReader.read(spark, t).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // a manual replay of an old batch id commits nothing
    val before = IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration)
    val sink = new IcebergStreamSink(spark, t,
      org.apache.spark.sql.streaming.OutputMode.Append(), ckpt)
    sink.addBatch(0L, Seq((99L, "dup")).toDF("id", "name"))
    assert(IcebergReader.metadataText(t, spark.sparkContext.hadoopConfiguration) == before)
    assert(IcebergWriter.lastTxnVersion(spark, t, ckpt) == 1L)
  }

  test("profile gates: external tables, schema drift, complex types, rival commits") {
    import spark.implicits._
    val t = Files.createTempDirectory("iwgates").toString
    IcebergWriter.write(spark, Seq((1L, "a")).toDF("id", "name"), t)
    // schema drift refuses
    val e1 = intercept[Exception](IcebergWriter.write(spark,
      Seq((1, "x")).toDF("id", "name"), t)) // int id, table has long
    assert(e1.getMessage.contains("schema mismatch"))
    // complex column types refuse up front
    val e2 = intercept[Exception](IcebergWriter.write(spark,
      Seq((1L, Seq("x"))).toDF("id", "tags"), Files.createTempDirectory("iwc").toString))
    assert(e2.getMessage.contains("primitives only"))
    // a table whose metadata lacks the graft.writer stamp refuses —
    // regenerating an external table's metadata would drop its state
    val ext = Files.createTempDirectory("iwext").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$ext/metadata"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$ext/metadata/v1.metadata.json"),
      """{"format-version": 2, "location": "x", "current-schema-id": 0,
        |"schemas": [{"schema-id": 0, "type": "struct", "fields": [
        |  {"id": 1, "name": "id", "type": "long"},
        |  {"id": 2, "name": "name", "type": "string"}]}],
        |"default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": []}],
        |"current-snapshot-id": -1, "snapshots": []}""".stripMargin)
    val e3 = intercept[Exception](IcebergWriter.write(spark,
      Seq((1L, "a")).toDF("id", "name"), ext))
    assert(e3.getMessage.contains("not written by this writer"))
    // a rival metadata version lands first (same-state copy): the next
    // write resolves the new head and versions PAST it — the atomic
    // create-no-overwrite can never clobber the rival
    val cur = java.nio.file.Paths.get(new org.apache.hadoop.fs.Path(
      IcebergReader.currentMetadataPath(t, spark.sparkContext.hadoopConfiguration))
      .toUri.getPath)
    java.nio.file.Files.copy(cur, java.nio.file.Paths.get(s"$t/metadata/v2.metadata.json"))
    IcebergWriter.write(spark, Seq((2L, "b")).toDF("id", "name"), t)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$t/metadata/v3.metadata.json")))
    assert(IcebergReader.read(spark, t).count() == 2L)
  }
}
