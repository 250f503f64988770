package graft.readers

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.MetadataBuilder

/** Pins the Iceberg partition-transform hash two independent ways: the
  * table spec's own Appendix B test vectors (exact expected 32-bit
  * values), and Guava's murmur3_32 implementation (an independent
  * codebase — the Hpack-vs-netty verification mold). Then an E2E spec
  * on a bucket[8]-partitioned fixture where every non-matching file is
  * a DANGLING path, so failing to prune cannot even plan.
  */
class IcebergTransformsSpec extends SparkSpec {

  private def le8(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0; var x = v
    while (i < 8) { b(i) = x.toByte; x >>>= 8; i += 1 }
    b
  }

  test("murmur3 matches the Iceberg spec's Appendix B vectors") {
    // int and long hash identically (8-byte little-endian long form)
    assert(IcebergTransforms.murmur3(le8(34L)) == 2017239379)
    // date 2017-11-16 = 17486 days since epoch
    assert(IcebergTransforms.murmur3(le8(17486L)) == -653330422)
    assert(IcebergTransforms.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
  }

  test("murmur3 agrees with guava's independent implementation") {
    val g = com.google.common.hash.Hashing.murmur3_32_fixed()
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 50) {
      val b = Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt().toByte)
      assert(IcebergTransforms.murmur3(b) == g.hashBytes(b).asInt())
    }
  }

  test("bucketOf and truncateOf follow the spec's transform rules") {
    assert(IcebergTransforms.bucketOf(34L, 8).contains(2017239379 % 8))
    assert(IcebergTransforms.bucketOf("iceberg", 16).contains(1210000089 % 16))
    assert(IcebergTransforms.bucketOf(3.5, 8).isEmpty) // fractional: fail open
    // integers truncate to the floor multiple (negative values too)
    assert(IcebergTransforms.truncateOf(37L, 10).contains(30L))
    assert(IcebergTransforms.truncateOf(-3L, 10).contains(-10L))
    // strings truncate by code points, not UTF-16 units
    assert(IcebergTransforms.truncateOf("iceberg", 3).contains("ice"))
    assert(IcebergTransforms.truncateOf("ab", 5).contains("ab"))
  }

  test("temporalOf computes the spec's year/month/day/hour ordinals") {
    val d = java.time.LocalDate.of(2024, 3, 15).toEpochDay // date literal domain: days
    assert(IcebergTransforms.temporalOf(d, "date", "day").contains(d))
    assert(IcebergTransforms.temporalOf(d, "date", "year").contains(54L)) // 2024 - 1970
    assert(IcebergTransforms.temporalOf(d, "date", "month").contains(54L * 12 + 2))
    assert(IcebergTransforms.temporalOf(d, "date", "hour").isEmpty) // hour of a date: invalid
    // timestamp literal domain: UTC micros
    val micros = d * 86400000000L + 7L * 3600000000L // 07:00 UTC
    assert(IcebergTransforms.temporalOf(micros, "timestamptz", "day").contains(d))
    assert(IcebergTransforms.temporalOf(micros, "timestamptz", "hour").contains(d * 24 + 7))
    // pre-epoch floors toward negative infinity, not toward zero
    val neg = java.time.LocalDate.of(1969, 12, 31).toEpochDay
    assert(IcebergTransforms.temporalOf(neg * 86400000000L + 1L, "timestamp", "day").contains(neg))
    // strings can't transform — fail open
    assert(IcebergTransforms.temporalOf("2024-03-15", "date", "day").isEmpty)
  }

  private val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
  private def writeAvro(df: org.apache.spark.sql.DataFrame, dir: String): String = {
    df.coalesce(1).write.format(avroFmt).save(dir)
    Files.list(Paths.get(dir)).toArray.map(_.toString).find(_.endsWith(".avro")).get
  }

  test("bucket[8] partition pruning opens only the matching file") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergbucket")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val bucketOf34 = IcebergTransforms.bucketOf(34L, 8).get
    // ONLY the bucket holding id=34 physically exists
    val withIds = Seq((34L, "match")).toDF("id", "name")
      .select($"id".as("id", new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
        $"name".as("name", new MetadataBuilder().putLong("parquet.field.id", 2L).build()))
    withIds.coalesce(1).write.parquet(s"$table/data/b$bucketOf34")
    val realPath = Files.list(Paths.get(s"$table/data/b$bucketOf34")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    val entries = (0 until 8).map { b =>
      val p = if (b == bucketOf34) realPath else s"$table/data/DOES_NOT_EXIST_b$b.parquet"
      (1, p, b)
    }
    val manifestDf = entries.toDF("status", "file_path", "b").selectExpr("status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0,
        |'partition', named_struct('id_bucket', b)) as data_file""".stripMargin)
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    val listPath = writeAvro(Seq((manifestPath, 0)).toDF("manifest_path", "content"),
      s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "id_bucket", "transform": "bucket[8]", "source-id": 1, "field-id": 1000}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    val df = IcebergReader.read(spark, table, filter = Some("id = 34"))
    assert(df.inputFiles.length == 1, s"expected 1 input file, got ${df.inputFiles.toSeq}")
    assert(df.select("name").as[String].collect().toSeq == Seq("match"))
  }

  test("day-transform partition pruning with a typed DATE literal") {
    import spark.implicits._
    val root = Files.createTempDirectory("icebergday")
    val table = root.toString
    Files.createDirectories(Paths.get(s"$table/metadata"))
    val target = java.time.LocalDate.of(2024, 3, 15).toEpochDay.toInt
    val withIds = Seq((1L, "match", java.sql.Date.valueOf("2024-03-15")))
      .toDF("id", "name", "ts")
      .select($"id".as("id", new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
        $"name".as("name", new MetadataBuilder().putLong("parquet.field.id", 2L).build()),
        $"ts".as("ts", new MetadataBuilder().putLong("parquet.field.id", 3L).build()))
    withIds.coalesce(1).write.parquet(s"$table/data/d0")
    val realPath = Files.list(Paths.get(s"$table/data/d0")).toArray.map(_.toString)
      .find(_.endsWith(".parquet")).get
    // five day-partitions with the target as the NEWEST; only it
    // physically exists — both the equality and the range filters below
    // must prune the four older (dangling) days or planning crashes
    val entries = (0 until 5).map { i =>
      val day = target - 4 + i
      val p = if (day == target) realPath else s"$table/data/DOES_NOT_EXIST_$day.parquet"
      (1, p, day)
    }
    val manifestDf = entries.toDF("status", "file_path", "d").selectExpr("status",
      """named_struct('file_path', file_path, 'file_format', 'PARQUET', 'content', 0,
        |'partition', named_struct('ts_day', d)) as data_file""".stripMargin)
    val manifestPath = writeAvro(manifestDf, s"$table/metadata/manifest1")
    // a second, DANGLING manifest summarizing an older day range — the
    // range filter must skip it at the MANIFEST level (transform-aware
    // summary bounds), since reading it would crash
    def leInt(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    import org.apache.spark.sql.types._
    val listSchema = StructType(Seq(
      StructField("manifest_path", StringType), StructField("content", IntegerType),
      StructField("partition_spec_id", IntegerType),
      StructField("partitions", ArrayType(StructType(Seq(
        StructField("contains_null", BooleanType), StructField("contains_nan", BooleanType),
        StructField("lower_bound", BinaryType), StructField("upper_bound", BinaryType)))))))
    val listRows = Seq(
      org.apache.spark.sql.Row(s"$table/metadata/DOES_NOT_EXIST_old.avro", 0, 0,
        Seq(org.apache.spark.sql.Row(false, false, leInt(target - 9), leInt(target - 5)))),
      org.apache.spark.sql.Row(manifestPath, 0, 0,
        Seq(org.apache.spark.sql.Row(false, false, leInt(target - 4), leInt(target)))))
    import scala.jdk.CollectionConverters._
    val listPath = writeAvro(spark.createDataFrame(listRows.asJava, listSchema),
      s"$table/metadata/snap1")
    Files.writeString(Paths.get(s"$table/metadata/v1.metadata.json"),
      s"""{"format-version": 2, "location": "$table", "current-snapshot-id": 5,
         |  "current-schema-id": 0,
         |  "schemas": [{"schema-id": 0, "fields": [
         |    {"id": 1, "name": "id", "type": "long"},
         |    {"id": 2, "name": "name", "type": "string"},
         |    {"id": 3, "name": "ts", "type": "date"}]}],
         |  "default-spec-id": 0,
         |  "partition-specs": [{"spec-id": 0, "fields": [
         |    {"name": "ts_day", "transform": "day", "source-id": 3, "field-id": 1000}]}],
         |  "snapshots": [{"snapshot-id": 5, "manifest-list": "$listPath"}]}""".stripMargin)
    // typed DATE literal transforms; the other four days are dangling
    // paths, so failing to prune cannot even plan the scan
    val df = IcebergReader.read(spark, table, filter = Some("ts = DATE '2024-03-15'"))
    assert(df.inputFiles.length == 1, s"expected 1 input file, got ${df.inputFiles.toSeq}")
    assert(df.select("name").as[String].collect().toSeq == Seq("match"))
    // RANGE pruning through the order-preserving day transform: >= keeps
    // only the target day; > relaxes to >= in the ordinal domain (same
    // file opened) but the residual filter still yields zero rows
    val ge = IcebergReader.read(spark, table, filter = Some("ts >= DATE '2024-03-15'"))
    assert(ge.inputFiles.length == 1)
    assert(ge.count() == 1)
    val gt = IcebergReader.read(spark, table, filter = Some("ts > DATE '2024-03-15'"))
    assert(gt.inputFiles.length == 1)
    assert(gt.count() == 0)
  }
}
