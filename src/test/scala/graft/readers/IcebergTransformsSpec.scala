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
}
