package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixtures hand-written from the published NRRD spec: a raw uint16
  * 3x2 grid (first axis fastest), a gzip float volume, and guards.
  */
class NrrdReaderSpec extends SparkSpec {
  import spark.implicits._

  private def nrrd(headerLines: Seq[String], data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(("NRRD0004\n" + headerLines.mkString("\n") + "\n\n").getBytes("ISO-8859-1"))
    out.write(data)
    out.toByteArray
  }

  test("raw uint16 reads long-form, first axis fastest") {
    val data = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    Seq(10, 11, 12, 20, 21, 22).foreach(v => data.putShort(v.toShort))
    val dir = Files.createTempDirectory("nrrd")
    Files.write(dir.resolve("g.nrrd"), nrrd(Seq(
      "# a comment",
      "type: unsigned short",
      "dimension: 2",
      "sizes: 3 2",
      "encoding: raw",
      "endian: little",
      "custom:=kept verbatim"), data.array()))
    val url = s"file://$dir/g.nrrd"

    val h = NrrdReader.header(url, spark.sparkContext.hadoopConfiguration)
    assert(h.sizes == Seq(3L, 2L) && !h.gzip && h.elemSize == 2)
    assert(h.fields("custom") == "kept verbatim")

    val rows = NrrdReader.read(spark, url)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._2, r._1))
    assert(rows.toSeq == Seq(
      (0L, 0L, 10.0), (1L, 0L, 11.0), (2L, 0L, 12.0),
      (0L, 1L, 20.0), (1L, 1L, 21.0), (2L, 1L, 22.0)))
  }

  test("gzip float decodes through the single-task path") {
    val raw = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1.5f, -2.0f, 0.25f, 8.0f).foreach(raw.putFloat)
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw.array()); gz.close()
    val dir = Files.createTempDirectory("nrrdgz")
    Files.write(dir.resolve("v.nrrd"), nrrd(Seq(
      "type: float", "dimension: 1", "sizes: 4", "encoding: gzip", "endian: little"),
      bos.toByteArray))
    val rows = NrrdReader.read(spark, s"file://$dir/v.nrrd")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 1.5), (1L, -2.0), (2L, 0.25), (3L, 8.0)))
  }

  test("detached headers and unknown encodings are rejected") {
    val dir = Files.createTempDirectory("nrrdbad")
    Files.write(dir.resolve("d.nhdr"), nrrd(Seq(
      "type: float", "dimension: 1", "sizes: 4", "encoding: raw", "data file: d.raw"),
      Array.emptyByteArray))
    intercept[IllegalArgumentException] {
      NrrdReader.header(s"file://$dir/d.nhdr", spark.sparkContext.hadoopConfiguration)
    }
    Files.write(dir.resolve("h.nrrd"), nrrd(Seq(
      "type: float", "dimension: 1", "sizes: 4", "encoding: hex"), Array.emptyByteArray))
    intercept[IllegalArgumentException] {
      NrrdReader.header(s"file://$dir/h.nrrd", spark.sparkContext.hadoopConfiguration)
    }
  }

  test("kind detection and registry routing") {
    assert(Detect.recommend("x.nrrd", head = "NRRD0004\n".getBytes).head.kind.name == "nrrd")
    val data = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1.0f, 2.0f).foreach(data.putFloat)
    val dir = Files.createTempDirectory("nrrdreg")
    Files.write(dir.resolve("r.nrrd"), nrrd(Seq(
      "type: float", "dimension: 1", "sizes: 2", "encoding: raw"), data.array()))
    assert(SparkReaders.reader("nrrd_reader").get
      .read(spark, DataRef("nrrd", s"file://$dir/r.nrrd")).count() == 2)
  }
}
