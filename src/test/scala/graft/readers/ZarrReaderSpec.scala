package graft.readers

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class ZarrReaderSpec extends SparkSpec {

  /** Hand-built Zarr v2 store: 2-D f8 array 3x4, chunks 2x3, zlib. */
  private def writeZarr(dir: java.nio.file.Path): Unit = {
    Files.writeString(dir.resolve(".zarray"),
      """{"zarr_format":2,"shape":[3,4],"chunks":[2,3],"dtype":"<f8",
        |"compressor":{"id":"zlib","level":1},"fill_value":0.0,"order":"C","filters":null}""".stripMargin)
    def chunk(vals: Seq[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putDouble)
      val d = new java.util.zip.Deflater(1)
      d.setInput(bb.array()); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    // global value at (i,j) = i*10 + j; chunks are C-order 2x3 blocks
    def block(offI: Int, offJ: Int): Seq[Double] =
      for (a <- 0 until 2; b <- 0 until 3) yield ((offI + a) * 10 + (offJ + b)).toDouble
    Files.write(dir.resolve("0.0"), chunk(block(0, 0)))
    Files.write(dir.resolve("0.1"), chunk(block(0, 3)))
    Files.write(dir.resolve("1.0"), chunk(block(2, 0)))
    Files.write(dir.resolve("1.1"), chunk(block(2, 3)))
  }

  test("zarr 2-D zlib store reads to long-form rows with edge trimming") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarr")
    writeZarr(dir)
    val df = ZarrReader.read(spark, s"file://$dir")
    assert(df.columns.toSeq == Seq("dim0", "dim1", "value"))
    val rows = df.as[(Long, Long, Double)].collect()
    assert(rows.length == 12) // 3x4, edge chunks trimmed
    val m = rows.map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m((0L, 0L)) == 0.0)
    assert(m((1L, 3L)) == 13.0)
    assert(m((2L, 3L)) == 23.0)
    assert(!m.contains((3L, 0L)))
  }

  test("zarr write -> read round-trips a 2-D array (zlib, edge chunks)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrw")
    val src = (for (i <- 0 until 3; j <- 0 until 5) yield (i.toLong, j.toLong, (i * 100 + j).toDouble))
      .toDF("dim0", "dim1", "value")
    val ref = graft.output.ZarrWriter.write(src, s"file://$dir/arr", chunks = Seq(2, 2), zlib = true)
    assert(ref.kind == "zarr")
    val back = ZarrReader.read(spark, s"file://$dir/arr")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(back.size == 15)
    assert(back((2L, 4L)) == 204.0)
    assert(back((0L, 3L)) == 3.0)
  }

  test("zarr write -> read round-trips 1-D int data with explicit shape") {
    import spark.implicits._
    val dir = Files.createTempDirectory("zarrw1")
    val src = Seq((0L, 7.0), (1L, 8.0), (3L, 9.0)).toDF("dim0", "value") // index 2 absent -> fill 0
    graft.output.ZarrWriter.write(src, s"file://$dir/v", chunks = Seq(3), shape = Seq(4), dtype = "<i4")
    val back = ZarrReader.read(spark, s"file://$dir/v")
      .as[(Long, Double)].collect().toMap
    assert(back == Map(0L -> 7.0, 1L -> 8.0, 2L -> 0.0, 3L -> 9.0))
  }
}
