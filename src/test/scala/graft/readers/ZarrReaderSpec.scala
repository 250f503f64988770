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
}
