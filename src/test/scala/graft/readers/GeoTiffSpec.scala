package graft.readers

import graft.SparkSpec
import graft.inspect.AsdfParser
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class GeoTiffSpec extends SparkSpec {
  import spark.implicits._

  /** Build a 2x2 RGB TIFF with ImageIO, then append GeoTIFF tags by
    * rewriting the IFD: simpler — craft a minimal LE TIFF by hand with
    * the pixel strip + ModelPixelScale/ModelTiepoint tags.
    */
  private def geoTiff(): Array[Byte] = {
    // layout: header(8) + pixels(12) + doubles(scale 16 @20, tiepoint 48 @36) + IFD @84
    val bb = ByteBuffer.allocate(300).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(84)
    // 2x2 RGB pixels at offset 8: red green / blue white
    bb.position(8)
    bb.put(Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte))
    bb.position(20)
    bb.putDouble(0.5); bb.putDouble(0.25) // pixel scale x, y
    bb.position(36)
    bb.putDouble(0); bb.putDouble(0); bb.putDouble(0) // raster tiepoint (0,0,0)
    bb.putDouble(100.0); bb.putDouble(50.0); bb.putDouble(0) // world (100, 50, 0)
    // IFD: count then entries
    val entries = Seq(
      (256, 3, 1, 2),      // ImageWidth
      (257, 3, 1, 2),      // ImageLength
      (258, 3, 3, 224),    // BitsPerSample -> offset
      (259, 3, 1, 1),      // Compression none
      (262, 3, 1, 2),      // Photometric RGB
      (273, 4, 1, 8),      // StripOffsets
      (277, 3, 1, 3),      // SamplesPerPixel
      (278, 3, 1, 2),      // RowsPerStrip
      (279, 4, 1, 12),     // StripByteCounts
      (33550, 12, 3, 20),  // ModelPixelScale
      (33922, 12, 6, 36))  // ModelTiepoint
    bb.position(84)
    bb.putShort(entries.size.toShort)
    entries.foreach { case (tag, typ, count, value) =>
      bb.putShort(tag.toShort); bb.putShort(typ.toShort); bb.putInt(count); bb.putInt(value)
    }
    bb.putInt(0) // next IFD
    bb.position(224); bb.putShort(8); bb.putShort(8); bb.putShort(8)
    bb.array()
  }

  test("IFD geo tags give the affine transform and pixels get world coords") {
    val tiff = geoTiff()
    val Some(g) = GeoTiffReader.georef(tiff)
    assert(g.scaleX == 0.5 && g.scaleY == 0.25 && g.originX == 100.0 && g.originY == 50.0)

    val dir = Files.createTempDirectory("geotiff")
    Files.write(dir.resolve("map.tif"), tiff)
    val df = GeoTiffReader.read(spark, s"file://$dir")
    val rows = df.select("row", "col", "x", "y", "r", "g", "b")
      .as[(Long, Long, Double, Double, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(rows.length == 4)
    // pixel centers: x = 100 + (col+0.5)*0.5 ; y = 50 - (row+0.5)*0.25
    assert(rows(0) == ((0L, 0L, 100.25, 49.875, 255, 0, 0)))
    assert(rows(3) == ((1L, 1L, 100.75, 49.625, 255, 255, 255)))
  }

  test("ASDF metadata summarises versions, tree keys and blocks") {
    val header =
      """#ASDF 1.0.0
        |#ASDF_STANDARD 1.5.0
        |%YAML 1.1
        |---
        |asdf_library: something
        |data:
        |  kind: array
        |history: notes
        |...
        |""".stripMargin
    val blockData = Array.tabulate(16)(_.toByte)
    val blockHeader = ByteBuffer.allocate(48) // big-endian per spec
    blockHeader.put(0xd3.toByte).put('B'.toByte).put('L'.toByte).put('K'.toByte)
    blockHeader.putShort(48.toShort)
    blockHeader.position(6 + 14)
    blockHeader.putLong(blockData.length.toLong) // used size
    val bytes = header.getBytes("ISO-8859-1") ++
      java.util.Arrays.copyOf(blockHeader.array(), 6 + 48) ++ blockData
    val m = AsdfParser.parse(bytes)
    assert(m("asdf_version") == "1.0.0" && m("standard_version") == "1.5.0")
    assert(m("tree_keys").asInstanceOf[Seq[String]] == Seq("asdf_library", "data", "history"))
    assert(m("n_blocks") == 1 && m("block_bytes") == 16L)
  }
}
