package graft.readers

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixture .shp/.shx/.dbf encoded by hand from the published specs:
  * a point, a polygon and a two-part polyline with dBase attributes.
  */
class ShapefileReaderSpec extends SparkSpec {

  private def be(n: Int): Array[Byte] = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(n).array()
  private def le(n: Int): Array[Byte] = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def d(v: Double): Array[Byte] = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()

  private def shpHeader(totalWords: Int): Array[Byte] = {
    val h = ByteBuffer.allocate(100)
    h.order(ByteOrder.BIG_ENDIAN)
    h.putInt(0, 9994); h.putInt(24, totalWords)
    h.order(ByteOrder.LITTLE_ENDIAN)
    h.putInt(28, 1000); h.putInt(32, 1) // version, shape type hint
    h.array()
  }

  private lazy val dir = {
    val tmp = Files.createTempDirectory("shape")

    // geometries
    val point = le(1) ++ d(1.5) ++ d(2.5)
    val polygon = le(5) ++
      d(0) ++ d(0) ++ d(4) ++ d(4) ++ // bbox
      le(1) ++ le(4) ++ le(0) ++       // 1 part, 4 points, part starts at 0
      d(0) ++ d(0) ++ d(4) ++ d(0) ++ d(4) ++ d(4) ++ d(0) ++ d(0)
    val polyline = le(3) ++
      d(0) ++ d(0) ++ d(9) ++ d(9) ++
      le(2) ++ le(4) ++ le(0) ++ le(2) ++ // 2 parts of 2 points each
      d(0) ++ d(0) ++ d(1) ++ d(1) ++ d(8) ++ d(8) ++ d(9) ++ d(9)

    val multipoint = le(8) ++
      d(3) ++ d(4) ++ d(7) ++ d(6) ++ // bbox
      le(2) ++                         // NumPoints directly after bbox (no parts)
      d(3) ++ d(4) ++ d(7) ++ d(6)
    val recs = Seq(point, polygon, polyline, multipoint)
    val body = new ByteArrayOutputStream()
    val shx = new ByteArrayOutputStream()
    var off = 100
    recs.zipWithIndex.foreach { case (content, i) =>
      shx.write(be(off / 2)); shx.write(be(content.length / 2))
      body.write(be(i + 1)); body.write(be(content.length / 2)); body.write(content)
      off += 8 + content.length
    }
    val shpBytes = shpHeader(off / 2) ++ body.toByteArray
    Files.write(tmp.resolve("places.shp"), shpBytes)
    Files.write(tmp.resolve("places.shx"), shpHeader((100 + shx.size()) / 2) ++ shx.toByteArray)

    // dbf: NAME C(8), POP N(6,0), RATIO N(8,3), OK L(1)
    val fields = Seq(("NAME", 'C', 8, 0), ("POP", 'N', 6, 0), ("RATIO", 'N', 8, 3), ("OK", 'L', 1, 0))
    val recSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + fields.size * 32 + 1
    val dbf = ByteBuffer.allocate(headerSize + recSize * 4 + 1).order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 3.toByte)
    dbf.putInt(4, 4)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recSize.toShort)
    fields.zipWithIndex.foreach { case ((n, t, l, dec), i) =>
      val at = 32 + i * 32
      n.getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, j) => dbf.put(at + j, b) }
      dbf.put(at + 11, t.toByte); dbf.put(at + 16, l.toByte); dbf.put(at + 17, dec.toByte)
    }
    dbf.put(headerSize - 1, 0x0d.toByte)
    def rec(at: Int, name: String, pop: String, ratio: String, ok: String): Unit = {
      dbf.put(at, ' '.toByte)
      (name.padTo(8, ' ') + pop.reverse.padTo(6, ' ').reverse + ratio.reverse.padTo(8, ' ').reverse + ok)
        .getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, j) => dbf.put(at + 1 + j, b) }
    }
    rec(headerSize, "alpha", "100", "1.500", "T")
    rec(headerSize + recSize, "beta", "200", "2.250", "F")
    rec(headerSize + recSize * 2, "gamma", "", "", "?")
    rec(headerSize + recSize * 3, "delta", "50", "0.125", "T")
    Files.write(tmp.resolve("places.dbf"), dbf.array())
    tmp
  }

  test("geometries flatten to GeoJSON with dbf attributes") {
    val df = ShapefileReader.read(spark, s"file://$dir/places.shp")
    assert(df.columns.toSeq == Seq("feature_id", "geometry_type", "geometry_json", "NAME", "POP", "RATIO", "OK"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == 4)
    assert(rows(3).getString(1) == "MultiPoint" &&
      rows(3).getString(2) == """{"type":"MultiPoint","coordinates":[[3,4],[7,6]]}""")
    assert(rows(3).getAs[String]("NAME") == "delta" && rows(3).getAs[Long]("POP") == 50L)
    assert(rows(0).getString(1) == "Point" &&
      rows(0).getString(2) == """{"type":"Point","coordinates":[1.5,2.5]}""")
    assert(rows(1).getString(1) == "Polygon" &&
      rows(1).getString(2) == """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")
    assert(rows(2).getString(1) == "MultiLineString" &&
      rows(2).getString(2) == """{"type":"MultiLineString","coordinates":[[[0,0],[1,1]],[[8,8],[9,9]]]}""")
    assert(rows(0).getAs[String]("NAME") == "alpha" && rows(0).getAs[Long]("POP") == 100L)
    assert(rows(1).getAs[Double]("RATIO") == 2.25 && !rows(1).getAs[Boolean]("OK"))
    assert(rows(2).isNullAt(4) && rows(2).isNullAt(5))
    assert(rows(0).getAs[Boolean]("OK"))
  }

  test("reads without the shx index via sequential record walk") {
    val solo = Files.createTempDirectory("shponly")
    Files.copy(dir.resolve("places.shp"), solo.resolve("p.shp"))
    val df = ShapefileReader.read(spark, s"file://$solo/p.shp")
    assert(df.count() == 4)
    assert(df.columns.toSeq == Seq("feature_id", "geometry_type", "geometry_json"))
  }
}
