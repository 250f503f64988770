package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixture encoded by hand straight from the published MAT v5 spec —
  * independent of the reader: a double matrix, an int32 matrix in a
  * small-element name, a compact-stored double (uint8 wire type), a
  * compressed element, and a char matrix.
  */
class MatlabReaderSpec extends SparkSpec {
  import spark.implicits._

  private def le(n: Int): Array[Byte] = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()

  private def element(typ: Int, data: Array[Byte]): Array[Byte] = {
    val padded = (data.length + 7) & ~7
    val out = new ByteArrayOutputStream()
    out.write(le(typ)); out.write(le(data.length)); out.write(data)
    (data.length until padded).foreach(_ => out.write(0))
    out.toByteArray
  }

  private def smallElement(typ: Int, data: Array[Byte]): Array[Byte] = {
    require(data.length <= 4)
    val out = new ByteArrayOutputStream()
    out.write(le(typ | (data.length << 16))); out.write(data)
    (data.length until 4).foreach(_ => out.write(0))
    out.toByteArray
  }

  /** miMATRIX body for a 2-D numeric/char array. */
  private def matrixBody(matClass: Int, rows: Int, cols: Int, name: String,
      wireType: Int, payload: Array[Byte], smallName: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val flags = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putInt(matClass).putInt(0).array()
    out.write(element(6, flags))                       // array flags (miUINT32)
    out.write(element(5, le(rows) ++ le(cols)))        // dims (miINT32)
    val nameBytes = name.getBytes("UTF-8")
    out.write(if (smallName) smallElement(1, nameBytes) else element(1, nameBytes))
    out.write(element(wireType, payload))              // data
    out.toByteArray
  }

  private lazy val matPath: String = {
    val out = new ByteArrayOutputStream()
    val header = new Array[Byte](128)
    val desc = "MATLAB 5.0 MAT-file, hand-built fixture".getBytes("ISO-8859-1")
    System.arraycopy(desc, 0, header, 0, desc.length)
    header(124) = 0; header(125) = 1 // version 0x0100
    header(126) = 'I'; header(127) = 'M'
    out.write(header)

    // a: 2x3 double, column-major 1..6 (miDOUBLE)
    val aVals = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).foreach(aVals.putDouble)
    out.write(element(14, matrixBody(6, 2, 3, "a", 9, aVals.array())))

    // b: 1x2 int32 with small-element name (miINT32 wire)
    out.write(element(14, matrixBody(12, 1, 2, "b", 5,
      le(-7) ++ le(40), smallName = true)))

    // c: 2x2 double class stored compactly as miUINT8 wire bytes
    out.write(element(14, matrixBody(6, 2, 2, "c", 2, Array[Byte](10, 20, 30, 40))))

    // miCOMPRESSED elements are written UNPADDED (the spec exempts them
    // from 8-byte alignment); two in a row with a non-multiple-of-8
    // compressed size prove the walk doesn't round the advance
    def compressed(name: String, v1: Double, v2: Double): Array[Byte] = {
      val vals = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN).putDouble(v1).putDouble(v2)
      val elem = element(14, matrixBody(6, 1, 2, name, 9, vals.array()))
      val d = new java.util.zip.Deflater()
      d.setInput(elem); d.finish()
      val zOut = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) zOut.write(buf, 0, d.deflate(buf))
      le(15) ++ le(zOut.size()) ++ zOut.toByteArray
    }
    // z: compressed copy of a 1x2 double [9.5, -1.25]
    val z = compressed("z", 9.5, -1.25)
    require(z.length % 8 != 0, s"fixture must exercise unpadded advance (${z.length})")
    out.write(z)
    // z2: second compressed variable directly after the unpadded z
    out.write(compressed("z2", 3.5, 4.5))

    // s: 1x3 char "hey" (miUINT16 wire)
    val sVals = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
    "hey".foreach(c => sVals.putShort(c.toShort))
    out.write(element(14, matrixBody(4, 1, 3, "s", 4, sVals.array())))

    val dir = Files.createTempDirectory("mat5")
    Files.write(dir.resolve("fix.mat"), out.toByteArray)
    s"file://$dir/fix.mat"
  }

  test("variables lists all matrices with classes and dims") {
    val vars = MatlabReader.variables(matPath)
    assert(vars.map(_.name) == Seq("a", "b", "c", "z", "z2", "s"))
    assert(vars.find(_.name == "a").get.rows == 2)
    assert(vars.find(_.name == "s").exists(v => !v.numeric && v.cols == 3))
  }

  test("numeric matrices read long-form, column-major, incl. compressed + compact") {
    val df = MatlabReader.read(spark, matPath)
    val m = df.as[(String, Long, Long, Double)].collect()
      .map { case (v, r, c, x) => (v, r, c) -> x }.toMap
    assert(m(("a", 0L, 0L)) == 1.0 && m(("a", 1L, 0L)) == 2.0 && m(("a", 0L, 1L)) == 3.0 && m(("a", 1L, 2L)) == 6.0)
    assert(m(("b", 0L, 0L)) == -7.0 && m(("b", 0L, 1L)) == 40.0)
    assert(m(("c", 1L, 1L)) == 40.0)
    assert(m(("z", 0L, 0L)) == 9.5 && m(("z", 0L, 1L)) == -1.25)
    assert(m(("z2", 0L, 0L)) == 3.5 && m(("z2", 0L, 1L)) == 4.5)
    assert(!m.keySet.exists(_._1 == "s")) // char matrices aren't numeric rows
  }

  test("kind detection and registry routing") {
    assert(Detect.recommend(matPath, head = "MATLAB 5.0".getBytes).head.kind.name == "matlab")
    val df = SparkReaders.reader("matlab_reader").get.read(spark, DataRef("matlab", matPath))
    assert(df.filter($"variable" === "a").count() == 6)
  }
}
