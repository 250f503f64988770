package graft.readers

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files

/** Fixture hand-encoded from the WMO GRIB2 spec: two messages with
  * template 5.0 simple packing (12-bit and 0-bit widths), lat/lon grid
  * template carrying Ni/Nj, negative scale factors in sign-magnitude.
  */
class Grib2ReaderSpec extends SparkSpec {
  import spark.implicits._

  private def section(num: Int, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + body.length)
    bb.putInt(5 + body.length); bb.put(num.toByte); bb.put(body)
    bb.array()
  }

  /** One message: grid 3x2, R=100, E=-1 (scale 0.5), D=1 (divide 10), 12 bits. */
  private def message(values: Seq[Int], ni: Int, nj: Int, bits: Int,
      refVal: Float, binScaleSM: Int, decScaleSM: Int): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    // section 1 (identification, minimal 21 bytes of zeros)
    body.write(section(1, new Array[Byte](16)))
    // section 3: grid definition template 3.0 with Ni/Nj
    val s3 = ByteBuffer.allocate(67)
    s3.put(0, 0.toByte)                 // grid source
    s3.putInt(1, ni * nj)               // numDataPoints (body offset 1 = msg offset 6)
    s3.putShort(7, 0)                   // template 3.0 (body offset 7 = msg offset 12)
    s3.putInt(25, ni)                   // Ni (msg offset 30)
    s3.putInt(29, nj)                   // Nj (msg offset 34)
    body.write(section(3, s3.array()))
    // section 5: simple packing
    val s5 = ByteBuffer.allocate(16)
    s5.putInt(0, values.size)           // numDataPoints (msg offset 5)
    s5.putShort(4, 0)                   // template 5.0 (msg offset 9)
    s5.putFloat(6, refVal)              // R (msg offset 11)
    s5.putShort(10, binScaleSM.toShort) // E sign-magnitude (msg offset 15)
    s5.putShort(12, decScaleSM.toShort) // D sign-magnitude (msg offset 17)
    s5.put(14, bits.toByte)             // bits (msg offset 19)
    s5.put(15, 0.toByte)
    body.write(section(5, s5.array()))
    body.write(section(6, Array(255.toByte))) // no bitmap
    // section 7: packed values, big-endian bit stream
    val nBytes = (values.size * bits + 7) / 8
    val packed = new Array[Byte](nBytes)
    var bitPos = 0
    values.foreach { v =>
      (bits - 1 to 0 by -1).foreach { k =>
        if (((v >> k) & 1) != 0) packed(bitPos >> 3) = (packed(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
        bitPos += 1
      }
    }
    body.write(section(7, packed))
    body.write("7777".getBytes("ISO-8859-1"))

    val total = 16 + body.size()
    val out = ByteBuffer.allocate(total)
    out.put("GRIB".getBytes("ISO-8859-1"))
    out.putShort(0); out.put(0.toByte); out.put(2.toByte) // discipline, edition 2
    out.putLong(total.toLong)
    out.put(body.toByteArray)
    out.array()
  }

  test("simple packing decodes with scale factors, Ni/Nj and multi-message files") {
    val dir = Files.createTempDirectory("grib2")
    // E = -1 → sign-magnitude 0x8001; D = 1 → 0x0001
    // value = (100 + X * 2^-1) / 10^1 = 10 + X/20
    val m1 = message(Seq(0, 20, 40, 60, 80, 100), ni = 3, nj = 2, bits = 12,
      refVal = 100.0f, binScaleSM = 0x8001, decScaleSM = 0x0001)
    // constant field: bits = 0 → all points = R / 10^0
    val m2 = message(Seq.fill(4)(0), ni = 2, nj = 2, bits = 0,
      refVal = 7.25f, binScaleSM = 0, decScaleSM = 0)
    Files.write(dir.resolve("t.grb2"), m1 ++ m2)

    val df = Grib2Reader.read(spark, s"file://$dir/t.grb2")
    val rows = df.as[(Int, Long, Long, Long, Double)].collect()
    val msg1 = rows.filter(_._1 == 0).sortBy(_._2)
    assert(msg1.map(_._5).toSeq == Seq(10.0, 11.0, 12.0, 13.0, 14.0, 15.0))
    assert(msg1.head._3 == 3L && msg1.head._4 == 2L)
    val msg2 = rows.filter(_._1 == 1)
    assert(msg2.length == 4 && msg2.forall(_._5 == 7.25))
  }
}
