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

  private final class BitW {
    private val out = new ByteArrayOutputStream()
    private var cur = 0; private var n = 0
    def write(v: Long, bits: Int): Unit = (bits - 1 to 0 by -1).foreach { k =>
      cur = (cur << 1) | ((v >> k) & 1).toInt; n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
    }
    def align(): Unit = if (n > 0) { out.write(cur << (8 - n)); cur = 0; n = 0 }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Template 5.2/5.3 message: group refs/widths/lengths streams each
    * octet-aligned; 5.3 leads section 7 with sign-magnitude iv/gmin. */
  private def complexMessage(
      nPoints: Int, refBits: Int, groupRefs: Seq[Long],
      widthRef: Int, widthBits: Int, storedWidths: Seq[Long],
      lenRef: Long, lenInc: Int, lenBits: Int, storedLens: Seq[Long], lastLen: Long,
      packed: Seq[(Long, Int)], // (value, width) per point in group order
      sd: Option[(Int, Int, Seq[Long])] = None // (order, octets, sign-mag raw descriptors)
  ): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    body.write(section(1, new Array[Byte](16)))
    val tmpl = if (sd.isDefined) 3 else 2
    val s5 = ByteBuffer.allocate(if (tmpl == 3) 44 else 42)
    s5.putInt(0, nPoints)
    s5.putShort(4, tmpl.toShort)
    s5.putFloat(6, 0.0f)                 // R
    s5.putShort(10, 0); s5.putShort(12, 0) // E, D
    s5.put(14, refBits.toByte)
    s5.put(16, 1.toByte)                 // general group splitting
    s5.put(17, 0.toByte)                 // no missing-value management
    s5.putInt(26, groupRefs.size)        // NG
    s5.put(30, widthRef.toByte); s5.put(31, widthBits.toByte)
    s5.putInt(32, lenRef.toInt); s5.put(36, lenInc.toByte)
    s5.putInt(37, lastLen.toInt); s5.put(41, lenBits.toByte)
    sd.foreach { case (order, octets, _) => s5.put(42, order.toByte); s5.put(43, octets.toByte) }
    body.write(section(5, s5.array()))
    body.write(section(6, Array(255.toByte)))
    val w = new BitW
    sd.foreach { case (_, octets, raws) => raws.foreach(r => w.write(r, octets * 8)) }
    groupRefs.foreach(r => if (refBits > 0) w.write(r, refBits)); w.align()
    storedWidths.foreach(v => if (widthBits > 0) w.write(v, widthBits)); w.align()
    storedLens.foreach(v => if (lenBits > 0) w.write(v, lenBits)); w.align()
    packed.foreach { case (v, width) => if (width > 0) w.write(v, width) }
    body.write(section(7, w.bytes))
    body.write("7777".getBytes("ISO-8859-1"))
    val total = 16 + body.size()
    val out = ByteBuffer.allocate(total)
    out.put("GRIB".getBytes("ISO-8859-1"))
    out.putShort(0); out.put(0.toByte); out.put(2.toByte)
    out.putLong(total.toLong)
    out.put(body.toByteArray)
    out.array()
  }

  test("complex packing (5.2): per-group refs/widths/lengths reconstruct") {
    val dir = Files.createTempDirectory("grib2c")
    // 7 points, 2 groups: [ref 3, width 2, len 4] + [ref 10, width 3, last len 3]
    // X = 3,4,5,6, 10,15,17; R=0,E=0,D=0 → values = X
    val m = complexMessage(
      nPoints = 7, refBits = 5, groupRefs = Seq(3L, 10L),
      widthRef = 1, widthBits = 3, storedWidths = Seq(1L, 2L), // widths 2, 3
      lenRef = 4, lenInc = 1, lenBits = 2, storedLens = Seq(0L, 0L), lastLen = 3,
      packed = Seq((0L, 2), (1L, 2), (2L, 2), (3L, 2), (0L, 3), (5L, 3), (7L, 3)))
    Files.write(dir.resolve("c.grb2"), m)
    val got = Grib2Reader.read(spark, s"file://$dir/c.grb2")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._2).map(_._5)
    assert(got.toSeq == Seq(3.0, 4.0, 5.0, 6.0, 10.0, 15.0, 17.0))
  }

  test("complex packing + spatial differencing (5.3, order 2) un-differences") {
    val dir = Files.createTempDirectory("grib2sd")
    // true series 100,102,106,113,121,128; 2nd differences 2,3,1,-1;
    // gmin=-1 → packed 3,4,2,0; iv1=100, iv2=102, gmin sign-mag 0x8001
    val m = complexMessage(
      nPoints = 6, refBits = 4, groupRefs = Seq(0L),
      widthRef = 0, widthBits = 3, storedWidths = Seq(3L),
      lenRef = 6, lenInc = 1, lenBits = 2, storedLens = Seq(0L), lastLen = 6,
      packed = Seq((0L, 3), (0L, 3), (3L, 3), (4L, 3), (2L, 3), (0L, 3)),
      sd = Some((2, 2, Seq(100L, 102L, 0x8001L))))
    Files.write(dir.resolve("sd.grb2"), m)
    val got = Grib2Reader.read(spark, s"file://$dir/sd.grb2")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._2).map(_._5)
    assert(got.toSeq == Seq(100.0, 102.0, 106.0, 113.0, 121.0, 128.0))
  }

  test("complex packing refuses missing-value management and JPEG2000 templates") {
    // flip octet 23 (missing-value management) to 1
    val bad = complexMessage(
      nPoints = 1, refBits = 0, groupRefs = Seq(0L),
      widthRef = 0, widthBits = 0, storedWidths = Seq(0L),
      lenRef = 1, lenInc = 0, lenBits = 0, storedLens = Seq(0L), lastLen = 1,
      packed = Seq((0L, 0)))
    // locate section 5 and patch its missing-management octet
    val bb = ByteBuffer.wrap(bad)
    var pos = 16
    while ((bad(pos + 4) & 0xff) != 5) pos += bb.getInt(pos)
    bad(pos + 22) = 1.toByte
    val e = intercept[IllegalArgumentException](Grib2Reader.decodeMessage(bad))
    assert(e.getMessage.contains("missing-value"))
    bad(pos + 22) = 0.toByte
    bb.putShort(pos + 9, 40) // template 5.40 JPEG2000
    val e2 = intercept[IllegalArgumentException](Grib2Reader.decodeMessage(bad))
    assert(e2.getMessage.contains("5.40"))
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
