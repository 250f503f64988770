package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native GRIB2 reader (published WMO GRIB edition-2 spec; reference
  * datatypes.py:540 GRIB2, read there via cfgrib/eccodes). Covers the
  * workhorse encodings with no bitmap:
  *
  *  - template 5.0, simple packing: `value = (R + X * 2^E) / 10^D`
  *    with R the f32 reference, E/D sign-magnitude scale factors and X
  *    the n-bit big-endian packed integers of section 7;
  *  - template 5.2, complex packing: section 7 carries per-group
  *    reference values, widths and scaled lengths (general group
  *    splitting, each stream octet-aligned), `X = X1_group + X2`;
  *  - template 5.3, complex packing + spatial differencing of order 1
  *    or 2: section 7 leads with the sign-magnitude initial value(s)
  *    and overall minimum in the declared extra-descriptor width, the
  *    group-unpacked stream is un-differenced before scaling — the
  *    encoding the bulk of operational NWP archives (GFS/HRRR) use.
  *
  * Missing-value management (octet 23 ≠ 0) and JPEG2000/PNG packing
  * (5.40/5.41) refuse with a clear error. Each GRIB message in the
  * file becomes one executor task (driver walks only section headers
  * with positioned reads); rows are `(msg, idx, value)` with the
  * message's grid size from section 3 available as `ni`/`nj` columns
  * when the grid template provides them.
  */
object Grib2Reader {

  private def signMag(v: Int, bits: Int): Int = {
    val signBit = 1 << (bits - 1)
    if ((v & signBit) != 0) -(v & (signBit - 1)) else v
  }

  /** Driver walk: (message offset, message length) pairs. */
  private def messages(url: String, conf: Configuration): Seq[(Long, Long)] = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val fileLen = fs.getFileStatus(new Path(url)).getLen
    val in = fs.open(new Path(url))
    try {
      val hdr = new Array[Byte](16)
      var pos = 0L
      val out = Seq.newBuilder[(Long, Long)]
      while (pos + 16 <= fileLen) {
        in.readFully(pos, hdr)
        require(hdr(0) == 'G' && hdr(1) == 'R' && hdr(2) == 'I' && hdr(3) == 'B',
          s"not GRIB at offset $pos in $url")
        require((hdr(7) & 0xff) == 2, s"GRIB edition ${hdr(7)} unsupported (edition 2 only)")
        val len = ByteBuffer.wrap(hdr, 8, 8).getLong
        out += ((pos, len))
        pos += len
      }
      out.result()
    } finally in.close()
  }

  /** Big-endian bit cursor over a message with per-stream octet
    * alignment (the complex-packing streams each pad to a byte). */
  private final class Bits(b: Array[Byte], startByte: Int) {
    private var bitPos = startByte.toLong * 8
    def read(bits: Int): Long = {
      var x = 0L; var k = 0
      while (k < bits) {
        val byteAt = (bitPos >> 3).toInt
        val bit = 7 - (bitPos & 7).toInt
        x = (x << 1) | ((b(byteAt) >> bit) & 1)
        bitPos += 1; k += 1
      }
      x
    }
    def align(): Unit = if ((bitPos & 7) != 0) bitPos = (bitPos | 7) + 1
  }

  /** Decode one message's sections into (ni, nj, values). */
  private[readers] def decodeMessage(b: Array[Byte]): (Long, Long, Array[Double]) = {
    val bb = ByteBuffer.wrap(b) // GRIB2 is big-endian throughout
    var pos = 16
    var ni = 0L; var nj = 0L
    var nPoints = 0
    var tmpl5 = 0
    var refVal = 0.0f; var binScale = 0; var decScale = 0; var bits = 0
    // complex packing (5.2/5.3) group descriptors
    var ng = 0; var widthRef = 0; var widthBits = 0
    var lenRef = 0L; var lenInc = 0; var lastLen = 0L; var lenBits = 0
    var sdOrder = 0; var sdOctets = 0
    var values: Array[Double] = Array.emptyDoubleArray
    while (pos + 4 <= b.length && new String(b, pos, math.min(4, b.length - pos), "ISO-8859-1") != "7777") {
      val len = bb.getInt(pos)
      val num = b(pos + 4) & 0xff
      num match {
        case 3 => // grid definition; template 3.0 (lat/lon) carries Ni/Nj
          val template = bb.getShort(pos + 12) & 0xffff
          if (template == 0 && len >= 38) {
            ni = bb.getInt(pos + 30).toLong & 0xffffffffL
            nj = bb.getInt(pos + 34).toLong & 0xffffffffL
          }
        case 5 =>
          nPoints = bb.getInt(pos + 5)
          tmpl5 = bb.getShort(pos + 9) & 0xffff
          require(tmpl5 == 0 || tmpl5 == 2 || tmpl5 == 3,
            s"data representation template 5.$tmpl5 unsupported (simple/complex packing only)")
          refVal = bb.getFloat(pos + 11)
          binScale = signMag(bb.getShort(pos + 15) & 0xffff, 16)
          decScale = signMag(bb.getShort(pos + 17) & 0xffff, 16)
          bits = b(pos + 19) & 0xff
          if (tmpl5 == 2 || tmpl5 == 3) {
            require((b(pos + 21) & 0xff) == 1, "GRIB2 complex packing: only general group splitting (octet 22 = 1)")
            require((b(pos + 22) & 0xff) == 0, "GRIB2 complex packing: missing-value management unsupported (octet 23 != 0)")
            ng = bb.getInt(pos + 31)
            widthRef = b(pos + 35) & 0xff
            widthBits = b(pos + 36) & 0xff
            lenRef = bb.getInt(pos + 37).toLong & 0xffffffffL
            lenInc = b(pos + 41) & 0xff
            lastLen = bb.getInt(pos + 42).toLong & 0xffffffffL
            lenBits = b(pos + 46) & 0xff
          }
          if (tmpl5 == 3) {
            sdOrder = b(pos + 47) & 0xff
            sdOctets = b(pos + 48) & 0xff
            require(sdOrder == 1 || sdOrder == 2, s"GRIB2 spatial differencing order $sdOrder unsupported (1 or 2)")
          }
        case 6 =>
          require((b(pos + 5) & 0xff) == 255, "bitmapped GRIB2 fields unsupported")
        case 7 =>
          val e = math.pow(2.0, binScale)
          val d = math.pow(10.0, decScale)
          values = new Array[Double](nPoints)
          if (tmpl5 == 0) {
            if (bits == 0) java.util.Arrays.fill(values, refVal.toDouble / d)
            else {
              val cur = new Bits(b, pos + 5)
              var i = 0
              while (i < nPoints) { values(i) = (refVal + cur.read(bits) * e) / d; i += 1 }
            }
          } else {
            val cur = new Bits(b, pos + 5)
            // 5.3 extra descriptors: order initial value(s) + overall
            // minimum, sign-magnitude in sdOctets bytes each
            var iv1 = 0L; var iv2 = 0L; var gMin = 0L
            if (tmpl5 == 3) {
              def sm(): Long = {
                val raw = cur.read(sdOctets * 8)
                val signBit = 1L << (sdOctets * 8 - 1)
                if ((raw & signBit) != 0) -(raw & (signBit - 1)) else raw
              }
              iv1 = sm()
              if (sdOrder == 2) iv2 = sm()
              gMin = sm()
            }
            // group reference values, widths, scaled lengths — each
            // stream zero-padded to an octet boundary
            val groupRef = new Array[Long](ng)
            var g = 0
            while (g < ng) { groupRef(g) = if (bits == 0) 0L else cur.read(bits); g += 1 }
            cur.align()
            val groupWidth = new Array[Int](ng)
            g = 0
            while (g < ng) { groupWidth(g) = widthRef + (if (widthBits == 0) 0 else cur.read(widthBits).toInt); g += 1 }
            cur.align()
            // NG stored lengths (the last group's bits are present but
            // its true length comes from octets 43-46)
            val groupLen = new Array[Long](ng)
            g = 0
            while (g < ng) {
              groupLen(g) = lenRef + lenInc * (if (lenBits == 0) 0L else cur.read(lenBits))
              g += 1
            }
            groupLen(ng - 1) = lastLen
            cur.align()
            val x = new Array[Long](nPoints)
            var i = 0
            g = 0
            while (g < ng) {
              var j = 0L
              while (j < groupLen(g)) {
                require(i < nPoints, s"GRIB2 complex packing: group lengths exceed $nPoints points")
                x(i) = groupRef(g) + (if (groupWidth(g) == 0) 0L else cur.read(groupWidth(g)))
                i += 1; j += 1
              }
              g += 1
            }
            require(i == nPoints, s"GRIB2 complex packing: groups cover $i of $nPoints points")
            if (tmpl5 == 3) { // undo the spatial differencing
              x(0) = iv1
              if (sdOrder == 2) {
                x(1) = iv2
                i = 2
                while (i < nPoints) { x(i) = x(i) + gMin + 2 * x(i - 1) - x(i - 2); i += 1 }
              } else {
                i = 1
                while (i < nPoints) { x(i) = x(i) + gMin + x(i - 1); i += 1 }
              }
            }
            i = 0
            while (i < nPoints) { values(i) = (refVal + x(i) * e) / d; i += 1 }
          }
        case _ => ()
      }
      pos += len
    }
    (ni, nj, values)
  }

  val schema: StructType = StructType(Seq(
    StructField("msg", IntegerType, nullable = false),
    StructField("idx", LongType, nullable = false),
    StructField("ni", LongType, nullable = false),
    StructField("nj", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  def read(spark: SparkSession, url: String): DataFrame = {
    val msgs = messages(url, spark.sparkContext.hadoopConfiguration)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .parallelize(msgs.zipWithIndex, math.max(1, math.min(msgs.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case ((off, len), msgIdx) =>
        val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
        val in = fs.open(new Path(url))
        val body = new Array[Byte](len.toInt)
        try in.readFully(off, body) finally in.close()
        val (ni, nj, values) = decodeMessage(body)
        values.iterator.zipWithIndex.map { case (v, i) => Row(msgIdx, i.toLong, ni, nj, v) }
      }
    spark.createDataFrame(rdd, schema)
  }
}

class Grib2ReaderImpl extends Reader {
  val name = "grib2_reader"
  val implementsKinds = Set("grib2")
  def read(spark: SparkSession, ref: DataRef): DataFrame = Grib2Reader.read(spark, ref.url)
}
