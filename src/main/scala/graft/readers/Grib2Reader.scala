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
  * workhorse encoding: data representation template 5.0 — simple
  * packing — with no bitmap, the layout the bulk of public model
  * output (GFS et al.) uses for scalar fields:
  *
  *   value = (R + X * 2^E) / 10^D
  *
  * with R the f32 reference, E/D sign-magnitude scale factors and X
  * the n-bit big-endian packed integers of section 7. Each GRIB
  * message in the file becomes one executor task (driver walks only
  * section headers with positioned reads); rows are `(msg, idx,
  * value)` with the message's grid size from section 3 available as
  * `ni`/`nj` columns when the grid template provides them.
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

  /** Decode one message's sections into (ni, nj, values). */
  private[readers] def decodeMessage(b: Array[Byte]): (Long, Long, Array[Double]) = {
    val bb = ByteBuffer.wrap(b) // GRIB2 is big-endian throughout
    var pos = 16
    var ni = 0L; var nj = 0L
    var nPoints = 0
    var refVal = 0.0f; var binScale = 0; var decScale = 0; var bits = 0
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
          val template = bb.getShort(pos + 9) & 0xffff
          require(template == 0, s"data representation template 5.$template unsupported (simple packing only)")
          refVal = bb.getFloat(pos + 11)
          binScale = signMag(bb.getShort(pos + 15) & 0xffff, 16)
          decScale = signMag(bb.getShort(pos + 17) & 0xffff, 16)
          bits = b(pos + 19) & 0xff
        case 6 =>
          require((b(pos + 5) & 0xff) == 255, "bitmapped GRIB2 fields unsupported")
        case 7 =>
          val e = math.pow(2.0, binScale)
          val d = math.pow(10.0, decScale)
          values = new Array[Double](nPoints)
          if (bits == 0) java.util.Arrays.fill(values, refVal.toDouble / d)
          else {
            var bitPos = (pos + 5).toLong * 8
            var i = 0
            while (i < nPoints) {
              var x = 0L
              var k = 0
              while (k < bits) {
                val byteAt = (bitPos >> 3).toInt
                val bit = 7 - (bitPos & 7).toInt
                x = (x << 1) | ((b(byteAt) >> bit) & 1)
                bitPos += 1
                k += 1
              }
              values(i) = (refVal + x * e) / d
              i += 1
            }
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
