package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Stata .dta reader, modern releases 117/118 (published Stata
  * dta specification; reference datatypes.py:1497 StataFile, read there
  * via `pandas.read_stata`).
  *
  * The driver reads only metadata — the XML-tagged header and the
  * `<map>` section, whose fourteen u64 offsets locate every other
  * section, then `<variable_types>` / `<varnames>`. Observations are
  * FIXED-WIDTH records in `<data>`, so row ranges split exactly:
  * executors read their own byte ranges with positioned reads — the
  * same distribution shape as the NetCDF3 reader.
  *
  * Numeric missing values (Stata's high-sentinel encodings per type)
  * become nulls. strL (interned long string) columns are rejected with
  * a clear error; fixed-width str columns decode as UTF-8.
  */
object StataReader {

  private case class Meta(
      release: Int, bigEndian: Boolean, nVars: Int, nObs: Long,
      types: Seq[Int], names: Seq[String], dataOffset: Long, rowWidth: Int)

  private def widthOf(t: Int): Int = t match {
    case 65526 => 8 // double
    case 65527 => 4 // float
    case 65528 => 4 // long
    case 65529 => 2 // int
    case 65530 => 1 // byte
    case w if w >= 1 && w <= 2045 => w // fixed str
    case 32768 => throw new UnsupportedOperationException("stata strL columns unsupported")
    case other => throw new UnsupportedOperationException(s"stata type code $other")
  }

  private def sparkType(t: Int): DataType = t match {
    case 65526 | 65527 => DoubleType
    case 65528 | 65529 | 65530 => IntegerType
    case _ => StringType
  }

  private def meta(url: String, conf: Configuration): Meta = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try {
      val head = new Array[Byte](512)
      in.readFully(0, head)
      val s = new String(head, "ISO-8859-1")
      require(s.startsWith("<stata_dta><header><release>"), s"not a modern (117/118) stata dta: $url")
      val release = s.substring(28, 31).toInt
      require(release == 117 || release == 118, s"unsupported stata release $release")
      val bigEndian = s.contains("<byteorder>MSF")
      val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val kAt = s.indexOf("<K>") + 3
      val nVars = ByteBuffer.wrap(head, kAt, 2).order(order).getShort.toInt & 0xffff
      val nAt = s.indexOf("<N>") + 3
      val nObs =
        if (release == 118) ByteBuffer.wrap(head, nAt, 8).order(order).getLong
        else ByteBuffer.wrap(head, nAt, 4).order(order).getInt.toLong & 0xffffffffL

      // <map>: 14 u64 offsets; [2]=<variable_types>, [3]=<varnames>, [9]=<data>
      val mapAt = s.indexOf("<map>") + 5
      val map = (0 until 14).map(i => ByteBuffer.wrap(head, mapAt + i * 8, 8).order(order).getLong)

      val typesTag = "<variable_types>".length
      val typesBuf = new Array[Byte](nVars * 2)
      in.readFully(map(2) + typesTag, typesBuf)
      val types = (0 until nVars).map(i => ByteBuffer.wrap(typesBuf, i * 2, 2).order(order).getShort.toInt & 0xffff)

      val nameLen = if (release == 118) 129 else 33
      val namesBuf = new Array[Byte](nVars * nameLen)
      in.readFully(map(3) + "<varnames>".length, namesBuf)
      val names = (0 until nVars).map { i =>
        val raw = namesBuf.slice(i * nameLen, (i + 1) * nameLen)
        val end = raw.indexOf(0.toByte) match { case -1 => raw.length; case e => e }
        new String(raw, 0, end, "UTF-8")
      }

      Meta(release, bigEndian, nVars, nObs, types, names,
        map(9) + "<data>".length, types.map(widthOf).sum)
    } finally in.close()
  }

  // Stata missing-value sentinels: anything at or above the base "." code
  private def missByte(v: Byte): Boolean = v > 100
  private def missInt(v: Short): Boolean = v > 32740
  private def missLong(v: Int): Boolean = v > 2147483620
  private def missFloat(v: Float): Boolean = v > 1.7e38f
  private def missDouble(v: Double): Boolean = v > 8.98e307

  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val m = meta(url, conf)
    val schema = StructType(m.names.zip(m.types).map { case (n, t) =>
      StructField(n, sparkType(t), nullable = true)
    })

    val parts = math.max(1, math.min(m.nObs, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (m.nObs * p / parts, m.nObs * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (types, dataOff, rowW, bigEndian) = (m.types, m.dataOffset, m.rowWidth, m.bigEndian)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in: FSDataInputStream = fs.open(new Path(url))
      val order = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
      val buf = new Array[Byte]((hi - lo).toInt * rowW)
      try in.readFully(dataOff + lo * rowW, buf) finally in.close()
      (0 until (hi - lo).toInt).iterator.map { r =>
        var p = r * rowW
        val cells = types.map { t =>
          val v: Any = t match {
            case 65530 => val x = buf(p); p += 1; if (missByte(x)) null else x.toInt
            case 65529 => val x = ByteBuffer.wrap(buf, p, 2).order(order).getShort; p += 2; if (missInt(x)) null else x.toInt
            case 65528 => val x = ByteBuffer.wrap(buf, p, 4).order(order).getInt; p += 4; if (missLong(x)) null else x
            case 65527 => val x = ByteBuffer.wrap(buf, p, 4).order(order).getFloat; p += 4; if (missFloat(x)) null else x.toDouble
            case 65526 => val x = ByteBuffer.wrap(buf, p, 8).order(order).getDouble; p += 8; if (missDouble(x)) null else x
            case w => // fixed str, NUL-padded
              var e = p
              while (e < p + w && buf(e) != 0) e += 1
              val sVal = new String(buf, p, e - p, "UTF-8"); p += w
              if (sVal.isEmpty) null else sVal
          }
          v
        }
        Row.fromSeq(cells)
      }
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class StataReaderImpl extends Reader {
  val name = "stata_reader"
  val implementsKinds = Set("stata")
  def read(spark: SparkSession, ref: DataRef): DataFrame = StataReader.read(spark, ref.url)
}
