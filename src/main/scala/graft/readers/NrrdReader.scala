package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** NRRD reader (published "nearly raw raster data" spec; reference
  * readers.py:3519 NRRD via pynrrd). Text header — `NRRD000X` magic,
  * `field: value` lines, blank line — then the raster, raw or gzip
  * encoded, first axis fastest.
  *
  * Raw-encoded data splits across executor tasks by the slowest axis
  * (positioned reads of contiguous slabs); gzip has no random access,
  * so it decodes as one task (documented single-task shape, like SPSS).
  * Detached-header files (`data file:` field) are rejected. Output is
  * the long-form layout shared by the chunked-array readers: one row
  * per element, `dim0..dimN` columns plus `value`.
  */
object NrrdReader {

  final case class NrrdHeader(
      sizes: Seq[Long],
      typeName: String,
      elemSize: Int,
      gzip: Boolean,
      littleEndian: Boolean,
      dataStart: Long,
      fields: Map[String, String]
  )

  private val TypeSizes: Map[String, Int] = Map(
    "signed char" -> 1, "int8" -> 1, "int8_t" -> 1,
    "uchar" -> 1, "unsigned char" -> 1, "uint8" -> 1, "uint8_t" -> 1,
    "short" -> 2, "short int" -> 2, "signed short" -> 2, "int16" -> 2, "int16_t" -> 2,
    "ushort" -> 2, "unsigned short" -> 2, "uint16" -> 2, "uint16_t" -> 2,
    "int" -> 4, "signed int" -> 4, "int32" -> 4, "int32_t" -> 4,
    "uint" -> 4, "unsigned int" -> 4, "uint32" -> 4, "uint32_t" -> 4,
    "longlong" -> 8, "long long" -> 8, "int64" -> 8, "int64_t" -> 8,
    "ulonglong" -> 8, "unsigned long long" -> 8, "uint64" -> 8, "uint64_t" -> 8,
    "float" -> 4, "double" -> 8)

  def header(url: String, conf: Configuration): NrrdHeader = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try {
      // the header is textual and small: read a capped prefix and find
      // the terminating blank line
      val cap = math.min(fs.getFileStatus(new Path(url)).getLen, 1 << 20).toInt
      val head = new Array[Byte](cap)
      in.readFully(0, head)
      val text = new String(head, "ISO-8859-1")
      require(text.startsWith("NRRD"), s"not a NRRD file: $url")
      val endAt = text.indexOf("\n\n")
      require(endAt > 0, "unterminated NRRD header")
      val dataStart = endAt + 2L
      val fields = text.substring(0, endAt).linesIterator.drop(1)
        .filterNot(l => l.startsWith("#") || l.isEmpty)
        .flatMap { l =>
          // `field: value` descriptors; `key:=value` pairs kept verbatim
          val i = l.indexOf(": ")
          val j = l.indexOf(":=")
          if (j >= 0 && (i < 0 || j < i)) Some(l.take(j) -> l.drop(j + 2))
          else if (i >= 0) Some(l.take(i).toLowerCase -> l.drop(i + 2).trim)
          else None
        }.toMap
      require(!fields.contains("data file") && !fields.contains("datafile"),
        "detached-header NRRD (data file:) unsupported")
      val sizes = fields("sizes").trim.split("\\s+").map(_.toLong).toSeq
      val dim = fields.get("dimension").map(_.trim.toInt).getOrElse(sizes.length)
      require(sizes.length == dim, s"dimension $dim != sizes ${sizes.length}")
      val typeName = fields("type").trim
      val elemSize = TypeSizes.getOrElse(typeName,
        throw new UnsupportedOperationException(s"nrrd type $typeName"))
      val enc = fields.getOrElse("encoding", "raw").trim
      val gzip = enc == "gzip" || enc == "gz"
      require(gzip || enc == "raw", s"nrrd encoding $enc unsupported")
      val le = fields.get("endian").forall(_.trim != "big")
      NrrdHeader(sizes, typeName, elemSize, gzip, le, dataStart, fields)
    } finally in.close()
  }

  private def decode(bb: ByteBuffer, at: Int, t: String): Double = t match {
    case "signed char" | "int8" | "int8_t" => bb.get(at).toDouble
    case s if TypeSizes(s) == 1 => (bb.get(at) & 0xff).toDouble
    case "short" | "short int" | "signed short" | "int16" | "int16_t" => bb.getShort(at).toDouble
    case s if TypeSizes(s) == 2 => (bb.getShort(at) & 0xffff).toDouble
    case "int" | "signed int" | "int32" | "int32_t" => bb.getInt(at).toDouble
    case "float" => bb.getFloat(at).toDouble
    case s if TypeSizes(s) == 4 => (bb.getInt(at).toLong & 0xffffffffL).toDouble
    case "double" => bb.getDouble(at)
    case _ => bb.getLong(at).toDouble // 8-byte integrals
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val h = header(url, spark.sparkContext.hadoopConfiguration)
    val n = h.sizes.product
    val innerN = h.sizes.dropRight(1).product // first axis fastest
    val outerN = h.sizes.last
    val schema = StructType(
      h.sizes.indices.map(i => StructField(s"dim$i", LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val hB = h
    val le = h.littleEndian

    def rowsOf(bytes: Array[Byte], flatFrom: Long, count: Int): Iterator[Row] = {
      val bb = ByteBuffer.wrap(bytes).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      (0 until count).iterator.map { k =>
        var rest = flatFrom + k
        val coords = hB.sizes.map { s => val c = rest % s; rest /= s; c }
        Row.fromSeq(coords :+ decode(bb, k * hB.elemSize, hB.typeName))
      }
    }

    val rowsRdd =
      if (h.gzip) {
        // no random access into the stream: one task inflates, still off
        // the driver
        spark.sparkContext.parallelize(Seq(url), 1).flatMap { u =>
          val fs = FileSystem.get(new URI(u).resolve("/"), sconf.value)
          val in = fs.open(new Path(u))
          val all = try in.readAllBytes() finally in.close()
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(all, hB.dataStart.toInt, all.length - hB.dataStart.toInt))
          val data = try gz.readAllBytes() finally gz.close()
          rowsOf(data, 0L, (n min (data.length / hB.elemSize).toLong).toInt)
        }
      } else {
        val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
        val ranges = (0 until parts).map { p =>
          (outerN * p / parts, outerN * (p + 1) / parts)
        }.filter { case (lo, hi) => hi > lo }
        spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
          val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
          val in = fs.open(new Path(url))
          val slab = new Array[Byte](((hi - lo) * innerN * hB.elemSize).toInt)
          try in.readFully(hB.dataStart + lo * innerN * hB.elemSize, slab) finally in.close()
          rowsOf(slab, lo * innerN, ((hi - lo) * innerN).toInt)
        }
      }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class NrrdReaderImpl extends Reader {
  val name = "nrrd_reader"
  val implementsKinds = Set("nrrd")
  def read(spark: SparkSession, ref: DataRef): DataFrame = NrrdReader.read(spark, ref.url)
}
