package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LAS lidar point-cloud reader (published ASPRS LAS 1.2-1.4 spec;
  * detection kind `las`). The header supplies the point-data offset,
  * record format/length, count and the scale/offset transform; points
  * are FIXED-WIDTH records, so row ranges split exactly into
  * positioned-read executor tasks. Formats 0-3 share the leading
  * layout parsed here: scaled x/y/z, intensity, classification; GPS
  * time rides along for formats 1/3.
  */
object LasReader {

  private case class Header(
      dataAt: Long, recLen: Int, nPoints: Long, format: Int,
      scale: (Double, Double, Double), offset: (Double, Double, Double))

  private def header(url: String, conf: Configuration): Header = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val fileLen = fs.getFileStatus(new Path(url)).getLen
    val in = fs.open(new Path(url))
    val buf = new Array[Byte](math.min(fileLen, 375L).toInt)
    try in.readFully(0, buf) finally in.close()
    require(buf.length >= 227 && new String(buf, 0, 4, "ISO-8859-1") == "LASF", s"not a LAS file: $url")
    val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
    val verMajor = buf(24) & 0xff
    val verMinor = buf(25) & 0xff
    val dataAt = bb.getInt(96).toLong & 0xffffffffL
    val format = buf(104) & 0xff
    require(format <= 3, s"LAS point formats 0-3 supported, got $format")
    val recLen = bb.getShort(105) & 0xffff
    val legacyCount = bb.getInt(107).toLong & 0xffffffffL
    // 1.4 moves the real count to a u64 at 247 when legacy is zero
    val nPoints =
      if (verMajor == 1 && verMinor >= 4 && legacyCount == 0 && buf.length >= 255) bb.getLong(247)
      else legacyCount
    Header(dataAt, recLen, nPoints, format,
      (bb.getDouble(131), bb.getDouble(139), bb.getDouble(147)),
      (bb.getDouble(155), bb.getDouble(163), bb.getDouble(171)))
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val h = header(url, spark.sparkContext.hadoopConfiguration)
    val withGps = h.format == 1 || h.format == 3
    val parts = math.max(1, math.min(h.nPoints, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (h.nPoints * p / parts, h.nPoints * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (dataAt, recLen, sc, off) = (h.dataAt, h.recLen, h.scale, h.offset)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * recLen).toInt)
      try in.readFully(dataAt + lo * recLen, buf) finally in.close()
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      (0 until (hi - lo).toInt).iterator.map { r =>
        val p = r * recLen
        val x = off._1 + sc._1 * bb.getInt(p)
        val y = off._2 + sc._2 * bb.getInt(p + 4)
        val z = off._3 + sc._3 * bb.getInt(p + 8)
        val intensity = bb.getShort(p + 12) & 0xffff
        val classification = buf(p + 15) & 0xff
        val gps = if (withGps) bb.getDouble(p + 20) else 0.0
        Row(lo + r, x, y, z, intensity, classification, gps)
      }
    }
    val schema = StructType(Seq(
      StructField("idx", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("z", DoubleType, nullable = false),
      StructField("intensity", IntegerType, nullable = false),
      StructField("classification", IntegerType, nullable = false),
      StructField("gps_time", DoubleType, nullable = false)))
    spark.createDataFrame(rowsRdd, schema)
  }
}

class LasReaderImpl extends Reader {
  val name = "las_reader"
  val implementsKinds = Set("las")
  def read(spark: SparkSession, ref: DataRef): DataFrame = LasReader.read(spark, ref.url)
}

/** PDB molecular-structure reader (published wwPDB fixed-column text
  * format; reference datatypes.py:1537 PDBFile): ATOM/HETATM records
  * parse by their documented column ranges into one row per atom —
  * a plain distributed text scan, lines parsing on executors.
  */
object PdbReader {

  def read(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(url)
    val atoms = lines
      .filter(l => l.startsWith("ATOM") || l.startsWith("HETATM"))
      .map { l =>
        def s(from: Int, to: Int): String =
          if (l.length >= to) l.substring(from, to).trim else ""
        (
          s(0, 6),                       // record type
          s(6, 11).toIntOption.getOrElse(0),   // serial
          s(12, 16),                     // atom name
          s(17, 20),                     // residue name
          s(21, 22),                     // chain
          s(22, 26).toIntOption.getOrElse(0),  // residue seq
          s(30, 38).toDoubleOption.getOrElse(Double.NaN),
          s(38, 46).toDoubleOption.getOrElse(Double.NaN),
          s(46, 54).toDoubleOption.getOrElse(Double.NaN),
          s(76, 78)                      // element
        )
      }
    atoms.toDF("record", "serial", "atom", "residue", "chain", "res_seq", "x", "y", "z", "element")
  }
}

class PdbReaderImpl extends Reader {
  val name = "pdb_reader"
  val implementsKinds = Set("pdb_structure")
  def read(spark: SparkSession, ref: DataRef): DataFrame = PdbReader.read(spark, ref.url)
}
