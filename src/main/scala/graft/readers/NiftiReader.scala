package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native NIfTI-1 reader (published nifti1.h layout; reference
  * datatypes.py:575 Nifti, read there via nibabel): the fixed 348-byte
  * header — rank and dims, datatype, vox_offset, scl_slope/scl_inter
  * scaling, `n+1` single-file magic — then the voxel array. Either
  * byte order (detected via sizeof_hdr). Ranks 1-3 emit long-form
  * `(dim0[, dim1[, dim2]], value)` with the slope/intercept applied,
  * matching the chunked-array convention; the outermost dimension
  * splits into positioned-read ranges across executors, driver reads
  * the header only.
  */
object NiftiReader {

  private case class Header(
      dims: Seq[Long], datatype: Int, bytesPer: Int,
      voxOffset: Long, slope: Double, inter: Double, bigEndian: Boolean)

  private val TypeBytes = Map(2 -> 1, 4 -> 2, 8 -> 4, 16 -> 4, 64 -> 8, 256 -> 1, 512 -> 2)

  private def header(url: String, conf: Configuration): Header = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    val buf = new Array[Byte](348)
    try in.readFully(0, buf) finally in.close()
    val le = ByteBuffer.wrap(buf, 0, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 348
    val be = ByteBuffer.wrap(buf, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt == 348
    require(le || be, s"not a NIfTI-1 file (sizeof_hdr != 348): $url")
    val ord = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(buf).order(ord)
    val magic = new String(buf, 344, 3, "ISO-8859-1")
    require(magic == "n+1", s"only single-file NIfTI (magic n+1) supported, got $magic")
    val rank = bb.getShort(40).toInt
    require(rank >= 1 && rank <= 3, s"supported ranks 1-3, got $rank")
    val dims = (1 to rank).map(i => bb.getShort(40 + i * 2).toLong)
    val datatype = bb.getShort(70).toInt
    val bytesPer = TypeBytes.getOrElse(datatype,
      throw new UnsupportedOperationException(s"nifti datatype $datatype"))
    val slopeRaw = bb.getFloat(112)
    Header(dims, datatype, bytesPer, bb.getFloat(108).toLong,
      if (slopeRaw == 0.0f) 1.0 else slopeRaw.toDouble, bb.getFloat(116).toDouble, !le)
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val h = header(url, spark.sparkContext.hadoopConfiguration)
    // nifti data is Fortran-ordered: dim1 varies fastest. Split on the
    // outermost (last) dim; inner block is contiguous.
    val innerN = h.dims.dropRight(1).product
    val outerN = h.dims.last
    val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (outerN * p / parts, outerN * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (dims, datatype, bytesPer, dataAt, slope, inter, bigEndian) =
      (h.dims, h.datatype, h.bytesPer, h.voxOffset, h.slope, h.inter, h.bigEndian)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * innerN * bytesPer).toInt)
      try in.readFully(dataAt + lo * innerN * bytesPer, buf) finally in.close()
      val bb = ByteBuffer.wrap(buf).order(if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      val n = ((hi - lo) * innerN).toInt
      (0 until n).iterator.map { k =>
        val raw = datatype match {
          case 2   => (buf(k) & 0xff).toDouble
          case 256 => buf(k).toDouble
          case 4   => bb.getShort(k * 2).toDouble
          case 512 => (bb.getShort(k * 2) & 0xffff).toDouble
          case 8   => bb.getInt(k * 4).toDouble
          case 16  => bb.getFloat(k * 4).toDouble
          case 64  => bb.getDouble(k * 8)
        }
        val v = inter + slope * raw
        val flat = lo * innerN + k
        // fortran order: dim1 fastest
        val idxs = dims.indices.map { d =>
          (flat / dims.take(d).product) % dims(d)
        }
        Row.fromSeq(idxs :+ v)
      }
    }
    val schema = StructType(
      dims.indices.map(d => StructField(s"dim$d", LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    spark.createDataFrame(rowsRdd, schema)
  }
}

class NiftiReaderImpl extends Reader {
  val name = "nifti_reader"
  val implementsKinds = Set("nifti")
  def read(spark: SparkSession, ref: DataRef): DataFrame = NiftiReader.read(spark, ref.url)
}
