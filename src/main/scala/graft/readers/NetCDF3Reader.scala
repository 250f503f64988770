package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** NetCDF classic (CDF-1/CDF-2) reader — the fixed binary layout of the
  * published NetCDF classic format spec, no library needed (the
  * reference reaches these files through xarray engine dispatch,
  * reference intake/readers/readers.py:1340 XArrayDatasetReader;
  * datatype datatypes.py:417).
  *
  * Header (dims, attrs, vars with begin offsets) parses on the driver —
  * it is a few KB. Values stream on the executors: each task seeks to
  * its own contiguous byte range of the variable (non-record vars are
  * contiguous at `begin`; record vars advance `recSize` per record), so
  * elements never funnel through the driver and a 100 GB variable
  * splits across the cluster by flat index range.
  *
  * Output is the long-form layout chunked arrays get everywhere in this
  * library (see ZarrReader): one row per element, dim columns named by
  * the file's real dimension names, `value` as double.
  */
object NetCDF3Reader {

  final case class NcDim(name: String, length: Int) { def isRecord: Boolean = length == 0 }
  final case class NcVar(name: String, dimIds: Seq[Int], ncType: Int, vsize: Int, begin: Long) {
    def isRecord(dims: Seq[NcDim]): Boolean = dimIds.headOption.exists(dims(_).isRecord)
  }
  final case class NcHeader(
      version: Int,
      numRecs: Int,
      dims: Seq[NcDim],
      attrs: Map[String, String],
      vars: Seq[NcVar]
  ) {
    /** Bytes advanced per record: sum of record variables' vsize — except
      * the classic-format special case of exactly one record variable of
      * byte/char/short type, whose record slabs pack WITHOUT padding (so
      * the stride is the unpadded slab size, not the 4-rounded vsize).
      */
    def recSize: Long = {
      val recVars = vars.filter(_.isRecord(dims))
      recVars match {
        case Seq(v) if v.ncType == 1 || v.ncType == 2 || v.ncType == 3 =>
          val esz = if (v.ncType == 3) 2L else 1L
          val innerN = v.dimIds.tail.map(dims(_).length.toLong).product
          val unpadded = innerN * esz
          if (unpadded % 4 != 0) unpadded else v.vsize.toLong
        case _ => recVars.map(_.vsize.toLong).sum
      }
    }
  }

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 => 1 // byte, char
    case 3     => 2 // short
    case 4     => 4 // int
    case 5     => 4 // float
    case 6     => 8 // double
    case other => throw new UnsupportedOperationException(s"nc_type $other")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  private final class HeaderIn(in: java.io.DataInputStream) {
    def int(): Int = in.readInt()
    def long(): Long = in.readLong()
    def name(): String = {
      val n = int()
      val b = new Array[Byte](pad4(n))
      in.readFully(b)
      new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    }
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); in.readFully(b); b }
  }

  /** Parse the header from an open stream (driver-side; a few KB). */
  def parseHeader(stream: java.io.InputStream): NcHeader = {
    val in = new HeaderIn(new java.io.DataInputStream(new java.io.BufferedInputStream(stream)))
    val magic = in.bytes(4)
    require(magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F', "not a NetCDF classic file")
    val version = magic(3).toInt
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val numRecs = in.int()

    def tagged(expected: Int): Int = {
      val tag = in.int(); val n = in.int()
      require(tag == expected || (tag == 0 && n == 0), s"bad tag $tag (expected $expected)")
      n
    }
    val dims = (0 until tagged(0x0A)).map(_ => NcDim(in.name(), in.int()))

    def attrList(): Map[String, String] =
      (0 until tagged(0x0C)).map { _ =>
        val name = in.name()
        val t = in.int()
        val n = in.int()
        val raw = in.bytes(pad4(n * typeSize(t)))
        val value =
          if (t == 2) new String(raw, 0, n, java.nio.charset.StandardCharsets.UTF_8)
          else {
            val bb = java.nio.ByteBuffer.wrap(raw)
            (0 until n).map { i =>
              t match {
                case 1 => raw(i).toString
                case 3 => bb.getShort(i * 2).toString
                case 4 => bb.getInt(i * 4).toString
                case 5 => bb.getFloat(i * 4).toString
                case 6 => bb.getDouble(i * 8).toString
              }
            }.mkString(",")
          }
        name -> value
      }.toMap

    val gatts = attrList()
    val vars = (0 until tagged(0x0B)).map { _ =>
      val name = in.name()
      val ndims = in.int()
      val dimIds = (0 until ndims).map(_ => in.int())
      attrList() // per-var attributes: parsed and dropped (schema carries dims)
      val t = in.int()
      val vsize = in.int()
      val begin = if (version == 1) in.int().toLong & 0xffffffffL else in.long()
      NcVar(name, dimIds, t, vsize, begin)
    }
    NcHeader(version, numRecs, dims, gatts, vars)
  }

  def header(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): NcHeader = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try parseHeader(in) finally in.close()
  }

  def variables(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Seq[String] =
    header(url, conf).vars.map(_.name)

  private def decode(bb: java.nio.ByteBuffer, off: Int, t: Int): Double = t match {
    case 1 | 2 => bb.get(off).toDouble
    case 3     => bb.getShort(off).toDouble
    case 4     => bb.getInt(off).toDouble
    case 5     => bb.getFloat(off).toDouble
    case 6     => bb.getDouble(off).toDouble
  }

  /** Read one variable as a long-form DataFrame. */
  def read(spark: SparkSession, url: String, variable: String): DataFrame = {
    val hdr = header(url, spark.sparkContext.hadoopConfiguration)
    val v = hdr.vars.find(_.name == variable)
      .getOrElse(throw new NoSuchElementException(
        s"variable $variable not in $url (has ${hdr.vars.map(_.name).mkString(", ")})"))
    val vDims = v.dimIds.map(hdr.dims)
    val isRec = v.isRecord(hdr.dims)
    val esz = typeSize(v.ncType)
    // the outermost dimension is the task-split axis in both layouts:
    // record vars advance recSize bytes per record, fixed vars are
    // contiguous slabs of the inner dims
    val innerLens = (if (vDims.isEmpty) Nil else vDims.tail).map(_.length.toLong)
    val innerN = if (innerLens.isEmpty) 1L else innerLens.product
    val outerN: Long = if (isRec) hdr.numRecs.toLong else vDims.headOption.map(_.length.toLong).getOrElse(1L)
    val recSize = hdr.recSize

    // split the outer dimension across tasks; each task reads contiguous
    // slabs (one seek per outer index for record vars, one for the whole
    // range otherwise)
    val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      val lo = outerN * p / parts
      val hi = outerN * (p + 1) / parts
      (lo, hi)
    }.filter { case (lo, hi) => hi > lo }

    val begin = v.begin
    val ncType = v.ncType
    val dimCount = innerLens.length
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val innerBytes = (innerN * esz).toInt
      try {
        (lo until hi).iterator.flatMap { outer =>
          val offset = if (isRec) begin + outer * recSize else begin + outer * innerN * esz
          val buf = new Array[Byte](innerBytes)
          in.readFully(offset, buf)
          val bb = java.nio.ByteBuffer.wrap(buf)
          (0L until innerN).map { k =>
            // flat inner index -> per-dim indices, row-major
            val idxs = new Array[Long](dimCount)
            var rem = k
            var d = dimCount - 1
            while (d >= 0) { idxs(d) = rem % innerLens(d); rem /= innerLens(d); d -= 1 }
            Row.fromSeq(outer +: idxs.toSeq :+ decode(bb, (k * esz).toInt, ncType))
          }
        }.toSeq
      } finally in.close()
    }
    val dimNames =
      if (vDims.isEmpty) Seq("dim0")
      else vDims.map(_.name)
    val schema = StructType(
      dimNames.map(n => StructField(n, LongType, nullable = false)) :+
        StructField("value", DoubleType, nullable = false))
    spark.createDataFrame(rowsRdd, schema)
  }
}

class NetCDF3ReaderImpl extends Reader {
  val name = "netcdf3_reader"
  val implementsKinds = Set("netcdf3")
  def read(spark: SparkSession, ref: DataRef): DataFrame = {
    val variable = ref.options.getOrElse("variable",
      NetCDF3Reader.variables(ref.url, spark.sparkContext.hadoopConfiguration).headOption
        .getOrElse(throw new IllegalArgumentException(s"no variables in ${ref.url}")))
    NetCDF3Reader.read(spark, ref.url, variable)
  }
}
