package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** SAS Transport (XPORT v5) reader — the published TS-140 format
  * (reference readers.py:2410 reads SAS via pandas, which covers .xpt
  * the same way). 80-byte ASCII header records, NAMESTR variable
  * descriptors (140-byte big-endian structs), then fixed-width
  * observation records whose numerics are IBM System/360 hexadecimal
  * floats (truncated widths 2-8 supported).
  *
  * The driver reads only the header area (a few KB: records up to the
  * OBS marker); observation rows split across executor tasks by row
  * range with positioned reads — the StataReader shape.
  */
object XptReader {

  final case class XptVar(name: String, isNum: Boolean, length: Int, pos: Int)
  final case class XptMeta(vars: Seq[XptVar], rowLength: Int, dataStart: Long, nObs: Long)

  /** IBM 64-bit hex float → double. Base-16 exponent (excess 64), 56-bit
    * fraction in 0.f form; truncated widths zero-extend. All-zero bytes
    * (and blank-padded missing '.') decode to null upstream.
    */
  private[readers] def ibmToDouble(b: Array[Byte], off: Int, len: Int): Double = {
    val full = new Array[Byte](8)
    System.arraycopy(b, off, full, 0, len)
    val sign = if ((full(0) & 0x80) != 0) -1.0 else 1.0
    val exp = (full(0) & 0x7f) - 64
    var frac = 0.0
    var scale = 1.0 / 256.0
    var i = 1
    while (i < 8) {
      frac += (full(i) & 0xff) * scale
      scale /= 256.0
      i += 1
    }
    if (frac == 0.0) 0.0 else sign * frac * math.pow(16.0, exp)
  }

  private def record(bytes: Array[Byte], i: Int): String =
    new String(bytes, i * 80, 80, "ISO-8859-1")

  def meta(url: String, conf: Configuration): XptMeta = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val fileLen = fs.getFileStatus(new Path(url)).getLen
    val in = fs.open(new Path(url))
    // header area is tiny (library + member + namestrs + obs marker);
    // read a capped prefix
    val cap = math.min(fileLen, 1 << 20).toInt
    val head = new Array[Byte](cap)
    try in.readFully(0, head) finally in.close()
    require(record(head, 0).startsWith("HEADER RECORD*******LIBRARY HEADER RECORD"),
      s"not a SAS transport (XPORT) file: $url")

    // find the NAMESTR header (carries the variable count) and the OBS
    // header that opens the data section
    val nRecords = cap / 80
    var nVars = -1
    var namestrAt = -1
    var obsAt = -1
    var i = 0
    while (i < nRecords && obsAt < 0) {
      val r = record(head, i)
      if (r.startsWith("HEADER RECORD*******NAMESTR HEADER RECORD")) {
        nVars = r.substring(48, 58).trim.toInt
        namestrAt = i + 1
      } else if (r.startsWith("HEADER RECORD*******OBS     HEADER RECORD")) {
        obsAt = i + 1
      }
      i += 1
    }
    require(nVars > 0 && obsAt > 0, s"no NAMESTR/OBS header records in $url")

    val bb = ByteBuffer.wrap(head) // big-endian by default
    val base = namestrAt * 80
    val vars = (0 until nVars).map { v =>
      val p = base + v * 140
      val ntype = bb.getShort(p) & 0xffff
      val nlng = bb.getShort(p + 4) & 0xffff
      val name = new String(head, p + 8, 8, "ISO-8859-1").trim
      val npos = bb.getInt(p + 84)
      XptVar(name, isNum = ntype == 1, nlng, npos)
    }
    val rowLength = vars.map(_.length).sum
    val dataStart = obsAt * 80L
    val nObs = (fileLen - dataStart) / rowLength
    XptMeta(vars, rowLength, dataStart, nObs)
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val m = meta(url, spark.sparkContext.hadoopConfiguration)
    val schema = StructType(m.vars.map(v =>
      StructField(v.name, if (v.isNum) DoubleType else StringType, nullable = true)))

    val parts = math.max(1, math.min(m.nObs, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (m.nObs * p / parts, m.nObs * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val mB = m
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * mB.rowLength).toInt)
      try in.readFully(mB.dataStart + lo * mB.rowLength, buf) finally in.close()
      (0 until (hi - lo).toInt).iterator.flatMap { r =>
        val rp = r * mB.rowLength
        val cells = mB.vars.map { v =>
          val at = rp + v.pos
          if (v.isNum) {
            // missing numeric per TS-140: sentinel byte ('.' 0x2E,
            // '.A'-'.Z' 0x41-0x5A, '._' 0x5F) followed by ALL-ZERO
            // bytes — the zero tail is what distinguishes a sentinel
            // from a real tiny value whose exponent byte happens to be
            // 0x2E. All-blank is tail padding; all-zero is a REAL 0.0.
            val first = buf(at) & 0xff
            val restZero = (1 until v.length).forall(k => buf(at + k) == 0)
            val isSentinel = restZero &&
              (first == '.' || first == '_' || (first >= 'A' && first <= 'Z'))
            if (isSentinel || (0 until v.length).forall(k => buf(at + k) == ' ')) null
            else ibmToDouble(buf, at, v.length)
          } else {
            val s = new String(buf, at, v.length, "ISO-8859-1").trim
            if (s.isEmpty) null else s
          }
        }
        // trailing blank-padding "rows" are all-null — drop them
        if (cells.forall(_ == null)) None else Some(Row.fromSeq(cells))
      }
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class XptReaderImpl extends Reader {
  val name = "xpt_reader"
  val implementsKinds = Set("sas")
  override def isOk(ref: DataRef): Boolean = super.isOk(ref) && ref.url.endsWith(".xpt")
  def read(spark: SparkSession, ref: DataRef): DataFrame = XptReader.read(spark, ref.url)
}
