package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native MATLAB .mat Level-5 reader (published MAT-file format;
  * reference datatypes.py:503 MatlabArray, read there via
  * `scipy.io.loadmat`). Numeric 2-D matrices — double/single/integer
  * classes, including MATLAB's compact storage where a double array is
  * written with a narrower integer wire type — and char-matrix
  * variables, both plain and zlib-wrapped (miCOMPRESSED). Cell/struct
  * containers are listed but not readable.
  *
  * The driver walks only the top-level element tags (type + byte count
  * per variable — no data); each executor task then decodes its own
  * variable's bytes, so many-variable files parallelize per variable.
  * Output is the long-form `(variable, row, col, value)` frame shared
  * by the chunked-array readers, column-major order unrolled.
  */
object MatlabReader {

  private val MiSizes = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 2, 5 -> 4, 6 -> 4, 7 -> 4, 9 -> 8, 12 -> 8, 13 -> 8)

  private def order(bytes: Array[Byte]): ByteOrder =
    if (bytes(126) == 'I' && bytes(127) == 'M') ByteOrder.LITTLE_ENDIAN
    else if (bytes(126) == 'M' && bytes(127) == 'I') ByteOrder.BIG_ENDIAN
    else throw new IllegalArgumentException("not a MAT v5 file (bad endian indicator)")

  private def readAll(url: String, conf: Configuration): Array[Byte] = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try in.readAllBytes() finally in.close()
  }

  /** (tag type, data start, data length, next element offset) — handles
    * the small-element packing (type and size share the first word).
    */
  private def tag(b: Array[Byte], pos: Int, ord: ByteOrder): (Int, Int, Int, Int) = {
    val bb = ByteBuffer.wrap(b).order(ord)
    val word = bb.getInt(pos)
    if ((word >>> 16) != 0) { // small element: size in high 16 bits
      ((word & 0xffff), pos + 4, word >>> 16, pos + 8)
    } else {
      val len = bb.getInt(pos + 4)
      // miCOMPRESSED (15) is exempt from the 8-byte padding rule
      val adv = if (word == 15) len else (len + 7) & ~7
      (word, pos + 8, len, pos + 8 + adv)
    }
  }

  private def inflate(b: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated miCOMPRESSED element")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def numbers(b: Array[Byte], off: Int, len: Int, miType: Int, ord: ByteOrder): Array[Double] = {
    val w = MiSizes.getOrElse(miType, throw new UnsupportedOperationException(s"mat wire type $miType"))
    val n = len / w
    val bb = ByteBuffer.wrap(b, off, len).order(ord)
    miType match {
      case 1  => Array.tabulate(n)(i => b(off + i).toDouble)
      case 2  => Array.tabulate(n)(i => (b(off + i) & 0xff).toDouble)
      case 3  => Array.tabulate(n)(i => bb.getShort(off + i * 2).toDouble)
      case 4  => Array.tabulate(n)(i => (bb.getShort(off + i * 2) & 0xffff).toDouble)
      case 5  => Array.tabulate(n)(i => bb.getInt(off + i * 4).toDouble)
      case 6  => Array.tabulate(n)(i => (bb.getInt(off + i * 4).toLong & 0xffffffffL).toDouble)
      case 7  => Array.tabulate(n)(i => bb.getFloat(off + i * 4).toDouble)
      case 9  => Array.tabulate(n)(i => bb.getDouble(off + i * 8))
      case 12 | 13 => Array.tabulate(n)(i => bb.getLong(off + i * 8).toDouble)
    }
  }

  final case class MatVar(name: String, matClass: Int, rows: Int, cols: Int, numeric: Boolean)

  /** Parse one miMATRIX element body. Returns the variable plus, when
    * numeric/char, its column-major values.
    */
  private def matrix(b: Array[Byte], from: Int, to: Int, ord: ByteOrder): (MatVar, Option[Array[Double]], Option[String]) = {
    val bb = ByteBuffer.wrap(b).order(ord)
    var pos = from
    // 1. array flags (miUINT32 x2)
    val (t1, d1, _, n1) = tag(b, pos, ord)
    require(t1 == 6, s"expected array-flags subelement, got type $t1")
    val flagsWord = bb.getInt(d1)
    val matClass = flagsWord & 0xff
    pos = n1
    // 2. dimensions (miINT32)
    val (t2, d2, l2, n2) = tag(b, pos, ord)
    require(t2 == 5, s"expected dimensions subelement, got type $t2")
    val dims = (0 until l2 / 4).map(i => bb.getInt(d2 + i * 4))
    require(dims.length == 2, s"only 2-D matrices supported, got ${dims.length}-D")
    pos = n2
    // 3. name (miINT8)
    val (t3, d3, l3, n3) = tag(b, pos, ord)
    require(t3 == 1, s"expected name subelement, got type $t3")
    val name = new String(b, d3, l3, "UTF-8")
    pos = n3
    val numericClasses = Set(6, 7, 8, 9, 10, 11, 12, 13)
    if (numericClasses.contains(matClass)) {
      val (t4, d4, l4, _) = tag(b, pos, ord)
      (MatVar(name, matClass, dims(0), dims(1), numeric = true), Some(numbers(b, d4, l4, t4, ord)), None)
    } else if (matClass == 4) { // char matrix → row-wise string(s)
      val (t4, d4, l4, _) = tag(b, pos, ord)
      val chars = t4 match {
        case 4 => (0 until l4 / 2).map(i => bb.getShort(d4 + i * 2).toChar) // miUINT16 utf16-ish
        case 1 | 2 => (0 until l4).map(i => (b(d4 + i) & 0xff).toChar)
        case other => throw new UnsupportedOperationException(s"char wire type $other")
      }
      // column-major: row r's string is chars(r), chars(r + rows), ...
      val s = (0 until dims(0)).map { r =>
        (0 until dims(1)).map(c => chars(c * dims(0) + r)).mkString
      }.mkString("\n")
      (MatVar(name, matClass, dims(0), dims(1), numeric = false), None, Some(s))
    } else {
      (MatVar(name, matClass, dims(0), dims(1), numeric = false), None, None)
    }
  }

  /** Top-level walk: (element offset, length, compressed?) per variable. */
  private def elements(b: Array[Byte], ord: ByteOrder): Seq[(Int, Int, Boolean)] = {
    var pos = 128
    val out = Seq.newBuilder[(Int, Int, Boolean)]
    while (pos + 8 <= b.length) {
      val (t, d, l, next) = tag(b, pos, ord)
      t match {
        case 15 => out += ((d, l, true))
        case 14 => out += ((d, l, false))
        case _  => () // skip non-matrix top-level elements
      }
      pos = next
    }
    out.result()
  }

  /** Driver-side tag walk with positioned reads — 8 bytes per element,
    * never the payloads, so huge .mat files stay off the driver heap.
    */
  private def elementOffsets(url: String, conf: Configuration): (Seq[(Long, Int, Boolean)], Boolean) = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try {
      val fileLen = fs.getFileStatus(new Path(url)).getLen
      val head = new Array[Byte](128)
      in.readFully(0, head)
      val ord = order(head)
      val bigEndian = ord == ByteOrder.BIG_ENDIAN
      val tagBuf = new Array[Byte](8)
      var pos = 128L
      val out = Seq.newBuilder[(Long, Int, Boolean)]
      while (pos + 8 <= fileLen) {
        in.readFully(pos, tagBuf)
        val bb = ByteBuffer.wrap(tagBuf).order(ord)
        val word = bb.getInt(0)
        val (t, dataAt, len, next) =
          if ((word >>> 16) != 0) ((word & 0xffff), pos + 4, word >>> 16, pos + 8)
          else {
            val l = bb.getInt(4)
            // miCOMPRESSED elements are exempt from the 8-byte padding rule;
            // MATLAB writes the next tag immediately after the deflate stream
            val padded = if (word == 15) l else (l + 7) & ~7
            (word, pos + 8, l, pos + 8 + padded)
          }
        t match {
          case 15 => out += ((dataAt, len, true))
          case 14 => out += ((dataAt, len, false))
          case _  => ()
        }
        pos = next
      }
      (out.result(), bigEndian)
    } finally in.close()
  }

  private def decodeElement(b: Array[Byte], off: Int, len: Int, compressed: Boolean, ord: ByteOrder): (MatVar, Option[Array[Double]], Option[String]) =
    if (!compressed) matrix(b, off, off + len, ord)
    else {
      val raw = inflate(b, off, len)
      val (t, d, l, _) = tag(raw, 0, ord)
      require(t == 14, s"compressed element holds type $t, expected miMATRIX")
      matrix(raw, d, d + l, ord)
    }

  /** List variables without decoding data payloads fully. */
  def variables(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf()): Seq[MatVar] = {
    val b = readAll(url, conf)
    val ord = order(b)
    elements(b, ord).map { case (off, len, comp) => decodeElement(b, off, len, comp, ord)._1 }
  }

  val schema: StructType = StructType(Seq(
    StructField("variable", StringType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Read all numeric matrices, one task per variable. The driver walks
    * only the 8-byte element tags; each executor task reads ITS OWN
    * element's byte range with a positioned read.
    */
  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (elems, bigEndian) = elementOffsets(url, conf)
    val sconf = graft.core.SerializableHadoopConf(conf)
    val rdd = spark.sparkContext.parallelize(elems, math.max(1, math.min(elems.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (off, len, comp) =>
        val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
        val in = fs.open(new Path(url))
        val body = new Array[Byte](len)
        try in.readFully(off, body) finally in.close()
        val o = if (bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
        val (v, nums, _) =
          if (comp) {
            val raw = inflate(body, 0, len)
            val (t, d, l, _) = tag(raw, 0, o)
            require(t == 14, s"compressed element holds type $t, expected miMATRIX")
            matrix(raw, d, d + l, o)
          } else matrix(body, 0, len, o)
        nums.toSeq.flatMap { vals =>
          vals.iterator.zipWithIndex.map { case (x, k) =>
            Row(v.name, (k % v.rows).toLong, (k / v.rows).toLong, x)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

class MatlabReaderImpl extends Reader {
  val name = "matlab_reader"
  val implementsKinds = Set("matlab")
  def read(spark: SparkSession, ref: DataRef): DataFrame = MatlabReader.read(spark, ref.url)
}
