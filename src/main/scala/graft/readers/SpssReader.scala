package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native SPSS .sav (system file) reader (published SPSS/PSPP system
  * file format; reference datatypes.py:1509 SPSSFile, read there via
  * `pandas.read_spss`/pyreadstat). Covers the common profile: `$FL2`
  * signature, numeric and short-string variables (string continuation
  * records folded in), the dictionary records that precede data, and
  * BOTH data layouts — uncompressed 8-byte elements and the standard
  * bytecode compression (command codes: bias-shifted values, sysmis,
  * spaces, literal follows).
  *
  * The whole file decodes in one executor task via binaryFile-style
  * whole-read: bytecode compression has no record boundaries to split
  * on (same single-task contract as TFRecord's unsharded case — .sav
  * files are survey-scale, and many files still parallelize per file).
  */
object SpssReader {

  private case class Variable(name: String, width: Int) // width 0 = numeric

  private case class Dict(vars: Seq[Variable], compressed: Boolean, bias: Double, dataAt: Int, bigEndian: Boolean)

  private def dict(b: Array[Byte]): Dict = {
    require(b.length > 200 && new String(b, 0, 4, "ISO-8859-1") == "$FL2", "not an SPSS .sav file")
    // layout code at 64 tells the byte order (it reads 2 in native order)
    val le = ByteBuffer.wrap(b, 64, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == 2
    val ord = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(b).order(ord)
    val compression = bb.getInt(72)
    val bias = bb.getDouble(84)

    val vars = Seq.newBuilder[Variable]
    var pos = 176
    var done = false
    while (!done) {
      val recType = bb.getInt(pos)
      recType match {
        case 2 => // variable record
          val typ = bb.getInt(pos + 4)
          val hasLabel = bb.getInt(pos + 8)
          val nMissing = bb.getInt(pos + 12)
          val name = new String(b, pos + 24, 8, "ISO-8859-1").trim
          pos += 32
          if (hasLabel == 1) {
            val labelLen = bb.getInt(pos)
            pos += 4 + ((labelLen + 3) & ~3)
          }
          pos += math.abs(nMissing) * 8
          if (typ >= 0) vars += Variable(name, typ) // -1 = string continuation
        case 3 => // value labels: per entry an 8-byte value, then a
          // length byte + label padded so (1 + len) is a multiple of 8
          val n = bb.getInt(pos + 4)
          var q = pos + 8
          (0 until n).foreach { _ =>
            q += 8
            val len = b(q) & 0xff
            q += ((1 + len + 7) / 8) * 8
          }
          pos = q
        case 4 => // value-label variable index record
          val n = bb.getInt(pos + 4)
          pos += 8 + n * 4
        case 6 => // document record
          val lines = bb.getInt(pos + 4)
          pos += 8 + lines * 80
        case 7 => // info record
          val size = bb.getInt(pos + 8)
          val count = bb.getInt(pos + 12)
          pos += 16 + size * count
        case 999 =>
          pos += 8
          done = true
        case other => throw new UnsupportedOperationException(s"sav dictionary record type $other at $pos")
      }
    }
    Dict(vars.result(), compression != 0, bias, pos, !le)
  }

  private[readers] def dictProbe(b: Array[Byte]): Unit = dict(b)

  private val SysMis = Double.MinValue // stand-in; actual sysmis detected by command code / -DBL_MAX

  /** Decode the data section into per-case element arrays. Each case is
    * one 8-byte element per numeric var plus ceil(width/8) per string.
    */
  private def cases(b: Array[Byte], d: Dict): Iterator[Seq[Any]] = {
    val ord = if (d.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN

    // stream of 8-byte elements: raw, or bytecode-decompressed
    val elements: Iterator[Either[Double, Array[Byte]]] =
      if (!d.compressed) {
        Iterator.range(d.dataAt, b.length - 7, 8).map { p =>
          Right(java.util.Arrays.copyOfRange(b, p, p + 8))
        }
      } else new Iterator[Either[Double, Array[Byte]]] {
        // one command block = 8 one-byte codes, followed by the 8-byte
        // literal payloads its 253-codes reference, then the next block
        private var pos = d.dataAt
        private val pending = scala.collection.mutable.Queue[Either[Double, Array[Byte]]]()
        private def loadBlock(): Unit = {
          var lit = pos + 8
          var ended = false
          (0 until 8).foreach { i =>
            if (!ended) (b(pos + i) & 0xff) match {
              case 0   => () // padding
              case 252 => ended = true // end of data
              case 253 =>
                if (lit + 8 <= b.length) {
                  pending.enqueue(Right(java.util.Arrays.copyOfRange(b, lit, lit + 8)))
                  lit += 8
                } else ended = true
              case 254 => pending.enqueue(Right("        ".getBytes("ISO-8859-1")))
              case 255 => pending.enqueue(Left(SysMis))
              case n   => pending.enqueue(Left(n - d.bias))
            }
          }
          pos = if (ended) b.length else lit
        }
        def hasNext: Boolean = {
          while (pending.isEmpty && pos + 8 <= b.length) loadBlock()
          pending.nonEmpty
        }
        def next(): Either[Double, Array[Byte]] = { hasNext; pending.dequeue() }
      }

    val stream = elements.buffered
    new Iterator[Seq[Any]] {
      def hasNext: Boolean = stream.hasNext
      def next(): Seq[Any] = {
        val out = Seq.newBuilder[Any]
        d.vars.foreach { v =>
          if (v.width == 0) {
            val e = stream.next()
            val num = e match {
              case Left(SysMis) => null
              case Left(x) => x
              case Right(bytes) =>
                val x = ByteBuffer.wrap(bytes).order(ord).getDouble
                if (x == -java.lang.Double.MAX_VALUE) null else x
            }
            out += num
          } else {
            val nseg = (v.width + 7) / 8
            val sb = new StringBuilder
            (0 until nseg).foreach { _ =>
              stream.next() match {
                case Right(bytes) => sb.append(new String(bytes, "ISO-8859-1"))
                case Left(_)      => sb.append("        ")
              }
            }
            val s = sb.toString.take(v.width).trim
            out += (if (s.isEmpty) null else s)
          }
        }
        out.result()
      }
    }
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val fileLen = fs.getFileStatus(new Path(url)).getLen
    // the dictionary sits at the front; parse it from a growing prefix
    // so only metadata reaches the driver
    val in = fs.open(new Path(url))
    val d = try {
      var prefix = math.min(fileLen, 256L * 1024).toInt
      var parsed: Option[Dict] = None
      while (parsed.isEmpty) {
        val buf = new Array[Byte](prefix)
        in.readFully(0, buf)
        try parsed = Some(dict(buf))
        catch {
          case _: IndexOutOfBoundsException | _: ArrayIndexOutOfBoundsException if prefix < fileLen =>
            prefix = math.min(fileLen, prefix.toLong * 4).toInt
        }
      }
      parsed.get
    } finally in.close()
    val schema = StructType(d.vars.map { v =>
      StructField(v.name, if (v.width == 0) DoubleType else StringType, nullable = true)
    })
    // decode distributed as one task (no splittable boundaries), but off
    // the driver: ship bytes via parallelize of the single unit
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rows = spark.sparkContext.parallelize(Seq(url), 1).flatMap { u =>
      val fsEx = FileSystem.get(new URI(u).resolve("/"), sconf.value)
      val inEx = fsEx.open(new Path(u))
      val bs = try inEx.readAllBytes() finally inEx.close()
      val dd = dict(bs)
      cases(bs, dd).map(Row.fromSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}

class SpssReaderImpl extends Reader {
  val name = "spss_reader"
  val implementsKinds = Set("spss")
  def read(spark: SparkSession, ref: DataRef): DataFrame = SpssReader.read(spark, ref.url)
}
