package graft.readers

import graft.datatypes.DataRef
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native TFRecord reader (reference readers.py:904 TFRecordReader —
  * there a delegation to `tensorflow.data:TFRecordDataset`; datatype
  * datatypes.py:1007). Both layers are published formats, parsed here
  * directly:
  *
  *   - framing: `{u64le length, u32le masked_crc(length), data,
  *     u32le masked_crc(data)}` per record, where masked_crc is
  *     crc32c rotated right 15 and offset by 0xa282ead8 (the TFRecord
  *     spec's masking; `java.util.zip.CRC32C` supplies Castagnoli).
  *   - payload: `tf.train.Example` protobuf — a features map from
  *     name to one of bytes_list / float_list / int64_list — decoded
  *     by a minimal wire-format walk (varint + length-delimited;
  *     packed and unpacked repeated encodings both accepted).
  *
  * One row per record: the three typed feature maps keep the full
  * value lists. TFRecord files carry no sync markers, so a single file
  * is not splittable — parallelism comes from the file set (the
  * standard sharded `name-00000-of-00100` layout), each file decoding
  * whole on an executor via a binaryFile scan, as the NPY reader does.
  */
object TFRecordReader {

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt // u32 in low bits
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  /** Split framed records out of one file's bytes, verifying both CRCs. */
  private[readers] def records(bytes: Array[Byte]): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private var pos = 0
    def hasNext: Boolean = pos + 12 <= bytes.length
    def next(): Array[Byte] = {
      val bb = ByteBuffer.wrap(bytes, pos, 12).order(ByteOrder.LITTLE_ENDIAN)
      val len = bb.getLong
      require(len >= 0 && pos + 16 + len <= bytes.length, s"tfrecord: truncated record at $pos")
      require(bb.getInt == maskedCrc(bytes, pos, 8), s"tfrecord: length crc mismatch at $pos")
      val data = java.util.Arrays.copyOfRange(bytes, pos + 12, pos + 12 + len.toInt)
      val dataCrc = ByteBuffer.wrap(bytes, pos + 12 + len.toInt, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      require(dataCrc == maskedCrc(bytes, pos + 12, len.toInt), s"tfrecord: data crc mismatch at $pos")
      pos += 16 + len.toInt
      data
    }
  }

  // ---- minimal protobuf wire reader ----------------------------------

  private final class Wire(bytes: Array[Byte], from: Int, to: Int) {
    var pos: Int = from
    def hasMore: Boolean = pos < to
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    def fixed32(): Int = { val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt; pos += 4; v }
    def fixed64(): Long = { val v = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN).getLong; pos += 8; v }
    def delimited(): (Int, Int) = { val len = varint().toInt; val s = pos; pos += len; (s, s + len) }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"tfrecord: unsupported wire type $w")
    }
  }

  private[readers] case class Feature(
      bytesV: Seq[Array[Byte]] = Nil,
      floatV: Seq[Double] = Nil,
      int64V: Seq[Long] = Nil)

  /** Decode one tf.train.Example payload into name → Feature. */
  private[readers] def example(bytes: Array[Byte]): Map[String, Feature] = {
    def parseFeature(w: Wire): Feature = {
      var f = Feature()
      while (w.hasMore) {
        val tag = w.varint(); val field = (tag >> 3).toInt; val wire = (tag & 7).toInt
        (field, wire) match {
          case (1, 2) => // BytesList { repeated bytes value = 1 }
            val (s, e) = w.delimited(); val inner = new Wire(bytes, s, e)
            val acc = Seq.newBuilder[Array[Byte]]
            while (inner.hasMore) {
              val t = inner.varint()
              if ((t & 7) == 2 && (t >> 3) == 1) { val (bs, be) = inner.delimited(); acc += java.util.Arrays.copyOfRange(bytes, bs, be) }
              else inner.skip((t & 7).toInt)
            }
            f = f.copy(bytesV = f.bytesV ++ acc.result())
          case (2, 2) => // FloatList { repeated float value = 1 [packed] }
            val (s, e) = w.delimited(); val inner = new Wire(bytes, s, e)
            val acc = Seq.newBuilder[Double]
            while (inner.hasMore) {
              val t = inner.varint()
              (t >> 3, t & 7) match {
                case (1, 2) => val (ps, pe) = inner.delimited()
                  val pw = new Wire(bytes, ps, pe)
                  while (pw.hasMore) acc += java.lang.Float.intBitsToFloat(pw.fixed32()).toDouble
                case (1, 5) => acc += java.lang.Float.intBitsToFloat(inner.fixed32()).toDouble
                case (_, wt) => inner.skip(wt.toInt)
              }
            }
            f = f.copy(floatV = f.floatV ++ acc.result())
          case (3, 2) => // Int64List { repeated int64 value = 1 [packed] }
            val (s, e) = w.delimited(); val inner = new Wire(bytes, s, e)
            val acc = Seq.newBuilder[Long]
            while (inner.hasMore) {
              val t = inner.varint()
              (t >> 3, t & 7) match {
                case (1, 2) => val (ps, pe) = inner.delimited()
                  val pw = new Wire(bytes, ps, pe)
                  while (pw.hasMore) acc += pw.varint()
                case (1, 0) => acc += inner.varint()
                case (_, wt) => inner.skip(wt.toInt)
              }
            }
            f = f.copy(int64V = f.int64V ++ acc.result())
          case (_, wt) => w.skip(wt)
        }
      }
      f
    }

    val out = Map.newBuilder[String, Feature]
    val top = new Wire(bytes, 0, bytes.length)
    while (top.hasMore) {
      val tag = top.varint()
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // Example.features
        val (fs, fe) = top.delimited()
        val feats = new Wire(bytes, fs, fe)
        while (feats.hasMore) {
          val ft = feats.varint()
          if ((ft >> 3) == 1 && (ft & 7) == 2) { // Features.feature map entry
            val (es, ee) = feats.delimited()
            val entry = new Wire(bytes, es, ee)
            var key = ""; var value = Feature()
            while (entry.hasMore) {
              val et = entry.varint()
              (et >> 3, et & 7) match {
                case (1, 2) => val (ks, ke) = entry.delimited(); key = new String(bytes, ks, ke - ks, "UTF-8")
                case (2, 2) => val (vs, ve) = entry.delimited(); value = parseFeature(new Wire(bytes, vs, ve))
                case (_, wt) => entry.skip(wt.toInt)
              }
            }
            out += key -> value
          } else feats.skip((ft & 7).toInt)
        }
      } else top.skip((tag & 7).toInt)
    }
    out.result()
  }

  val schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("idx", LongType),
    StructField("int64_features", MapType(StringType, ArrayType(LongType))),
    StructField("float_features", MapType(StringType, ArrayType(DoubleType))),
    StructField("bytes_features", MapType(StringType, ArrayType(BinaryType)))))

  def read(spark: SparkSession, pathOrGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(pathOrGlob).select("path", "content")
    val rdd = files.rdd.flatMap { r =>
      val path = r.getString(0)
      records(r.getAs[Array[Byte]](1)).zipWithIndex.map { case (rec, i) =>
        val feats = example(rec)
        Row(path, i.toLong,
          feats.collect { case (k, f) if f.int64V.nonEmpty => k -> f.int64V },
          feats.collect { case (k, f) if f.floatV.nonEmpty => k -> f.floatV },
          feats.collect { case (k, f) if f.bytesV.nonEmpty => k -> f.bytesV })
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}

class TFRecordReaderImpl extends Reader {
  val name = "tfrecord_reader"
  val implementsKinds = Set("tfrecord")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    TFRecordReader.read(spark, ref.url)
}
