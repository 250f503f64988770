package graft.readers

import graft.datatypes.DataRef
import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native MessagePack reader (published msgpack spec; reference
  * readers.py:1958 MessagePackReader — there `msgpack.unpack` into a
  * python object). Each file's byte stream decodes on an executor into
  * its top-level values; a top-level array contributes one row per
  * element (the usual records-in-an-array layout), any other value one
  * row. Values re-encode as JSON lines and flow through `spark.read
  * .json` so schema inference matches the JSON reader's semantics —
  * binary payloads surface as base64 strings, msgpack ext values as
  * `{"$ext": type, "$data": base64}`.
  */
object MessagePackReader {

  private[readers] final case class MPMap(entries: Seq[(Any, Any)])
  private[readers] final case class MPExt(typ: Int, data: Array[Byte])

  /** Decode one value; returns (value, next position). */
  private[readers] def decode(b: Array[Byte], pos: Int): (Any, Int) = {
    val t = b(pos) & 0xff
    def u16(p: Int) = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    def u32(p: Int) = ByteBuffer.wrap(b, p, 4).getInt
    def str(p: Int, len: Int) = (new String(b, p, len, "UTF-8"), p + len)
    def bin(p: Int, len: Int) = (java.util.Arrays.copyOfRange(b, p, p + len), p + len)
    def arr(p0: Int, n: Int): (Seq[Any], Int) = {
      var p = p0
      val out = Seq.newBuilder[Any]
      (0 until n).foreach { _ => val (v, np) = decode(b, p); out += v; p = np }
      (out.result(), p)
    }
    def map(p0: Int, n: Int): (MPMap, Int) = {
      var p = p0
      val out = Seq.newBuilder[(Any, Any)]
      (0 until n).foreach { _ =>
        val (k, p1) = decode(b, p); val (v, p2) = decode(b, p1); out += (k -> v); p = p2
      }
      (MPMap(out.result()), p)
    }
    def ext(p: Int, len: Int): (MPExt, Int) =
      (MPExt(b(p).toInt, java.util.Arrays.copyOfRange(b, p + 1, p + 1 + len)), p + 1 + len)

    t match {
      case x if x <= 0x7f               => (x.toLong, pos + 1)
      case x if x >= 0xe0               => (x.toByte.toLong, pos + 1)
      case x if (x & 0xf0) == 0x80      => map(pos + 1, x & 0x0f)
      case x if (x & 0xf0) == 0x90      => arr(pos + 1, x & 0x0f)
      case x if (x & 0xe0) == 0xa0      => str(pos + 1, x & 0x1f)
      case 0xc0                         => (null, pos + 1)
      case 0xc2                         => (false, pos + 1)
      case 0xc3                         => (true, pos + 1)
      case 0xc4                         => bin(pos + 2, b(pos + 1) & 0xff)
      case 0xc5                         => bin(pos + 3, u16(pos + 1))
      case 0xc6                         => bin(pos + 5, u32(pos + 1))
      case 0xc7                         => ext(pos + 3, b(pos + 1) & 0xff)
      case 0xc8                         => ext(pos + 4, u16(pos + 1))
      case 0xc9                         => ext(pos + 6, u32(pos + 1))
      case 0xca                         => (ByteBuffer.wrap(b, pos + 1, 4).getFloat.toDouble, pos + 5)
      case 0xcb                         => (ByteBuffer.wrap(b, pos + 1, 8).getDouble, pos + 9)
      case 0xcc                         => ((b(pos + 1) & 0xff).toLong, pos + 2)
      case 0xcd                         => (u16(pos + 1).toLong, pos + 3)
      case 0xce                         => (u32(pos + 1).toLong & 0xffffffffL, pos + 5)
      case 0xcf                         => (ByteBuffer.wrap(b, pos + 1, 8).getLong, pos + 9) // u64 as signed
      case 0xd0                         => (b(pos + 1).toLong, pos + 2)
      case 0xd1                         => (u16(pos + 1).toShort.toLong, pos + 3)
      case 0xd2                         => (u32(pos + 1).toLong, pos + 5)
      case 0xd3                         => (ByteBuffer.wrap(b, pos + 1, 8).getLong, pos + 9)
      case x if x >= 0xd4 && x <= 0xd8  => ext(pos + 1, 1 << (x - 0xd4))
      case 0xd9                         => str(pos + 2, b(pos + 1) & 0xff)
      case 0xda                         => str(pos + 3, u16(pos + 1))
      case 0xdb                         => str(pos + 5, u32(pos + 1))
      case 0xdc                         => arr(pos + 3, u16(pos + 1))
      case 0xdd                         => arr(pos + 5, u32(pos + 1))
      case 0xde                         => map(pos + 3, u16(pos + 1))
      case 0xdf                         => map(pos + 5, u32(pos + 1))
      case other                        => throw new UnsupportedOperationException(f"msgpack byte 0x$other%02x")
    }
  }

  /** All top-level values in a byte stream (files may concatenate). */
  private[readers] def decodeAll(b: Array[Byte]): Seq[Any] = {
    var p = 0
    val out = Seq.newBuilder[Any]
    while (p < b.length) { val (v, np) = decode(b, p); out += v; p = np }
    out.result()
  }

  private[readers] def toJson(v: Any): String = v match {
    case null            => "null"
    case s: String       => "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case c if c < ' '   => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""
    case b: Boolean      => b.toString
    case l: Long         => l.toString
    case d: Double       => if (d.isNaN || d.isInfinite) "null" else d.toString
    case bs: Array[Byte] => toJson(java.util.Base64.getEncoder.encodeToString(bs))
    case MPMap(entries)  =>
      entries.map { case (k, v2) =>
        val key = k match { case s: String => s; case other => String.valueOf(other) }
        toJson(key) + ":" + toJson(v2)
      }.mkString("{", ",", "}")
    case MPExt(typ, data) =>
      "{\"$ext\":" + typ + ",\"$data\":" + toJson(data) + "}"
    case xs: Seq[_]      => xs.map(toJson).mkString("[", ",", "]")
    case other           => toJson(String.valueOf(other))
  }

  def read(spark: SparkSession, pathOrGlob: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(pathOrGlob).select("content")
    val jsonLines = files.as[Array[Byte]].flatMap { bytes =>
      decodeAll(bytes).flatMap {
        case xs: Seq[_] => xs.map(toJson) // records-in-an-array layout
        case one        => Seq(toJson(one))
      }
    }
    spark.read.json(jsonLines)
  }
}

class MessagePackReaderImpl extends Reader {
  val name = "messagepack_reader"
  val implementsKinds = Set("messagepack")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    MessagePackReader.read(spark, ref.url)
}
