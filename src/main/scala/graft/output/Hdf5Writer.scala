package graft.output

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** HDF5 writer (reference `output.py:60` PandasToHDF5 —
  * `DataFrame.to_hdf(url, key)`): emits a spec-valid HDF5 file from
  * scratch — no library — laid out as one group per `key` with one 1-D
  * contiguous dataset per column. NOTE this is a plain columnar HDF5
  * layout, not the PyTables structure `pandas.read_hdf` expects
  * (axis0/block0_values + pandas_type attributes): compatibility is
  * verified in-repo (write→[[graft.inspect.Hdf5Inspect]]/Hdf5Reader
  * round-trip specs), and generic HDF5 tools that walk compact Link
  * messages can traverse it; pandas-readability is NOT claimed.
  *
  * Format profile (the same one [[graft.inspect.Hdf5Inspect]] walks, so
  * write→read round-trips in-repo): superblock v2, version-2 object
  * headers ("OHDR") with compact Link messages, dataspace v2 /
  * datatype v1 / layout v3 contiguous messages, and real Jenkins
  * lookup3 checksums on the superblock and every object header (the
  * checksum HDF5 libraries verify — not zero-stuffed).
  *
  * Column types: long/int/short → fixed-point, double/float → IEEE
  * float, boolean → int8, string → fixed-length UTF-8 (padded to the
  * column max). Nulls write as 0 / NaN / empty — the caller filters
  * first if that matters.
  *
  * Scale shape: HDF5 is a single-file small-artifact export (model
  * inputs, summaries — like the PNG/WAV media sinks), NOT the 100 TB
  * sink; that is parquet. Rows collect on the driver under an explicit
  * `maxRows` bound and the write is one stream to the target FS.
  */
object Hdf5Writer {

  private val Undef = -1L // 0xFFFF_FFFF_FFFF_FFFF

  // ------------------------------------------------------------ lookup3

  private def rot(x: Int, k: Int): Int = Integer.rotateLeft(x, k)

  /** Bob Jenkins lookup3 hashlittle() — HDF5's metadata checksum. */
  private[output] def lookup3(data: Array[Byte], initval: Int = 0): Int = {
    var a = 0xdeadbeef + data.length + initval
    var b = a
    var c = a
    var p = 0
    var len = data.length
    def k32(i: Int): Int =
      (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) | ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
    while (len > 12) {
      a += k32(p); b += k32(p + 4); c += k32(p + 8)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; len -= 12
    }
    if (len == 0) return c
    // tail: fall-through byte adds, then the final mix
    if (len >= 12) c += (data(p + 11) & 0xff) << 24
    if (len >= 11) c += (data(p + 10) & 0xff) << 16
    if (len >= 10) c += (data(p + 9) & 0xff) << 8
    if (len >= 9) c += data(p + 8) & 0xff
    if (len >= 8) b += (data(p + 7) & 0xff) << 24
    if (len >= 7) b += (data(p + 6) & 0xff) << 16
    if (len >= 6) b += (data(p + 5) & 0xff) << 8
    if (len >= 5) b += data(p + 4) & 0xff
    if (len >= 4) a += (data(p + 3) & 0xff) << 24
    if (len >= 3) a += (data(p + 2) & 0xff) << 16
    if (len >= 2) a += (data(p + 1) & 0xff) << 8
    if (len >= 1) a += data(p) & 0xff
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  // ------------------------------------------------------------ messages

  /** Column plan: datatype message pieces + serialized data payload. */
  private final case class ColPlan(
      name: String,
      dtClassVer: Int,        // (version << 4) | class
      dtBits: Array[Byte],    // 3-byte class bit field
      dtProps: Array[Byte],
      elemSize: Int,
      data: Array[Byte],
      n: Long)

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN); b.putInt(v); b.array()
  }
  private def le64(v: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN); b.putLong(v); b.array()
  }

  private def msg(typ: Int, body: Array[Byte]): Array[Byte] = {
    require(body.length < 65536, s"hdf5 message body ${body.length} overflows the u16 size field")
    Array(typ.toByte) ++ le16(body.length) ++ Array(0.toByte) ++ body
  }

  private def dataspace1d(n: Long): Array[Byte] =
    msg(0x0001, Array(2.toByte, 1.toByte, 0.toByte, 1.toByte) ++ le64(n)) // v2, rank 1, simple

  private def datatypeMsg(c: ColPlan): Array[Byte] =
    msg(0x0003, Array(c.dtClassVer.toByte) ++ c.dtBits ++ le32(c.elemSize) ++ c.dtProps)

  private def layoutContiguous(addr: Long, size: Long): Array[Byte] =
    msg(0x0008, Array(3.toByte, 1.toByte) ++ le64(addr) ++ le64(size))

  private def linkMsg(name: String, addr: Long): Array[Byte] = {
    val nb = name.getBytes(StandardCharsets.UTF_8)
    require(nb.length > 0 && nb.length < 256, s"hdf5 link name length out of range: $name")
    msg(0x0006, Array(1.toByte, 0.toByte, nb.length.toByte) ++ nb ++ le64(addr))
  }

  /** OHDR v2: sig, version, flags(2-byte chunk0 size), messages, lookup3. */
  private def ohdr(messages: Array[Byte]): Array[Byte] = {
    // a ~4k-column frame overflows the u16 chunk-0 size — fail loudly
    // instead of emitting a silently-corrupt header
    require(messages.length < 65536,
      s"hdf5 object header ${messages.length} bytes overflows the u16 chunk-0 size (too many columns?)")
    val head = "OHDR".getBytes(StandardCharsets.ISO_8859_1) ++
      Array(2.toByte, 0x01.toByte) ++ le16(messages.length) ++ messages
    head ++ le32(lookup3(head))
  }

  private def superblock(rootAddr: Long, eof: Long): Array[Byte] = {
    val head = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n') ++
      Array(2.toByte, 8.toByte, 8.toByte, 0.toByte) ++
      le64(0L) ++ le64(Undef) ++ le64(eof) ++ le64(rootAddr)
    head ++ le32(lookup3(head))
  }

  // ------------------------------------------------------------ planning

  private def plan(name: String, dt: DataType, values: Seq[Any]): ColPlan = {
    val n = values.length.toLong
    require(n * 8 <= Int.MaxValue.toLong,
      s"hdf5 column $name: $n rows exceeds the 2 GiB single-buffer bound; write parquet instead")
    dt match {
      case LongType | IntegerType | ShortType | BooleanType =>
        val sz = dt match {
          case LongType => 8
          case IntegerType => 4
          case ShortType => 2
          case _ => 1
        }
        val bb = ByteBuffer.allocate((n * sz).toInt).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach { v =>
          val x: Long = v match {
            case null => 0L
            case b: java.lang.Boolean => if (b) 1L else 0L
            case num: java.lang.Number => num.longValue()
          }
          sz match {
            case 8 => bb.putLong(x)
            case 4 => bb.putInt(x.toInt)
            case 2 => bb.putShort(x.toShort)
            case 1 => bb.put(x.toByte)
          }
        }
        // fixed-point v1, signed (bit 3), LE; props: bit offset 0, precision 8*size
        ColPlan(name, 0x10, Array(0x08.toByte, 0, 0), le16(0) ++ le16(8 * sz), sz, bb.array(), n)
      case DoubleType | FloatType =>
        val sz = if (dt == DoubleType) 8 else 4
        val bb = ByteBuffer.allocate((n * sz).toInt).order(ByteOrder.LITTLE_ENDIAN)
        values.foreach { v =>
          val x: Double = v match {
            case null => Double.NaN
            case num: java.lang.Number => num.doubleValue()
          }
          if (sz == 8) bb.putDouble(x) else bb.putFloat(x.toFloat)
        }
        // IEEE float v1 LE: mantissa-normalization 2, sign bit at msb
        val (props, sign) =
          if (sz == 8) (le16(0) ++ le16(64) ++ Array(52.toByte, 11.toByte, 0.toByte, 52.toByte) ++ le32(1023), 63)
          else (le16(0) ++ le16(32) ++ Array(23.toByte, 8.toByte, 0.toByte, 23.toByte) ++ le32(127), 31)
        ColPlan(name, 0x11, Array(0x20.toByte, sign.toByte, 0), props, sz, bb.array(), n)
      case StringType =>
        val utf8 = values.map {
          case null => Array.empty[Byte]
          case s: String => s.getBytes(StandardCharsets.UTF_8)
        }
        val width = math.max(1, if (utf8.isEmpty) 1 else utf8.map(_.length).max)
        require(n * width <= Int.MaxValue.toLong,
          s"hdf5 string column $name needs ${n * width} bytes (rows x max width $width) — over the 2 GiB single-buffer bound; write parquet instead")
        val buf = new Array[Byte]((n * width).toInt)
        utf8.zipWithIndex.foreach { case (b, i) => System.arraycopy(b, 0, buf, i * width, b.length) }
        // string v1 class bit field (format spec IV.A.2.d): bits 0-3
        // padding (1 = null pad), bits 4-7 charset (1 = UTF-8), rest 0
        ColPlan(name, 0x13, Array(0x11.toByte, 0, 0), Array.empty, width, buf, n)
      case other =>
        throw new UnsupportedOperationException(s"hdf5 writer: unsupported column type $other for $name")
    }
  }

  // ------------------------------------------------------------ write

  /** Serialize `df` to HDF5 bytes: root → `key` group → one dataset per
    * column. Exposed for specs; [[write]] streams this to the FS.
    */
  def serialize(df: DataFrame, key: String, maxRows: Long = 10L * 1000 * 1000): Array[Byte] = {
    // enforce the bound BEFORE materializing: limit(maxRows+1) caps what
    // can ever reach the driver, and one extra row distinguishes
    // "exactly maxRows" from "over the bound"
    val capped = math.min(maxRows, Int.MaxValue - 1L).toInt
    val rows = df.limit(capped + 1).collect()
    require(rows.length <= capped,
      s"hdf5 is a small-artifact sink; input exceeds maxRows=$maxRows rows — write parquet instead")
    val schema = df.schema
    val cols = schema.fields.zipWithIndex.map { case (f, i) =>
      plan(f.name, f.dataType, rows.toSeq.map(_.get(i)))
    }.toSeq

    // fixed-size headers (addresses are always 8-byte fields, so sizes
    // are layout-independent): [superblock][dataset ohdrs][key group
    // ohdr][root ohdr][data blocks]
    def dsOhdr(c: ColPlan, dataAddr: Long): Array[Byte] =
      ohdr(dataspace1d(c.n) ++ datatypeMsg(c) ++ layoutContiguous(dataAddr, c.data.length.toLong))
    def groupOhdr(links: Seq[(String, Long)]): Array[Byte] =
      ohdr(links.map { case (nm, a) => linkMsg(nm, a) }.reduceOption(_ ++ _).getOrElse(Array.empty))

    val sbSize = 48
    val dsSizes = cols.map(c => dsOhdr(c, 0L).length)
    val keySize = groupOhdr(cols.map(c => c.name -> 0L)).length
    val rootSize = groupOhdr(Seq(key -> 0L)).length

    val dsAddrs = dsSizes.scanLeft(sbSize.toLong)(_ + _).init
    val keyAddr = sbSize.toLong + dsSizes.sum
    val rootAddr = keyAddr + keySize
    val dataStart = rootAddr + rootSize
    val dataAddrs = cols.map(_.data.length.toLong).scanLeft(dataStart)(_ + _).init
    val eof = dataStart + cols.map(_.data.length.toLong).sum
    require(eof <= Int.MaxValue.toLong,
      s"hdf5 file would be $eof bytes — over the 2 GiB single-buffer bound; write parquet instead")

    val out = new java.io.ByteArrayOutputStream(eof.toInt)
    out.write(superblock(rootAddr, eof))
    cols.zip(dataAddrs).foreach { case (c, da) => out.write(dsOhdr(c, da)) }
    out.write(groupOhdr(cols.zip(dsAddrs).map { case (c, a) => c.name -> a }))
    out.write(groupOhdr(Seq(key -> keyAddr)))
    cols.foreach(c => out.write(c.data))
    out.toByteArray
  }

  def write(df: DataFrame, url: String, key: String = "data", maxRows: Long = 10L * 1000 * 1000): DataRef = {
    val bytes = serialize(df, key, maxRows)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val os = fs.create(new Path(url), true)
    try os.write(bytes) finally os.close()
    DataRef("hdf5", url, Map("key" -> key))
  }
}
