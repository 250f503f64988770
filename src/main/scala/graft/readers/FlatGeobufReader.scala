package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native FlatGeobuf reader (published flatgeobuf spec + flatbuffers
  * wire format; reference readers.py:1531 GeoPandasReader lists
  * FlatGeobuf among fiona-backed formats). No flatbuffers library —
  * the wire format (vtable-indirected tables, size-prefixed roots) is
  * decoded by hand, the same approach as the GGUF/OSMPBF parsers.
  *
  * Layout: 8 magic bytes (`fgb\x03fgb\x00`), a size-prefixed Header
  * flatbuffer (columns, geometry type, feature count, index node
  * size), an optional packed Hilbert R-tree (skipped via the published
  * size formula), then one size-prefixed Feature flatbuffer per
  * feature.
  *
  * Scale shape: the driver walks only the 4-byte size prefixes
  * (positioned reads — no payloads), splits the feature list into
  * ranges, and each executor task reads its own byte slice. Output
  * rows use the shared GeoJSON feature layout plus typed property
  * columns.
  */
object FlatGeobufReader {

  private val MagicV3 = Array[Byte]('f', 'g', 'b', 3, 'f', 'g', 'b', 0)

  // ---- minimal flatbuffers access -----------------------------------

  /** A table at absolute position `pos`: field offsets resolve through
    * the vtable; 0 = absent.
    */
  private final class Table(val b: ByteBuffer, val pos: Int) {
    private val vtable = pos - b.getInt(pos)
    private val vtableSize = b.getShort(vtable) & 0xffff
    def fieldOffset(id: Int): Int = {
      val at = 4 + id * 2
      if (at >= vtableSize) 0
      else {
        val o = b.getShort(vtable + at) & 0xffff
        if (o == 0) 0 else pos + o
      }
    }
    def u8(id: Int, dflt: Int): Int = { val o = fieldOffset(id); if (o == 0) dflt else b.get(o) & 0xff }
    def u16(id: Int, dflt: Int): Int = { val o = fieldOffset(id); if (o == 0) dflt else b.getShort(o) & 0xffff }
    def i64(id: Int, dflt: Long): Long = { val o = fieldOffset(id); if (o == 0) dflt else b.getLong(o) }
    def indirect(id: Int): Option[Int] = {
      val o = fieldOffset(id)
      if (o == 0) None else Some(o + b.getInt(o))
    }
    def string(id: Int): Option[String] = indirect(id).map { v =>
      val len = b.getInt(v)
      val arr = new Array[Byte](len)
      val dup = b.duplicate(); dup.position(v + 4); dup.get(arr)
      new String(arr, "UTF-8")
    }
    /** vector field → (element base position, length) */
    def vector(id: Int): Option[(Int, Int)] = indirect(id).map(v => (v + 4, b.getInt(v)))
    def table(id: Int): Option[Table] = indirect(id).map(new Table(b, _))
    def tableVector(id: Int): Seq[Table] = vector(id).toSeq.flatMap { case (base, n) =>
      (0 until n).map(i => new Table(b, base + i * 4 + b.getInt(base + i * 4)))
    }
  }

  private def rootTable(bytes: Array[Byte], from: Int, len: Int): Table = {
    val bb = ByteBuffer.wrap(bytes, 0, bytes.length).order(ByteOrder.LITTLE_ENDIAN)
    require(len >= 4, "flatbuffer too short")
    new Table(bb, from + bb.getInt(from))
  }

  // ---- schema --------------------------------------------------------

  final case class FgbColumn(name: String, colType: Int)
  final case class FgbHeader(
      name: String,
      geometryType: Int,
      columns: Seq[FgbColumn],
      featuresCount: Long,
      indexNodeSize: Int,
      headerEnd: Long
  )

  /** Packed Hilbert R-tree byte size (published flatgeobuf algorithm):
    * 40 bytes per node over all levels.
    */
  private[readers] def indexSize(numItems: Long, nodeSize: Int): Long = {
    if (numItems == 0 || nodeSize == 0) return 0L
    val ns = math.max(2, nodeSize).toLong
    var n = numItems
    var numNodes = n
    while (n != 1) {
      n = (n + ns - 1) / ns
      numNodes += n
    }
    numNodes * 40
  }

  def header(url: String, conf: Configuration): FgbHeader = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try {
      val head = new Array[Byte](12)
      in.readFully(0, head)
      require(head.take(8).sameElements(MagicV3), s"not a flatgeobuf v3 file: $url")
      val hdrLen = ByteBuffer.wrap(head, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      val buf = new Array[Byte](12 + hdrLen)
      in.readFully(0, buf)
      val t = rootTable(buf, 12, hdrLen)
      // Header.fbs field ids: name=0, envelope=1, geometry_type=2,
      // has_z..has_tm=3..6, columns=7, features_count=8, index_node_size=9
      val cols = t.tableVector(7).map { ct =>
        FgbColumn(ct.string(0).getOrElse(""), ct.u8(1, 0)) // Column: name=0, type=1
      }
      FgbHeader(
        name = t.string(0).getOrElse(""),
        geometryType = t.u8(2, 0),
        columns = cols,
        featuresCount = t.i64(8, 0L),
        indexNodeSize = t.u16(9, 16),
        headerEnd = 12L + hdrLen)
    } finally in.close()
  }

  // ---- geometry ------------------------------------------------------

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def positions(b: ByteBuffer, base: Int, fromPair: Int, toPair: Int): String =
    (fromPair until toPair).map { i =>
      s"[${fmt(b.getDouble(base + i * 16))},${fmt(b.getDouble(base + i * 16 + 8))}]"
    }.mkString(",")

  /** Geometry.fbs: ends=0 (vector u32), xy=1 (vector double); type=7. */
  private[readers] def geometry(g: Table, geometryType: Int): (String, String) = {
    val (xyBase, xyLen) = g.vector(1).getOrElse((0, 0))
    val nPairs = xyLen / 2
    val ends: Seq[Int] = g.vector(0) match {
      case Some((base, n)) => (0 until n).map(i => g.b.getInt(base + i * 4))
      case None => Nil
    }
    val gt = if (geometryType != 0) geometryType else g.u8(7, 0)
    gt match {
      case 1 =>
        // POINT EMPTY (no xy vector) must still emit valid JSON
        val coords = if (nPairs == 0) "[]" else positions(g.b, xyBase, 0, 1)
        ("Point", s"""{"type":"Point","coordinates":$coords}""")
      case 4 => ("MultiPoint", s"""{"type":"MultiPoint","coordinates":[${positions(g.b, xyBase, 0, nPairs)}]}""")
      case 2 => ("LineString", s"""{"type":"LineString","coordinates":[${positions(g.b, xyBase, 0, nPairs)}]}""")
      case 5 =>
        val bounds = if (ends.isEmpty) Seq(nPairs) else ends
        val parts = bounds.scanLeft(0)((_, e) => e).sliding(2).map { w =>
          s"[${positions(g.b, xyBase, w(0), w(1))}]"
        }.mkString(",")
        ("MultiLineString", s"""{"type":"MultiLineString","coordinates":[$parts]}""")
      case 3 =>
        val bounds = if (ends.isEmpty) Seq(nPairs) else ends
        val rings = bounds.scanLeft(0)((_, e) => e).sliding(2).map { w =>
          s"[${positions(g.b, xyBase, w(0), w(1))}]"
        }.mkString(",")
        ("Polygon", s"""{"type":"Polygon","coordinates":[$rings]}""")
      case other => ("Unknown", s"""{"type":"GeometryCollection","geometries":[]}""")
    }
  }

  // ---- properties ----------------------------------------------------

  /** properties ubyte vector: repeated [u16 column idx][value]; value
    * width by ColumnType (flatgeobuf enum).
    */
  private[readers] def properties(bytes: ByteBuffer, base: Int, len: Int, cols: Seq[FgbColumn]): Map[Int, Any] = {
    val out = Map.newBuilder[Int, Any]
    var p = base
    val end = base + len
    while (p + 2 <= end) {
      val idx = bytes.getShort(p) & 0xffff; p += 2
      val c = cols(idx)
      c.colType match {
        case 0 => out += idx -> bytes.get(p).toLong; p += 1                // byte
        case 1 => out += idx -> (bytes.get(p) & 0xffL); p += 1             // ubyte (unsigned)
        case 2 => out += idx -> (bytes.get(p) != 0); p += 1                // bool
        case 3 => out += idx -> bytes.getShort(p).toLong; p += 2           // short
        case 4 => out += idx -> (bytes.getShort(p) & 0xffffL); p += 2      // ushort (unsigned)
        case 5 => out += idx -> bytes.getInt(p).toLong; p += 4             // int
        case 6 => out += idx -> (bytes.getInt(p) & 0xffffffffL); p += 4    // uint (unsigned)
        case 7 | 8 => out += idx -> bytes.getLong(p); p += 8               // long/ulong (ulong > Long.MaxValue wraps negative — no unsigned 64-bit Spark type)
        case 9 => out += idx -> bytes.getFloat(p).toDouble; p += 4         // float
        case 10 => out += idx -> bytes.getDouble(p); p += 8                // double
        case 11 | 12 | 13 =>                                               // string/json/datetime
          val n = bytes.getInt(p); p += 4
          val arr = new Array[Byte](n)
          val dup = bytes.duplicate(); dup.position(p); dup.get(arr); p += n
          out += idx -> new String(arr, "UTF-8")
        case 14 =>                                                         // binary
          val n = bytes.getInt(p); p += 4
          val arr = new Array[Byte](n)
          val dup = bytes.duplicate(); dup.position(p); dup.get(arr); p += n
          out += idx -> arr
        case other => throw new UnsupportedOperationException(s"flatgeobuf column type $other")
      }
    }
    out.result()
  }

  private def propType(t: Int): DataType = t match {
    case 0 | 1 | 3 | 4 | 5 | 6 | 7 | 8 => LongType
    case 2 => BooleanType
    case 9 | 10 => DoubleType
    case 14 => BinaryType
    case _ => StringType
  }

  // ---- read ----------------------------------------------------------

  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val h = header(url, conf)
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val fileLen = fs.getFileStatus(new Path(url)).getLen
    val featuresStart = h.headerEnd + indexSize(h.featuresCount, h.indexNodeSize)

    // driver walks ONLY the 4-byte size prefixes (positioned reads)
    val in = fs.open(new Path(url))
    val offsets = Seq.newBuilder[(Long, Int)]
    try {
      val sz = new Array[Byte](4)
      var pos = featuresStart
      while (pos + 4 <= fileLen) {
        in.readFully(pos, sz)
        val len = ByteBuffer.wrap(sz).order(ByteOrder.LITTLE_ENDIAN).getInt
        offsets += ((pos, len))
        pos += 4 + len
      }
    } finally in.close()
    val feats = offsets.result()

    val schema = StructType(
      Seq(
        StructField("feature_id", LongType, nullable = false),
        StructField("geometry_type", StringType, nullable = false),
        StructField("geometry_json", StringType, nullable = false)
      ) ++ h.columns.map(c => StructField(c.name, propType(c.colType), nullable = true)))

    val cols = h.columns
    val geomType = h.geometryType
    val sconf = graft.core.SerializableHadoopConf(conf)
    val parts = math.max(1, math.min(feats.size, spark.sparkContext.defaultParallelism))
    val rowsRdd = spark.sparkContext.parallelize(feats.zipWithIndex, parts).mapPartitions { it =>
      val fsEx = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val inEx = fsEx.open(new Path(url))
      val mapped = it.map { case ((off, len), idx) =>
        val buf = new Array[Byte](4 + len)
        inEx.readFully(off, buf)
        val f = rootTable(buf, 4, len) // Feature: geometry=0, properties=1, columns=2
        val (gt, gj) = f.table(0).map(geometry(_, geomType))
          .getOrElse(("Unknown", """{"type":"GeometryCollection","geometries":[]}"""))
        val props = f.vector(1).map { case (base, n) => properties(f.b, base, n, cols) }
          .getOrElse(Map.empty[Int, Any])
        Row.fromSeq(Seq(idx.toLong, gt, gj) ++ cols.indices.map(props.get(_).orNull))
      }
      new Iterator[Row] {
        def hasNext: Boolean = { val n = mapped.hasNext; if (!n) inEx.close(); n }
        def next(): Row = mapped.next()
      }
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class FlatGeobufReaderImpl extends Reader {
  val name = "flatgeobuf_reader"
  val implementsKinds = Set("flatgeobuf")
  def read(spark: SparkSession, ref: DataRef): DataFrame = FlatGeobufReader.read(spark, ref.url)
}
