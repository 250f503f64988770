package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native ESRI Shapefile reader (published shapefile + dBase specs;
  * reference datatypes.py:786 Shapefile, read there via geopandas).
  * 2-D Point / MultiPoint / PolyLine / Polygon geometries flatten to
  * the same feature-row layout as [[GeoJsonReader]]: `(feature_id,
  * geometry_type, geometry_json, <dbf attribute columns>)`, geometry
  * rendered as a GeoJSON geometry object.
  *
  * Sidecar handling: the `.dbf` supplies attribute columns (C/N/F/L/D
  * field types), and when the `.shx` index is present its record
  * offsets split the file so executor tasks decode disjoint record
  * ranges — without it the file decodes in one task (the format has no
  * internal sync markers).
  */
object ShapefileReader {

  private def readAll(url: String, conf: Configuration): Option[Array[Byte]] = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val p = new Path(url)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(in.readAllBytes()) finally in.close()
    }
  }

  private def sibling(url: String, ext: String): String =
    url.replaceAll("\\.shp$", ext)

  // ---- geometry ------------------------------------------------------

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def point(bb: ByteBuffer, off: Int): String =
    s"[${fmt(bb.getDouble(off))},${fmt(bb.getDouble(off + 8))}]"

  /** One record's geometry → (type name, GeoJSON geometry). */
  private[readers] def geometry(b: Array[Byte], off: Int): (String, String) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    bb.getInt(off) match {
      case 0 => ("Null", """{"type":"GeometryCollection","geometries":[]}""")
      case 1 =>
        ("Point", s"""{"type":"Point","coordinates":${point(bb, off + 4)}}""")
      case 8 =>
        // MultiPoint content is type(4) + bbox(32) + NumPoints(4) + points:
        // the count sits at offset 36 and points at 40 (no parts array,
        // unlike PolyLine/Polygon)
        val n = bb.getInt(off + 36)
        val pts = (0 until n).map(i => point(bb, off + 40 + i * 16)).mkString(",")
        ("MultiPoint", s"""{"type":"MultiPoint","coordinates":[$pts]}""")
      case t @ (3 | 5) =>
        val numParts = bb.getInt(off + 36)
        val numPoints = bb.getInt(off + 40)
        val partsAt = off + 44
        val pointsAt = partsAt + numParts * 4
        val starts = (0 until numParts).map(i => bb.getInt(partsAt + i * 4)) :+ numPoints
        val rings = (0 until numParts).map { p =>
          val pts = (starts(p) until starts(p + 1)).map(i => point(bb, pointsAt + i * 16)).mkString(",")
          s"[$pts]"
        }
        if (t == 3) {
          if (numParts == 1) ("LineString", s"""{"type":"LineString","coordinates":${rings.head}}""")
          else ("MultiLineString", s"""{"type":"MultiLineString","coordinates":[${rings.mkString(",")}]}""")
        } else ("Polygon", s"""{"type":"Polygon","coordinates":[${rings.mkString(",")}]}""")
      case other => throw new UnsupportedOperationException(s"shape type $other (Z/M variants unsupported)")
    }
  }

  // ---- dbf attributes ------------------------------------------------

  private[readers] case class DbfField(name: String, typ: Char, len: Int, decimals: Int)

  private[readers] def dbfFields(b: Array[Byte]): (Seq[DbfField], Int, Int, Int) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recSize = bb.getShort(10) & 0xffff
    val fields = Seq.newBuilder[DbfField]
    var pos = 32
    while (pos < headerSize - 1 && b(pos) != 0x0d) {
      val end = (0 until 11).find(i => b(pos + i) == 0).getOrElse(11)
      fields += DbfField(new String(b, pos, end, "ISO-8859-1"), (b(pos + 11) & 0xff).toChar,
        b(pos + 16) & 0xff, b(pos + 17) & 0xff)
      pos += 32
    }
    (fields.result(), nRec, headerSize, recSize)
  }

  private def dbfType(f: DbfField): DataType = f.typ match {
    case 'N' if f.decimals == 0 && f.len < 10 => LongType
    case 'N' | 'F' => DoubleType
    case 'L' => BooleanType
    case _   => StringType // C, D, memo fallback
  }

  private def dbfValue(raw: String, f: DbfField): Any = {
    val s = raw.trim
    if (s.isEmpty) null
    else f.typ match {
      case 'N' if f.decimals == 0 && f.len < 10 => s.toLongOption.orNull
      case 'N' | 'F' => s.toDoubleOption.orNull
      case 'L' => "YyTt".contains(s.head)
      case _   => s
    }
  }

  // ---- read ----------------------------------------------------------

  def read(spark: SparkSession, url: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    require(url.endsWith(".shp"), s"expected a .shp url, got $url")
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val shpLen = fs.getFileStatus(new Path(url)).getLen
    val shpIn = fs.open(new Path(url))
    val magic = new Array[Byte](4)
    try shpIn.readFully(0, magic)
    catch { case _: Throwable => shpIn.close(); throw new java.io.FileNotFoundException(url) }
    require(ByteBuffer.wrap(magic).order(ByteOrder.BIG_ENDIAN).getInt == 9994, s"not a shapefile: $url")

    // the .dbf header is small; only its dictionary reaches the driver
    val dbf = readAll(sibling(url, ".dbf"), conf)
    val (fields, _, dbfHeaderSize, dbfRecSize) = dbf.map(dbfFields)
      .getOrElse((Nil, 0, 0, 0))

    // record offsets: from .shx when present (each entry: offset + len
    // in 16-bit words, big-endian — the index is 8 bytes per record),
    // else a sequential positioned-read walk of the record headers
    val offsets: Seq[Int] = readAll(sibling(url, ".shx"), conf) match {
      case Some(shx) =>
        val n = (shx.length - 100) / 8
        val bb = ByteBuffer.wrap(shx).order(ByteOrder.BIG_ENDIAN)
        shpIn.close()
        (0 until n).map(i => bb.getInt(100 + i * 8) * 2)
      case None =>
        val hdr = new Array[Byte](8)
        var pos = 100L
        val out = Seq.newBuilder[Int]
        try {
          while (pos + 8 <= shpLen) {
            shpIn.readFully(pos, hdr)
            out += pos.toInt
            pos += 8 + ByteBuffer.wrap(hdr).order(ByteOrder.BIG_ENDIAN).getInt(4) * 2
          }
        } finally shpIn.close()
        out.result()
    }

    val schema = StructType(
      Seq(
        StructField("feature_id", LongType, nullable = false),
        StructField("geometry_type", StringType, nullable = false),
        StructField("geometry_json", StringType, nullable = false)
      ) ++ fields.map(f => StructField(f.name, dbfType(f), nullable = true)))

    val fieldsB = fields
    val hasDbf = dbf.isDefined
    val sconf = graft.core.SerializableHadoopConf(conf)
    val parts = math.max(1, math.min(offsets.size, spark.sparkContext.defaultParallelism))
    val ranges = spark.sparkContext.parallelize(offsets.zipWithIndex, parts)
    // positioned reads per record on the executors: a task touches only
    // its own records' bytes, in both the .shp and the .dbf
    val rowsRdd = ranges.mapPartitions { it =>
      val fsEx = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val shpStream = fsEx.open(new Path(url))
      val dbfStream = if (hasDbf) Some(fsEx.open(new Path(sibling(url, ".dbf")))) else None
      val recHdr = new Array[Byte](8)
      val dbfRec = new Array[Byte](math.max(1, dbfRecSize))
      val mapped = it.map { case (off, idx) =>
        shpStream.readFully(off, recHdr)
        val contentLen = ByteBuffer.wrap(recHdr).order(ByteOrder.BIG_ENDIAN).getInt(4) * 2
        val content = new Array[Byte](contentLen)
        shpStream.readFully(off + 8, content)
        val (gType, gJson) = geometry(content, 0)
        val attrs: Seq[Any] = dbfStream match {
          case Some(d) =>
            d.readFully(dbfHeaderSize.toLong + idx.toLong * dbfRecSize, dbfRec)
            var p = 1 // skip deletion flag
            fieldsB.map { f =>
              val v = dbfValue(new String(dbfRec, p, f.len, "ISO-8859-1"), f)
              p += f.len
              v
            }
          case None => Nil
        }
        Row.fromSeq(Seq(idx.toLong, gType, gJson) ++ attrs)
      }
      new Iterator[Row] { // close streams when the task's iterator drains
        def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) { shpStream.close(); dbfStream.foreach(_.close()) }
          h
        }
        def next(): Row = mapped.next()
      }
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

class ShapefileReaderImpl extends Reader {
  val name = "shapefile_reader"
  val implementsKinds = Set("shapefile")
  def read(spark: SparkSession, ref: DataRef): DataFrame = ShapefileReader.read(spark, ref.url)
}
