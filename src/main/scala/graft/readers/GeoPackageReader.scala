package graft.readers

import graft.datatypes.DataRef
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoPackage reader (published OGC GeoPackage + WKB specs; reference
  * datatypes.py:797 GeoPackage, read there via geopandas/fiona). A
  * GeoPackage IS a SQLite database, so the native [[SqliteReader]] does
  * the page scanning; this layer reads the `gpkg_contents` /
  * `gpkg_geometry_columns` registries and decodes each feature's
  * geometry blob — the `GP` header (flags govern the envelope size)
  * followed by 2-D WKB Point/LineString/Polygon/Multi* — into the same
  * `geometry_type` + `geometry_json` columns the GeoJSON and Shapefile
  * readers emit, alongside the table's attribute columns.
  */
object GeoPackageReader {

  /** Feature tables registered in gpkg_contents. */
  def featureTables(spark: SparkSession, url: String): Seq[(String, String)] = {
    val contents = SqliteReader.read(spark, url, "gpkg_contents")
      .filter(col("data_type") === "features")
      .select("table_name").collect().map(_.getString(0)).toSeq
    val geomCols = SqliteReader.read(spark, url, "gpkg_geometry_columns")
      .select("table_name", "column_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    contents.map(t => t -> geomCols.getOrElse(t, "geom"))
  }

  /** Decode a GPKG geometry blob to (type, GeoJSON geometry). */
  private[readers] def decodeGeometry(blob: Array[Byte]): Option[(String, String)] = {
    if (blob == null || blob.length < 8 || blob(0) != 'G' || blob(1) != 'P') return None
    val flags = blob(3) & 0xff
    val envelopeWords = (flags >> 1) & 0x07 match {
      case 0 => 0
      case 1 => 4
      case 2 | 3 => 6
      case 4 => 8
      case _ => return None // invalid
    }
    wkb(blob, 8 + envelopeWords * 8).map(_._1)
  }

  private def fmt(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString

  /** Parse one WKB geometry at `off`; returns ((type, json), next offset). */
  private def wkb(b: Array[Byte], off: Int): Option[((String, String), Int)] = {
    if (off + 5 > b.length) return None
    val order = if (b(off) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(b).order(order)
    def pt(p: Int): String = s"[${fmt(bb.getDouble(p))},${fmt(bb.getDouble(p + 8))}]"
    def ring(p0: Int): (String, Int) = {
      val n = bb.getInt(p0)
      val pts = (0 until n).map(i => pt(p0 + 4 + i * 16)).mkString(",")
      (s"[$pts]", p0 + 4 + n * 16)
    }
    bb.getInt(off + 1) match {
      case 1 =>
        Some((("Point", s"""{"type":"Point","coordinates":${pt(off + 5)}}"""), off + 21))
      case 2 =>
        val (coords, next) = ring(off + 5)
        Some((("LineString", s"""{"type":"LineString","coordinates":$coords}"""), next))
      case 3 =>
        val nRings = bb.getInt(off + 5)
        var p = off + 9
        val rings = (0 until nRings).map { _ => val (r, np) = ring(p); p = np; r }
        Some((("Polygon", s"""{"type":"Polygon","coordinates":[${rings.mkString(",")}]}"""), p))
      case t @ (4 | 5 | 6) =>
        val n = bb.getInt(off + 5)
        var p = off + 9
        val parts = (0 until n).flatMap { _ =>
          wkb(b, p).map { case ((_, json), np) =>
            p = np
            // inner geometries carry their own type tag; strip to coordinates
            json.substring(json.indexOf("\"coordinates\":") + 14, json.length - 1)
          }
        }
        val name = t match { case 4 => "MultiPoint"; case 5 => "MultiLineString"; case _ => "MultiPolygon" }
        Some(((name, s"""{"type":"$name","coordinates":[${parts.mkString(",")}]}"""), p))
      case _ => None
    }
  }

  /** Read one feature table (or the first registered one). */
  def read(spark: SparkSession, url: String, table: Option[String] = None): DataFrame = {
    val tables = featureTables(spark, url)
    require(tables.nonEmpty, s"no feature tables registered in $url")
    val (t, geomCol) = table.map(n => tables.find(_._1 == n)
        .getOrElse(throw new NoSuchElementException(s"feature table $n not in ${tables.map(_._1).mkString(", ")}")))
      .getOrElse(tables.head)
    val raw = SqliteReader.read(spark, url, t)
    val dec = udf { (blob: Array[Byte]) => decodeGeometry(blob) }
    raw.withColumn("_g", dec(col(geomCol)))
      .withColumn("geometry_type", col("_g._1"))
      .withColumn("geometry_json", col("_g._2"))
      .drop("_g", geomCol)
  }
}

class GeoPackageReaderImpl extends Reader {
  val name = "geopackage_reader"
  val implementsKinds = Set("geopackage")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    GeoPackageReader.read(spark, ref.url, ref.options.get("table"))
}
