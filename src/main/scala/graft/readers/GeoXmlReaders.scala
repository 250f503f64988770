package graft.readers

import graft.datatypes.DataRef
import java.io.ByteArrayInputStream
import javax.xml.XMLConstants
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.{Document, Element}

/** KML and GPX readers over the JDK's DOM parser (reference
  * readers.py:2287 KMLReader via geopandas/fiona, :2301 GPXReader) —
  * both formats are plain XML, so no geo library is needed.
  *
  * Files parse executor-side from `wholetext` rows: one task per file
  * (a KML/GPX document is a single XML tree — there is no intra-file
  * split point), many files parallelize per-file. Output rows use the
  * same flattened feature layout as [[GeoJsonReader]].
  */
object GeoXmlReaders {

  private def parseXml(content: String): Document = {
    val f = DocumentBuilderFactory.newInstance()
    // harden: no DTDs/entities (untrusted input), no namespace fuss
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(content.getBytes("UTF-8")))
  }

  private def elems(e: Element, tag: String): Seq[Element] = {
    val nl = e.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  private def childText(e: Element, tag: String): Option[String] = {
    var n = e.getFirstChild
    while (n != null) {
      if (n.getNodeType == org.w3c.dom.Node.ELEMENT_NODE && n.getNodeName == tag)
        return Option(n.getTextContent).map(_.trim)
      n = n.getNextSibling
    }
    None
  }

  // ---- KML ----------------------------------------------------------

  /** `<coordinates>` text (lon,lat[,alt] whitespace-separated tuples) →
    * GeoJSON positions array text.
    */
  private def kmlCoords(text: String): String =
    text.trim.split("\\s+").filter(_.nonEmpty).map { tuple =>
      val p = tuple.split(",")
      s"[${p(0)},${p(1)}]"
    }.mkString(",")

  /** One Placemark → (name, description, geometry_type, geometry_json). */
  private[readers] def placemark(pm: Element): (String, String, String, String) = {
    val name = childText(pm, "name").getOrElse("")
    val desc = childText(pm, "description").getOrElse("")
    val (gType, gJson) =
      elems(pm, "Point").headOption.map { p =>
        val c = kmlCoords(p.getElementsByTagName("coordinates").item(0).getTextContent)
        ("Point", s"""{"type":"Point","coordinates":$c}""")
      }.orElse(elems(pm, "LineString").headOption.map { l =>
        val c = kmlCoords(l.getElementsByTagName("coordinates").item(0).getTextContent)
        ("LineString", s"""{"type":"LineString","coordinates":[$c]}""")
      }).orElse(elems(pm, "Polygon").headOption.map { poly =>
        // outerBoundaryIs ring first, then any innerBoundaryIs rings
        val outer = elems(poly, "outerBoundaryIs").flatMap(o => elems(o, "coordinates"))
        val inner = elems(poly, "innerBoundaryIs").flatMap(i => elems(i, "coordinates"))
        val rings = (outer ++ inner).map(c => s"[${kmlCoords(c.getTextContent)}]")
        ("Polygon", s"""{"type":"Polygon","coordinates":[${rings.mkString(",")}]}""")
      }).getOrElse(("Unknown", """{"type":"GeometryCollection","geometries":[]}"""))
    (name, desc, gType, gJson)
  }

  /** KML Placemarks → (feature_id, name, description, geometry_type,
    * geometry_json).
    */
  def kml(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(url).as[String]
      .flatMap { content =>
        val doc = parseXml(content)
        val pms = doc.getElementsByTagName("Placemark")
        (0 until pms.getLength).map { i =>
          val (n, d, t, g) = placemark(pms.item(i).asInstanceOf[Element])
          (i.toLong, n, d, t, g)
        }
      }
      .toDF("feature_id", "name", "description", "geometry_type", "geometry_json")
  }

  // ---- GPX ----------------------------------------------------------

  /** GPX waypoints/route points/track points → one row per point:
    * (kind, seq, lat, lon, ele, time, name) with kind in
    * wpt/rtept/trkpt.
    */
  def gpx(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(url).as[String]
      .flatMap { content =>
        val doc = parseXml(content)
        Seq("wpt", "rtept", "trkpt").flatMap { tag =>
          val nl = doc.getElementsByTagName(tag)
          (0 until nl.getLength).map { i =>
            val e = nl.item(i).asInstanceOf[Element]
            (tag, i.toLong,
              e.getAttribute("lat").toDouble, e.getAttribute("lon").toDouble,
              childText(e, "ele").map(_.toDouble),
              childText(e, "time"),
              childText(e, "name"))
          }
        }
      }
      .toDF("kind", "seq", "lat", "lon", "ele", "time", "name")
  }
}

class KmlReaderImpl extends Reader {
  val name = "kml_reader"
  val implementsKinds = Set("kml")
  def read(spark: SparkSession, ref: DataRef): DataFrame = GeoXmlReaders.kml(spark, ref.url)
}

class GpxReaderImpl extends Reader {
  val name = "gpx_reader"
  val implementsKinds = Set("gpx")
  def read(spark: SparkSession, ref: DataRef): DataFrame = GeoXmlReaders.gpx(spark, ref.url)
}
