package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.nio.file.Files

class GeoXmlReadersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val kmlPath: String = {
    val dir = Files.createTempDirectory("kml")
    val kml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<kml xmlns="http://www.opengis.net/kml/2.2">
        |<Document>
        |  <Placemark>
        |    <name>HQ</name>
        |    <description>head office</description>
        |    <Point><coordinates>-122.08,37.42,0</coordinates></Point>
        |  </Placemark>
        |  <Placemark>
        |    <name>route</name>
        |    <LineString><coordinates>
        |      0,0,0 1,1,0 2,0,0
        |    </coordinates></LineString>
        |  </Placemark>
        |  <Placemark>
        |    <name>zone</name>
        |    <Polygon><outerBoundaryIs><LinearRing>
        |      <coordinates>0,0 4,0 4,4 0,0</coordinates>
        |    </LinearRing></outerBoundaryIs></Polygon>
        |  </Placemark>
        |</Document>
        |</kml>""".stripMargin
    Files.write(dir.resolve("places.kml"), kml.getBytes("UTF-8"))
    s"file://$dir/places.kml"
  }

  private lazy val gpxPath: String = {
    val dir = Files.createTempDirectory("gpx")
    val gpx =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<gpx version="1.1" creator="fixture">
        |  <wpt lat="47.6" lon="-122.3"><name>start</name><ele>12.5</ele></wpt>
        |  <trk><name>walk</name><trkseg>
        |    <trkpt lat="47.61" lon="-122.31"><ele>13.0</ele><time>2024-01-01T10:00:00Z</time></trkpt>
        |    <trkpt lat="47.62" lon="-122.32"><ele>14.5</ele><time>2024-01-01T10:01:00Z</time></trkpt>
        |  </trkseg></trk>
        |</gpx>""".stripMargin
    Files.write(dir.resolve("walk.gpx"), gpx.getBytes("UTF-8"))
    s"file://$dir/walk.gpx"
  }

  test("kml placemarks flatten to the GeoJSON feature layout") {
    val rows = GeoXmlReaders.kml(spark, kmlPath)
      .as[(Long, String, String, String, String)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0) == ((0L, "HQ", "head office", "Point",
      """{"type":"Point","coordinates":[-122.08,37.42]}""")))
    assert(rows(1)._4 == "LineString" &&
      rows(1)._5 == """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")
    assert(rows(2)._4 == "Polygon" &&
      rows(2)._5 == """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")
  }

  test("gpx points read with attributes and child elements") {
    val df = GeoXmlReaders.gpx(spark, gpxPath)
    assert(df.columns.toSeq == Seq("kind", "seq", "lat", "lon", "ele", "time", "name"))
    val wpt = df.filter($"kind" === "wpt").head()
    assert(wpt.getDouble(2) == 47.6 && wpt.getDouble(3) == -122.3)
    assert(wpt.getAs[Double]("ele") == 12.5 && wpt.getAs[String]("name") == "start")
    val trk = df.filter($"kind" === "trkpt").collect().sortBy(_.getLong(1))
    assert(trk.length == 2 && trk(1).getAs[String]("time") == "2024-01-01T10:01:00Z")
  }

  test("kind detection and registry routing") {
    assert(Detect.recommend("x.kml", head = "<?xml?><kml xmlns=''>".getBytes).head.kind.name == "kml")
    assert(Detect.recommend("x.gpx", head = "<?xml?><gpx version='1.1'>".getBytes).head.kind.name == "gpx")
    assert(SparkReaders.reader("kml_reader").get.read(spark, DataRef("kml", kmlPath)).count() == 3)
    assert(SparkReaders.reader("gpx_reader").get.read(spark, DataRef("gpx", gpxPath)).count() == 3)
  }

  test("doctype declarations are rejected (no entity expansion)") {
    val dir = Files.createTempDirectory("kmlevil")
    val evil = """<?xml version="1.0"?><!DOCTYPE kml [<!ENTITY x "boom">]><kml><Placemark><name>&x;</name></Placemark></kml>"""
    Files.write(dir.resolve("evil.kml"), evil.getBytes("UTF-8"))
    val ex = intercept[org.apache.spark.SparkException] {
      GeoXmlReaders.kml(spark, s"file://$dir/evil.kml").collect()
    }
    assert(ex.getMessage != null)
  }
}
