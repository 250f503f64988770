package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef

/** Fixture `fixtures/sample.gpkg` written by the real SQLite engine:
  * gpkg_contents/gpkg_geometry_columns registries plus a `pois` feature
  * table with Point/LineString/Polygon WKB blobs (one with an envelope
  * in its GP header) and an `aux` attributes table.
  */
class GeoPackageReaderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url = getClass.getResource("/fixtures/sample.gpkg").toString

  test("feature tables come from the gpkg registries") {
    assert(GeoPackageReader.featureTables(spark, url) == Seq("pois" -> "geom"))
  }

  test("WKB geometries decode to GeoJSON rows with attributes") {
    val df = GeoPackageReader.read(spark, url)
    assert(df.columns.toSeq == Seq("fid", "name", "geometry_type", "geometry_json"))
    val rows = df.select("fid", "name", "geometry_type", "geometry_json")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    assert(rows(0) == ((1L, "home", "Point", """{"type":"Point","coordinates":[4.5,52]}""")))
    assert(rows(1) == ((2L, "route", "LineString",
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,0]]}""")))
    assert(rows(2) == ((3L, "park", "Polygon",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")))
    // envelope-bearing header skips the envelope correctly
    assert(rows(3) == ((4L, "env", "Point", """{"type":"Point","coordinates":[9,9]}""")))
  }

  test("registry routes the geopackage kind with table option") {
    val df = SparkReaders.reader("geopackage_reader").get
      .read(spark, DataRef("geopackage", url, options = Map("table" -> "pois")))
    assert(df.count() == 4)
    intercept[NoSuchElementException] {
      GeoPackageReader.read(spark, url, Some("missing"))
    }
  }
}
