package graft.catalog

import graft.SparkSpec
import graft.datatypes.DataRef
import java.nio.file.Files

/** OGC API Features / Prometheus fixtures follow the published wire
  * shapes (OGC API - Features core JSON, Prometheus HTTP API), served
  * from file:// like the STAC/Tiled walker specs.
  */
class OgcPromSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ogcDir = {
    val dir = Files.createTempDirectory("ogc")
    Files.writeString(dir.resolve("collections.json"),
      s"""{"collections": [
         |  {"id": "lakes", "title": "Great Lakes",
         |   "links": [{"rel": "items", "href": "lakes_1.json", "type": "application/geo+json"}]},
         |  {"id": "rivers",
         |   "links": [{"rel": "self", "href": "rivers.json"}]}
         |]}""".stripMargin)
    Files.writeString(dir.resolve("lakes_1.json"),
      s"""{"type": "FeatureCollection",
         |"features": [
         |  {"type": "Feature", "id": "l1", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
         |   "properties": {"name": "erie", "depth": 64}},
         |  {"type": "Feature", "id": "l2", "geometry": {"type": "Point", "coordinates": [3.0, 4.0]},
         |   "properties": {"name": "huron", "depth": 229}}
         |],
         |"links": [{"rel": "next", "href": "lakes_2.json"}]}""".stripMargin)
    Files.writeString(dir.resolve("lakes_2.json"),
      s"""{"type": "FeatureCollection",
         |"features": [
         |  {"type": "Feature", "id": "l3", "geometry": {"type": "Point", "coordinates": [5.0, 6.0]},
         |   "properties": {"name": "superior", "depth": 406}}
         |],
         |"links": []}""".stripMargin)
    dir
  }

  test("collections document yields catalog entries addressed by items links") {
    val cat = OgcApiFeatures.fromUrl(s"file://$ogcDir/collections.json")
    assert(cat.names.toSet == Set("lakes")) // rivers has no items link
    val tok = Templates.DataRe
      .findFirstMatchIn(cat.entries(cat.aliases("lakes")).kwargs("data")).get.group(1)
    val entry = cat.data(tok).ref
    assert(entry.kind == "ogc_features" && entry.url.endsWith("lakes_1.json"))
    assert(entry.metadata("title") == "Great Lakes")
  }

  test("items pages chain through next links and flatten as features") {
    val df = OgcApiFeatures.readItems(spark, s"file://$ogcDir/lakes_1.json")
    val rows = df.select("feature_id", "geometry_type", "name", "depth")
      .as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("l1", "Point", "erie", 64L), ("l2", "Point", "huron", 229L), ("l3", "Point", "superior", 406L)))
    // registry routing
    val viaReader = graft.readers.SparkReaders.reader("ogc_features_reader").get
      .read(spark, DataRef("ogc_features", s"file://$ogcDir/lakes_1.json"))
    assert(viaReader.count() == 3)
  }

  test("prometheus range response reads long-form with labels preserved") {
    val dir = Files.createTempDirectory("prom")
    Files.writeString(dir.resolve("range.json"),
      s"""{"status": "success", "data": {"resultType": "matrix", "result": [
         |  {"metric": {"__name__": "http_requests_total", "job": "api", "code": "200"},
         |   "values": [[1700000000, "10"], [1700000060, "12.5"]]},
         |  {"metric": {"__name__": "http_requests_total", "job": "api", "code": "500"},
         |   "values": [[1700000000, "1"]]}
         |]}}""".stripMargin)
    val df = PrometheusReader.read(spark, s"file://$dir/range.json")
    assert(df.columns.toSeq == Seq("metric", "labels_json", "ts", "value"))
    assert(df.count() == 3)
    val v500 = df.filter($"labels_json".contains("\"code\":\"500\"")).head()
    assert(v500.getAs[String]("metric") == "http_requests_total" && v500.getAs[Double]("value") == 1.0)
    val sums = df.groupBy("labels_json").sum("value").collect().map(_.getDouble(1)).sorted
    assert(sums.toSeq == Seq(1.0, 22.5))
  }

  test("prometheus instant query and error status") {
    val dir = Files.createTempDirectory("prom2")
    Files.writeString(dir.resolve("instant.json"),
      """{"status": "success", "data": {"resultType": "vector", "result": [
        |  {"metric": {"__name__": "up", "job": "api"}, "value": [1700000000, "1"]}
        |]}}""".stripMargin)
    val df = PrometheusReader.read(spark, s"file://$dir/instant.json")
    assert(df.count() == 1 && df.head().getAs[Double]("value") == 1.0)
    Files.writeString(dir.resolve("err.json"), """{"status": "error", "error": "bad query"}""")
    intercept[IllegalArgumentException](PrometheusReader.read(spark, s"file://$dir/err.json"))
  }
}
