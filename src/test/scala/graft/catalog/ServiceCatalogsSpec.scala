package graft.catalog

import graft.SparkSpec
import graft.readers.GeoJsonReader
import java.nio.file.Files

class ServiceCatalogsSpec extends SparkSpec {

  test("THREDDS catalog walks catalogRefs and emits dataset entries") {
    val dir = Files.createTempDirectory("thredds")
    Files.writeString(dir.resolve("catalog.xml"),
      s"""<?xml version="1.0"?>
         |<catalog xmlns="http://www.unidata.ucar.edu/namespaces/thredds/InvCatalog/v1.0"
         |         xmlns:xlink="http://www.w3.org/1999/xlink">
         |  <service name="file" serviceType="HTTPServer" base=""/>
         |  <dataset name="nation" urlPath="file:///root/testdata/sf0.001/nation.parquet"/>
         |  <catalogRef xlink:href="sub/catalog.xml" xlink:title="sub"/>
         |</catalog>""".stripMargin)
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("sub/catalog.xml"),
      s"""<?xml version="1.0"?>
         |<catalog xmlns="http://www.unidata.ucar.edu/namespaces/thredds/InvCatalog/v1.0">
         |  <service name="file" serviceType="HTTPServer" base=""/>
         |  <dataset name="region" urlPath="file:///root/testdata/sf0.001/region.parquet"/>
         |</catalog>""".stripMargin)

    val cat = ThreddsCatalog.fromUrl(s"file://$dir/catalog.xml")
    assert(cat.names.toSet == Set("nation", "region"))
    assert(cat("region").read(spark).count() == 5)
  }

  test("Tiled catalog walks containers via links.search and rehydrates tables") {
    // fixture shape mirrors Tiled's JSON:API search documents (reference
    // intake tests/cats fixture shape; entries carry attributes +
    // per-item links.search/links.full)
    val dir = Files.createTempDirectory("tiled")
    Files.writeString(dir.resolve("root.json"),
      s"""{"data": [
         |  {"id": "raw", "attributes": {"structure_family": "container", "metadata": {"beamline": "bl-1"}},
         |   "links": {"search": "file://$dir/raw.json"}},
         |  {"id": "img", "attributes": {"structure_family": "array", "metadata": {}},
         |   "links": {"full": "file://$dir/img.bin"}}
         |], "links": {"next": null}}""".stripMargin)
    Files.writeString(dir.resolve("raw.json"),
      s"""{"data": [
         |  {"id": "prices", "attributes": {"structure_family": "table", "metadata": {"rows": 5}},
         |   "links": {"full": "file:///root/testdata/sf0.001/region.parquet"}}
         |]}""".stripMargin)

    val cat = TiledCatalog.fromUrl(s"file://$dir/root.json")
    assert(cat.names.toSet == Set("raw/prices", "img"))
    // table node reads through the parquet source
    assert(cat("raw/prices").read(spark).count() == 5)
    assert(cat("raw/prices").ref.metadata("structure_family") == "table")
    assert(cat("raw/prices").ref.metadata("rows") == "5")
  }

  test("HuggingFace hub catalog lists datasets and reads parquet manifests") {
    val dir = Files.createTempDirectory("hfapi")
    // hub listing: community (namespaced) ids excluded by default
    Files.writeString(dir.resolve("datasets"),
      """[{"id": "squad", "downloads": 12345, "private": false},
        |{"id": "someuser/community-set", "downloads": 3}]""".stripMargin)
    Files.createDirectories(dir.resolve("datasets_files/squad"))
    // parquet manifest shape: {config: {split: [urls]}}
    Files.writeString(dir.resolve("datasets_files/squad/parquet"),
      """{"plain_text": {"train": ["file:///root/testdata/sf0.001/region.parquet"],
        |                "validation": ["file:///root/testdata/sf0.001/nation.parquet"]}}""".stripMargin)

    val cat = HuggingFaceHubCatalog.fromApi(s"file://$dir")
    assert(cat.names.toSet == Set("squad"))
    val withCommunity = HuggingFaceHubCatalog.fromApi(s"file://$dir", withCommunityDatasets = true)
    assert(withCommunity.names.toSet == Set("squad", "someuser/community-set"))

    // rehydrate: manifest at {api}/datasets/{id}/parquet — point the entry
    // at the fixture manifest and read a single split
    val ref = cat("squad").ref.copy(
      url = s"file://$dir/datasets_files/squad/parquet",
      options = Map("split" -> "train"))
    import graft.readers.SparkReaders
    val df = SparkReaders.reader("hf_parquet").get.read(spark, ref)
    assert(df.count() == 5)
    // both splits together read the union
    val all = SparkReaders.reader("hf_parquet").get.read(spark, ref.copy(options = Map.empty))
    assert(all.count() == 30)
  }

  test("GeoJSON FeatureCollection flattens to feature rows") {
    val dir = Files.createTempDirectory("geo")
    Files.writeString(dir.resolve("places.geojson"),
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","id":"p1","geometry":{"type":"Point","coordinates":[1.5,2.5]},
        | "properties":{"name":"alpha","pop":100}},
        |{"type":"Feature","id":"p2","geometry":{"type":"Point","coordinates":[3.0,4.0]},
        | "properties":{"name":"beta","pop":200}}
        |]}""".stripMargin)
    val df = GeoJsonReader.read(spark, s"file://$dir/places.geojson")
    assert(df.columns.toSeq == Seq("feature_id", "geometry_type", "geometry_json", "name", "pop"))
    import spark.implicits._
    val rows = df.select("feature_id", "geometry_type", "name", "pop").as[(String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("p1", "Point", "alpha", 100L), ("p2", "Point", "beta", 200L)))
    assert(df.filter(df("geometry_json").contains("1.5")).count() == 1)
  }
}
