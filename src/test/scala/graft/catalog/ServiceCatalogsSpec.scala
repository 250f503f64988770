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
