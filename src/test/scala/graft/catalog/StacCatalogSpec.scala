package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

class StacCatalogSpec extends SparkSpec {

  test("walks a local STAC tree and emits readable asset entries") {
    val dir = Files.createTempDirectory("stac")
    // data asset: reuse real testdata parquet
    Files.writeString(dir.resolve("catalog.json"),
      """{"type":"Catalog","id":"root","stac_version":"1.0.0",
        |"links":[{"rel":"child","href":"collection.json"}]}""".stripMargin)
    Files.writeString(dir.resolve("collection.json"),
      """{"type":"Collection","id":"col1","stac_version":"1.0.0",
        |"links":[{"rel":"item","href":"item1.json"}]}""".stripMargin)
    Files.writeString(dir.resolve("item1.json"),
      """{"type":"Feature","id":"item1","stac_version":"1.0.0",
        |"assets":{
        |  "data":{"href":"file:///root/testdata/sf0.001/nation.parquet",
        |          "type":"application/x-parquet"},
        |  "thumb":{"href":"thumb.png","type":"image/png"}
        |},
        |"links":[{"rel":"collection","href":"collection.json"}]}""".stripMargin)

    val cat = StacCatalog.fromUrl(s"file://$dir/catalog.json")
    assert(cat.names.toSet == Set("item1/data", "item1/thumb"))
    val df = cat("item1/data").read(spark)
    assert(df.count() == 25) // nation table
    // asset metadata preserved on the hoisted data description
    val dataTok = Templates.DataRe
      .findFirstMatchIn(cat.entries(cat.aliases("item1/thumb")).kwargs("data")).get.group(1)
    assert(cat.data(dataTok).ref.metadata("media_type") == "image/png")
    assert(cat.data(dataTok).ref.url.startsWith("file:"))
  }

  test("cycles and depth are bounded") {
    val dir = Files.createTempDirectory("stacloop")
    Files.writeString(dir.resolve("a.json"),
      """{"type":"Catalog","id":"a","links":[{"rel":"child","href":"b.json"}]}""")
    Files.writeString(dir.resolve("b.json"),
      """{"type":"Catalog","id":"b","links":[{"rel":"child","href":"a.json"}]}""")
    val cat = StacCatalog.fromUrl(s"file://$dir/a.json") // must terminate
    assert(cat.names.isEmpty)
  }
}
