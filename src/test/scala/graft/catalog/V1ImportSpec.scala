package graft.catalog

import graft.SparkSpec
import java.nio.file.Files

class V1ImportSpec extends SparkSpec {

  private val v1Yaml =
    """metadata:
      |  version: 1
      |sources:
      |  entry1:
      |    description: lineitem table at a templated scale
      |    driver: parquet
      |    args:
      |      urlpath: '{{ sf }}/lineitem.parquet'
      |    parameters:
      |      sf:
      |        description: scale dir
      |        type: str
      |        default: /root/testdata/sf0.001
      |  local_csv:
      |    description: csv next to the catalog
      |    driver: csv
      |    args:
      |      urlpath: '{{ CATALOG_DIR }}/data.csv'
      |  exotic:
      |    description: something we do not support
      |    driver: netcdf
      |    args:
      |      urlpath: /nope.nc
      |""".stripMargin

  test("v1 catalog lowers to v2 entries with templating and parameters") {
    val cat = V1Import.fromV1YamlString(v1Yaml, catalogDir = "/tmp")
    assert(cat.names.toSet == Set("entry1", "local_csv", "exotic"))
    // default parameter expansion
    assert(cat("entry1").ref.url == "/root/testdata/sf0.001/lineitem.parquet")
    // call-site override
    assert(cat("entry1", Map("sf" -> "/root/testdata/sf0.01")).ref.url == "/root/testdata/sf0.01/lineitem.parquet")
    // CATALOG_DIR auto-parameter
    assert(cat("local_csv").ref.url == "/tmp/data.csv")
    // read through Spark
    assert(cat("entry1").read(spark).count() == 6000)
    // unsupported driver kept as declared-only entry
    assert(cat.entries(cat.aliases("exotic")).reader == "unsupported:netcdf")
    intercept[NoSuchElementException](cat("exotic").read(spark))
  }

  test("openCatalog dispatches v1 vs v2 by version key") {
    val dir = Files.createTempDirectory("cats")
    val v1Path = dir.resolve("cat_v1.yml")
    Files.writeString(v1Path, v1Yaml)
    assert(V1Import.openCatalog(v1Path.toString).names.contains("entry1"))

    val v2 = Catalog().add("x", graft.datatypes.DataRef("parquet", "/x.parquet"), "spark_parquet")
    val v2Path = dir.resolve("cat_v2.yaml")
    CatalogIO.toYamlFile(v2, v2Path.toString)
    assert(V1Import.openCatalog(v2Path.toString).names == Seq("x"))
  }
}
