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
    // unsupported driver kept as declared-only entry; refusal now names
    // the v1 driver (r19) instead of a generic unknown-reader
    assert(cat.entries(cat.aliases("exotic")).reader == "unsupported:netcdf")
    val ex = intercept[UnsupportedOperationException](cat("exotic").read(spark))
    assert(ex.getMessage.contains("netcdf"))
  }

  // ---- the reference's REAL v1 fixture files (read verbatim) ----
  private val refTests = "/root/reference/intake/tests"

  test("reference catalog1.yml imports with per-source metadata preserved") {
    val cat = V1Import.fromV1YamlFile(s"$refTests/catalog1.yml")
    assert(cat.names.toSet == Set("ex1", "ex2"))
    val ex2 = cat.entries(cat.aliases("ex2"))
    assert(ex2.metadata("foo") == "bar")
    assert(ex2.metadata("bar") == "[1, 2, 3]") // stringified list survives
    assert(ex2.metadata("description") == "this source doesn't work")
    assert(ex2.reader == "spark_csv")
  }

  test("reference catalog_nested.yml resolves its CATALOG_DIR sub-catalog into dotted entries") {
    // mirror the reference harness (tests/test_utils.py:64 copy_test_file):
    // catalog_nested.yml references __unit_test_catalog_nested_sub.yml,
    // which the reference test copies next to it under that name
    val dir = Files.createTempDirectory("v1nested")
    Files.copy(java.nio.file.Paths.get(s"$refTests/catalog_nested.yml"), dir.resolve("catalog_nested.yml"))
    Files.copy(java.nio.file.Paths.get(s"$refTests/catalog_nested_sub.yml"),
      dir.resolve("__unit_test_catalog_nested_sub.yml"))
    val cat = V1Import.fromV1YamlFile(dir.resolve("catalog_nested.yml").toString)
    // the access path the reference's test_top_level.py:150 exercises
    assert(cat.names.toSet == Set("nested.ex1", "nested.ex2"))
    assert(cat.entries(cat.aliases("nested.ex1")).metadata("description") == "this is a sub-resource")
    assert(cat("nested.ex1").ref.url == "")
  }

  test("reference catalog_inherit_params.yml: global/local/runtime parameter semantics") {
    val cat = V1Import.fromV1YamlFile(s"$refTests/catalog_inherit_params.yml")
    // test_local.py:863 test_inherit_params — catalog-level default
    assert(cat("param").ref.url == "s3://test_bucket/file.parquet")
    // test_local.py:867 test_runtime_overwrite_params
    assert(cat("param", Map("bucket" -> "runtime_overwrite")).ref.url
      == "s3://runtime_overwrite/file.parquet")
    // test_local.py:874 — a local parameter of the same name wins
    assert(cat("local_param_overwrites").ref.url == "s3://local_param/file.parquet")
    // test_local.py:878 — local and global parameters merge
    assert(cat("local_and_global_params").ref.url == "s3://test_bucket/local_filename.parquet")
  }

  test("reference catalog_inherit_params.yml: subcat passthrough (parent params + passed user_parameters)") {
    val cat = V1Import.fromV1YamlFile(s"$refTests/catalog_inherit_params.yml")
    // test_parameters.py:232 test_catalog_passthrough
    assert(cat.names.count(_.startsWith("subcat.")) == 2)
    assert(cat("subcat.ex2").ref.url == "test_bucket/test_name")
    assert(cat("subcat.ex2", Map("bucket" -> "hi", "inner" -> "ho")).ref.url == "hi/ho")
    // clone-style partial overrides (test_parameters.py:242-245)
    assert(cat("subcat.ex2", Map("bucket" -> "yet", "inner" -> "another")).ref.url == "yet/another")
    assert(cat("subcat.ex1").ref.url == "")
  }

  test("same-args sources in two different sub-catalogs stay distinct (per-sub CATALOG_DIR)") {
    // the nested re-key bug: identical (reader, kwargs) entries from two
    // sub-catalogs hashed to one token, so the later import silently
    // replaced the earlier entry's userParameters — incl. CATALOG_DIR
    val dirA = Files.createTempDirectory("v1subA")
    val dirB = Files.createTempDirectory("v1subB")
    val subYaml =
      """sources:
        |  ex:
        |    driver: csv
        |    args:
        |      urlpath: "{{ CATALOG_DIR }}/data.csv"
        |""".stripMargin
    Files.writeString(dirA.resolve("sub.yml"), subYaml)
    Files.writeString(dirB.resolve("sub.yml"), subYaml)
    val parentDir = Files.createTempDirectory("v1parent")
    Files.writeString(parentDir.resolve("cat.yml"),
      s"""sources:
         |  a:
         |    driver: yaml_file_cat
         |    args:
         |      path: "$dirA/sub.yml"
         |  b:
         |    driver: yaml_file_cat
         |    args:
         |      path: "$dirB/sub.yml"
         |""".stripMargin)
    val cat = V1Import.fromV1YamlFile(parentDir.resolve("cat.yml").toString)
    assert(cat("a.ex").ref.url == s"$dirA/data.csv")
    assert(cat("b.ex").ref.url == s"$dirB/data.csv")
  }

  test("passed user_parameters do NOT override a sub-entry's own parameters (entry-local wins)") {
    val subDir = Files.createTempDirectory("v1subLocal")
    Files.writeString(subDir.resolve("sub.yml"),
      """sources:
        |  ex:
        |    driver: csv
        |    parameters:
        |      bucket:
        |        type: str
        |        description: d
        |        default: entry_local
        |    args:
        |      urlpath: "{{ bucket }}/data.csv"
        |""".stripMargin)
    val parentDir = Files.createTempDirectory("v1parentLocal")
    Files.writeString(parentDir.resolve("cat.yml"),
      s"""sources:
         |  sub:
         |    driver: yaml_file_cat
         |    args:
         |      path: "$subDir/sub.yml"
         |      user_parameters:
         |        bucket:
         |          type: str
         |          description: d
         |          default: passed_down
         |""".stripMargin)
    val cat = V1Import.fromV1YamlFile(parentDir.resolve("cat.yml").toString)
    // base.py:345-355: only UNSHADOWED catalog parameters prepend
    assert(cat("sub.ex").ref.url == "entry_local/data.csv")
    assert(cat("sub.ex", Map("bucket" -> "runtime")).ref.url == "runtime/data.csv")
  }

  test("a metadata-level description survives when the source has no top-level description") {
    val cat = V1Import.fromV1YamlString(
      """sources:
        |  m:
        |    driver: csv
        |    metadata:
        |      description: from metadata
        |    args: {}
        |""".stripMargin)
    assert(cat.entries(cat.aliases("m")).metadata("description") == "from metadata")
  }

  test("a nested catalog pointing at a missing file refuses loudly") {
    val dir = Files.createTempDirectory("v1missing")
    val yml =
      """sources:
        |  broken:
        |    driver: yaml_file_cat
        |    args:
        |      path: "{{ CATALOG_DIR }}/does_not_exist.yml"
        |""".stripMargin
    val p = dir.resolve("cat.yml")
    Files.writeString(p, yml)
    val e = intercept[java.io.FileNotFoundException](V1Import.fromV1YamlFile(p.toString))
    assert(e.getMessage.contains("does_not_exist.yml"))
  }

  test("self-referencing nested catalogs are cycle-guarded") {
    val dir = Files.createTempDirectory("v1cycle")
    val yml =
      """sources:
        |  self:
        |    driver: yaml_file_cat
        |    args:
        |      path: "{{ CATALOG_DIR }}/cat.yml"
        |""".stripMargin
    val p = dir.resolve("cat.yml")
    Files.writeString(p, yml)
    val e = intercept[IllegalStateException](V1Import.fromV1YamlFile(p.toString))
    assert(e.getMessage.contains("cyclic"))
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

  test("intake:// URIs import as a searchable declared-only entry that refuses loudly at read") {
    // reference intake/__init__.py:163-166: "intake:" dispatches to the
    // legacy intake-server driver. The one non-readable open_catalog arm
    // must fail LOUDLY at read, naming the protocol — never a generic
    // unknown-reader or a silent FileNotFound.
    val cat = V1Import.openCatalog("intake://cat.example.com:5000")
    assert(cat.names == Seq("intake_remote"))
    // searchable like any declared-only v1 entry
    assert(cat.search(TextExpr("legacy")).entries.nonEmpty)
    assert(cat.entries.values.head.reader == "unsupported:intake_remote")
    val e = intercept[UnsupportedOperationException] { cat("intake_remote") }
    assert(e.getMessage.contains("intake_remote") &&
      e.getMessage.contains("protocol") &&
      e.getMessage.contains("intake://cat.example.com:5000"),
      s"refusal must name the legacy server protocol and the URL: ${e.getMessage}")
  }

  test("declared-only entries from unknown v1 drivers refuse with the driver name at read") {
    val yaml =
      """metadata:
        |  version: 1
        |sources:
        |  zar:
        |    description: an unimplemented driver
        |    driver: frobnicator
        |    args:
        |      urlpath: /tmp/x.frob
        |""".stripMargin
    val cat = V1Import.fromV1YamlString(yaml, catalogDir = "/tmp")
    assert(cat.names.contains("zar"))
    val e = intercept[UnsupportedOperationException] { cat("zar") }
    assert(e.getMessage.contains("frobnicator") && e.getMessage.contains("declared-only"),
      s"refusal must name the v1 driver: ${e.getMessage}")
  }
}
