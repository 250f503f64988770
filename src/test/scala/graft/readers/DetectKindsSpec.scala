package graft.readers

import graft.datatypes.{DataRef, Detect}
import org.scalatest.funsuite.AnyFunSuite

/** Detection rows for the round-8 kinds (VERDICT r7 #5): COG, STAC
  * JSON, Icechunk — each with its routing contract (GeoTIFF reader /
  * StacCatalog dispatch / loud refusal).
  */
class DetectKindsSpec extends AnyFunSuite {

  private val tiffMagic = ("II*" + '\u0000' + "rest-of-file").getBytes("ISO-8859-1")

  test("cog detects by naming convention + tiff magic; plain tiff stays tiff") {
    val cog = Detect.recommend("file:///d/scene.cog.tif", head = tiffMagic)
    assert(cog.headOption.exists(_.kind.name == "cog"))
    val cog2 = Detect.recommend("file:///d/scene_cog.tiff", head = tiffMagic)
    assert(cog2.headOption.exists(_.kind.name == "cog"))
    // a plain .tif with the same bytes must NOT classify as cog
    val plain = Detect.recommend("file:///d/scene.tif", head = tiffMagic)
    assert(plain.headOption.exists(_.kind.name == "tiff"))
  }

  test("cog routes to the geotiff reader without the geo opt-in") {
    val (importable, _) = SparkReaders.recommend(DataRef("cog", "file:///d/scene.cog.tif"))
    assert(importable.headOption.exists(_.name == "geotiff_reader"))
  }

  test("stacjson detects stac_version + structural keys; plain json stays json") {
    val stac =
      """{"type": "Catalog", "id": "c1", "stac_version": "1.0.0",
        |"links": [{"rel": "child", "href": "x.json"}]}""".stripMargin.getBytes("UTF-8")
    val got = Detect.recommend("file:///d/catalog.json", mime = "application/json", head = stac)
    assert(got.headOption.exists(_.kind.name == "stacjson"))
    // plain json without stac markers
    val plain = Detect.recommend("file:///d/data.json", mime = "application/json",
      head = """{"a": 1}""".getBytes("UTF-8"))
    assert(plain.headOption.exists(_.kind.name == "json"))
    // stac_version alone is not enough (reference _head_ok requires a
    // structural key too — keeps near-miss JSON out)
    val nearMiss = Detect.recommend("file:///d/x.json", mime = "application/json",
      head = """{"stac_version": "1.0.0"}""".getBytes("UTF-8"))
    assert(nearMiss.headOption.exists(_.kind.name == "json"))
  }

  test("icechunk detects by its snapshots member; refuses loudly via the gated reader") {
    val got = Detect.recommend("file:///d/repo", listing = Seq("snapshots", "refs", "manifests"))
    assert(got.headOption.exists(_.kind.name == "icechunk"))
    // zarr must not be displaced on a real zarr listing
    val zarr = Detect.recommend("file:///d/a.zarr", listing = Seq(".zmetadata", "0.0"))
    assert(zarr.headOption.exists(_.kind.name == "zarr"))
    // contains markers match exact member names (or path suffixes), so
    // a backups dir with `model_snapshots` is NOT icechunk
    assert(Detect.recommend("file:///d/backups", listing = Seq("model_snapshots", "a.parquet")).isEmpty)
    assert(Detect.recommend("file:///d/repo2", listing = Seq("/bucket/repo2/snapshots"))
      .headOption.exists(_.kind.name == "icechunk"))
    val (importable, gated) = SparkReaders.recommend(DataRef("icechunk", "file:///d/repo"))
    assert(importable.isEmpty && gated.nonEmpty)
    val e = intercept[UnsupportedOperationException](
      gated.head.read(null, DataRef("icechunk", "file:///d/repo")))
    assert(e.getMessage.contains("icechunk"))
  }

  // round-9 registry-audit closure rows (VERDICT r8 #4)

  test("vcf detects by ##fileformat magic + extension and routes to the native parser") {
    val head = "##fileformat=VCFv4.3\n##source=x\n#CHROM\tPOS\n".getBytes("UTF-8")
    val got = Detect.recommend("file:///d/calls.vcf", head = head)
    assert(got.headOption.exists(_.kind.name == "vcf"))
    val gz = Detect.recommend("file:///d/calls.vcf.gz")
    assert(gz.headOption.exists(_.kind.name == "vcf"))
    val (importable, _) = SparkReaders.recommend(DataRef("vcf", "file:///d/calls.vcf"))
    assert(importable.headOption.exists(_.name == "vcf_reader"))
  }

  test("thredds catalog.xml outranks plain xml; plain xml stays xml") {
    val head = """<?xml version="1.0"?><catalog xmlns="x"><dataset/></catalog>""".getBytes("UTF-8")
    val got = Detect.recommend("https://tds.example/thredds/catalog.xml", head = head)
    assert(got.headOption.exists(_.kind.name == "thredds_catalog"))
    val plain = Detect.recommend("file:///d/data.xml", head = "<row a='1'/>".getBytes("UTF-8"))
    assert(plain.headOption.exists(_.kind.name == "xml"))
  }

  test("model_config (config.json + model_type magic) outranks json and reads as json") {
    val head = """{"model_type": "llama", "hidden_size": 4096}""".getBytes("UTF-8")
    val got = Detect.recommend("file:///models/m/config.json", head = head)
    assert(got.headOption.exists(_.kind.name == "model_config"))
    // a config.json WITHOUT the marker stays plain json
    val plain = Detect.recommend("file:///d/config.json", head = """{"a": 1}""".getBytes("UTF-8"))
    assert(plain.headOption.exists(_.kind.name == "json"))
    val (importable, _) = SparkReaders.recommend(DataRef("model_config", "file:///models/m/config.json"))
    assert(importable.exists(_.name == "spark_json"))
  }

  test("handle identifiers classify by scheme (URL->URL dispatch, no reader)") {
    val got = Detect.recommend("hdl:20.500.12345/abc")
    assert(got.headOption.exists(_.kind.name == "handle"))
    assert(Detect.recommend("doi:10.1000/xyz").headOption.exists(_.kind.name == "handle"))
  }

  test("raw buffers classify by .raw and require an explicit dtype to read") {
    val got = Detect.recommend("file:///d/block.raw")
    assert(got.headOption.exists(_.kind.name == "raw_buffer"))
    val (importable, _) = SparkReaders.recommend(DataRef("raw_buffer", "file:///d/block.raw"))
    assert(importable.headOption.exists(_.name == "raw_buffer_reader"))
    val e = intercept[IllegalArgumentException](
      importable.head.read(null, DataRef("raw_buffer", "file:///d/block.raw")))
    assert(e.getMessage.contains("dtype"))
  }
}
