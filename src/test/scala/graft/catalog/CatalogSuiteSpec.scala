package graft.catalog

import graft.SparkSpec
import graft.core.Token
import graft.datatypes.{DataRef, Detect}
import graft.pipeline.Pipeline
import graft.readers.SparkReaders
import java.nio.file.Files

class CatalogSuiteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("token is stable, order-insensitive in maps, distinct across content") {
    val a = DataRef("parquet", "/x.parquet", Map("a" -> "1", "b" -> "2"))
    val b = DataRef("parquet", "/x.parquet", Map("b" -> "2", "a" -> "1"))
    val c = DataRef("parquet", "/y.parquet")
    assert(a.token == b.token)
    assert(a.token != c.token)
    assert(a.token.length == 16)
    assert(Token.canonicalJson(Map("b" -> 1, "a" -> "x")) == "{\"a\":\"x\",\"b\":1}")
  }

  test("detect by extension, magic, and veto") {
    assert(Detect.recommend(s"$sf/lineitem.parquet").head.kind.name == "parquet")
    assert(Detect.recommend("data.csv").head.kind.name == "csv")
    // magic beats extension: PAR1 head on a .csv url ranks parquet first
    val parquetHead = "PAR1xxxx".getBytes("ISO-8859-1")
    assert(Detect.recommend("weird.csv", head = parquetHead).head.kind.name == "parquet")
    // binary veto: CSV candidate rejected when head contains NULs
    val binHead = Array[Byte](1, 2, 3, 0, 0, 5)
    assert(!Detect.recommend("x.csv", head = binHead).exists(_.kind.name == "csv"))
  }

  test("detect scientific/stats/media kinds by magic and pattern") {
    def top(url: String, head: Array[Byte] = Array.emptyByteArray): String =
      Detect.recommend(url, head = head).head.kind.name
    assert(top("model.grb2", "GRIB####".getBytes) == "grib2")
    assert(top("sky.fits", "SIMPLE  = T".getBytes) == "fits")
    assert(top("scan.dcm", new Array[Byte](128) ++ "DICM".getBytes) == "dicom")
    assert(top("vars.mat", "MATLAB 5.0 MAT-file".getBytes) == "matlab")
    assert(top("m.mtx", "%%MatrixMarket matrix".getBytes) == "matrixmarket")
    assert(top("survey.dta") == "stata")
    assert(top("survey.sav", "$FL2@(#)".getBytes) == "spss")
    assert(top("logo.gif", "GIF89a".getBytes) == "gif")
    assert(top("img.bmp", "BMxxxx".getBytes) == "bmp")
    assert(top("img.ppm", "P6\n2 2\n255\n".getBytes) == "ppm")
    assert(top("tiles.gpkg", ("SQLite format 3" + "\u0000").getBytes("ISO-8859-1")) == "geopackage")
    assert(top("clip.webm", Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte)) == "matroska")
    assert(top("geo.fgb", "fgb\u0003fgb".getBytes("ISO-8859-1")) == "flatgeobuf")
  }

  test("detect round-3 registry additions") {
    def top3(url: String, head: Array[Byte] = Array.emptyByteArray): String =
      Detect.recommend(url, head = head).head.kind.name
    assert(top3("clip.avi", "RIFF0000AVI LIST".getBytes("ISO-8859-1")) == "avi")
    assert(top3("song.flac", "fLaC0000".getBytes("ISO-8859-1")) == "flac")
    assert(top3("song.ogg", "OggS0000".getBytes("ISO-8859-1")) == "ogg")
    assert(top3("pic.exr", Array(0x76, 0x2f, 0x31, 0x01).map(_.toByte)) == "exr")
    assert(top3("chart.svg", "<?xml?><svg xmlns=".getBytes) == "svg")
    assert(top3("paper.docx", "PKrest".getBytes("ISO-8859-1")) == "docx")
    assert(top3("book.epub", "PKrest".getBytes("ISO-8859-1")) == "epub")
    assert(top3("t.feather", "FEA1".getBytes) == "feather")
    assert(top3("sig.bw", Array(0x26, 0xfc, 0x8f, 0x88).map(_.toByte)) == "bigwig")
    assert(top3("model.pt", "PKrest".getBytes("ISO-8859-1")) == "torchscript")
    assert(top3("planet.osm.pbf") == "osmpbf")
    assert(top3("slide.svs", "II* x".getBytes("ISO-8859-1")) == "wholeslide")
    assert(top3("mol.sdf", "name\n  prog\n\n 10 9  0  V2000".getBytes) == "sdf")
    assert(top3("https://x/thredds/dodsC/set.nc.dods") == "opendap")
    assert(top3("mqtt://broker:1883/topic") == "mqtt")
    assert(top3("grpc://flight:8815/path") == "arrow_flight")
    // docx without a PK head is vetoed
    assert(!Detect.recommend("paper.docx", head = "not a zip".getBytes)
      .exists(_.kind.name == "docx"))
  }

  test("detect compression rewrap and zip container") {
    val gzHead = Array(0x1f.toByte, 0x8b.toByte, 8.toByte)
    val got = Detect.recommend("table.csv.gz", head = gzHead)
    assert(got.head.kind.name == "csv")
    assert(got.head.options("compression") == "gzip")
    assert(got.head.url == "table.csv")
    val zipHead = "PK\u0003\u0004rest".getBytes("ISO-8859-1")
    val z = Detect.recommend("bundle.bin", head = zipHead)
    assert(z.exists(s => s.url.startsWith("zip://*::")))
  }

  test("detect directory kinds via contains listing") {
    val d = Detect.recommend("/data/tbl", listing = Seq("_delta_log", "part-0.parquet"))
    assert(d.head.kind.name == "delta")
  }

  test("recommendPath fetches head bytes from a real file") {
    val got = Detect.recommendPath(s"file://$sf/lineitem.parquet")
    assert(got.head.kind.name == "parquet")
    assert(got.head.score > Detect.ScoreMagic) // magic + pattern both hit
  }

  test("reader recommend splits importable from declared-only") {
    val (impD, notImpD) = SparkReaders.recommend(DataRef("delta", "/tbl"))
    // connector-gated reader declared-only without the jar; native log
    // replay is the always-importable fallback
    assert(notImpD.exists(_.name == "spark_delta"))
    assert(impD.map(_.name) == Seq("delta_native"))
    // iceberg: the connector-gated reader is declared-only without the
    // iceberg-spark runtime jar; the native metadata walk is always
    // importable and is the recommended fallback
    val (impI, notImpI) = SparkReaders.recommend(DataRef("iceberg", "/warehouse/tbl"))
    assert(notImpI.exists(_.name == "spark_iceberg"))
    assert(impI.map(_.name) == Seq("iceberg_native"))
    val (imp2, _) = SparkReaders.recommend(DataRef("parquet", "/x.parquet"))
    assert(imp2.exists(_.name == "spark_parquet"))
    // avro + xml are bundled into spark-sql in Spark 4 → importable
    assert(SparkReaders.recommend(DataRef("avro", "/x.avro"))._1.nonEmpty)
    assert(SparkReaders.recommend(DataRef("xml", "/x.xml"))._1.nonEmpty)
  }

  test("pipeline auto: url to DataFrame end-to-end; discover; stepwise") {
    val p = Pipeline.auto(s"file://$sf/lineitem.parquet")
      .andThen("filter_qty", _.filter("l_quantity > 45"))
      .andThen("project", _.select("l_orderkey", "l_quantity"))
    val full = p.read(spark)
    assert(full.columns.toSeq == Seq("l_orderkey", "l_quantity"))
    assert(full.count() > 0)
    assert(p.discover(spark, 5).count() <= 5)
    assert(p.firstN(1).read(spark).columns.length == 11) // unprojected
    val stages = p.stepwise(spark).map(_._1).toSeq
    assert(stages == Seq("source", "filter_qty", "project"))
  }

  test("pattern reader derives columns from path captures") {
    val dir = Files.createTempDirectory("pat").toFile
    Files.write(new java.io.File(dir, "a-2023.csv").toPath, "x,y\n1,2\n".getBytes)
    Files.write(new java.io.File(dir, "b-2024.csv").toPath, "x,y\n3,4\n".getBytes)
    val ref = DataRef("csv", s"file://$dir/{name}-{year}.csv")
    val df = SparkReaders.pattern.read(spark, ref)
    assert(df.columns.toSet == Set("x", "y", "name", "year"))
    val years = df.select("year").collect().map(_.getString(0)).toSet
    assert(years == Set("2023", "2024"))
  }

  test("catalog add/get/read with {data(token)} hoisting") {
    val cat = Catalog().add("li", DataRef("parquet", s"$sf/lineitem.parquet"), "spark_parquet")
    assert(cat.names == Seq("li"))
    assert(cat.entries.head._2.kwargs("data").startsWith("{data("))
    assert(cat("li").read(spark).count() == 6000)
  }

  test("catalog YAML v2 round-trip preserves everything") {
    val cat = Catalog(userParameters = Seq(SimpleUserParameter("sf", "scale", "str", "sf0.001")))
      .add("li", DataRef("parquet", "/root/testdata/{sf}/lineitem.parquet"), "spark_parquet")
      .add("ev", DataRef("parquet", s"$sf/events.parquet", Map("opt1" -> "v1")), "spark_parquet")
    val yaml = CatalogIO.toYamlString(cat)
    val back = CatalogIO.fromYamlString(yaml)
    assert(back.aliases == cat.aliases)
    assert(back.entries == cat.entries)
    assert(back.data == cat.data)
    assert(back.userParameters == cat.userParameters)
    // templated url resolves through catalog-level parameter default
    assert(back("li").ref.url == "/root/testdata/sf0.001/lineitem.parquet")
    // and per-call override
    assert(back("li", Map("sf" -> "sf0.01")).ref.url == "/root/testdata/sf0.01/lineitem.parquet")
  }

  test("catalog merge, rename, delete, search") {
    val c1 = Catalog().add("a", DataRef("parquet", "/a.parquet"), "spark_parquet")
    val c2 = Catalog().add("b", DataRef("csv", "/b.csv"), "spark_csv")
    val m = c1 ++ c2
    assert(m.names == Seq("a", "b"))
    val r = m.rename("a", "alpha")
    assert(r.names == Seq("alpha", "b"))
    assert(r.delete("alpha").names == Seq("b"))
    assert(m.search(TextExpr("csv")).names == Seq("b"))
    assert(m.search(TextExpr("csv") || TextExpr("a.parquet")).names == Seq("a", "b"))
    assert(m.search(!TextExpr("csv")).names == Seq("a"))
    assert(m.search(ImportableExpr).names == Seq("a", "b"))
  }

  test("user parameter coercion and validation") {
    assert(SimpleUserParameter("n", dtype = "int").coerce("42") == 42)
    assert(SimpleUserParameter("b", dtype = "bool").coerce("yes") == true)
    intercept[IllegalArgumentException](SimpleUserParameter("n", dtype = "int").coerce("abc"))
    intercept[IllegalArgumentException](OptionsParameter("o", options = Seq("x", "y")).coerce("z"))
    assert(MultiOptionParameter("m", options = Seq(1, 2, 3)).coerce(Seq(1, 3)) == Seq(1, 3))
    intercept[IllegalArgumentException](BoundedNumberParameter("r", min = 0, max = 1).coerce(2.0))
  }

  test("templating: env and closed func registry; unknown func rejected") {
    val got = Templates.resolve("{env(GRAFT_TEST_VAR)}/x", env = k => Some("V").filter(_ => k == "GRAFT_TEST_VAR"))
    assert(got == "V/x")
    Templates.registerFunc("answer", () => "42")
    assert(Templates.resolve("v={func(answer)}") == "v=42")
    intercept[IllegalArgumentException](Templates.resolve("{func(os:system)}"))
  }

  test("cyclic data references error instead of looping") {
    // entry whose kwargs reference its own token via {data(...)}
    val rd = ReaderDescription("spark_parquet", Map("data" -> "{data(deadbeefdeadbeef)}"))
    val cat = Catalog(entries = Map("deadbeefdeadbeef" -> rd), aliases = Map("x" -> "deadbeefdeadbeef"))
    intercept[IllegalStateException](cat("x"))
  }

  test("extractParameter turns literals into overridable templates") {
    val cat = Catalog()
      .add("li", DataRef("parquet", "/root/testdata/sf0.001/lineitem.parquet"), "spark_parquet")
      .extractParameter("li", "sf", "sf0.001")
    // default keeps the original behavior
    assert(cat("li").ref.url == "/root/testdata/sf0.001/lineitem.parquet")
    // override rebinds the extracted literal
    assert(cat("li", Map("sf" -> "sf0.01")).ref.url == "/root/testdata/sf0.01/lineitem.parquet")
    assert(cat("li").read(spark).count() == 6000)

    // promote lifts the parameter to catalog level
    val promoted = cat.promoteParameter("li", "sf")
    assert(promoted.userParameters.exists(_.name == "sf"))
    assert(promoted("li").ref.url == "/root/testdata/sf0.001/lineitem.parquet")
    assert(SearchExpr.anyText("lineitem", "nope").matches("li", promoted.entries(promoted.aliases("li")), promoted))
  }

  test("extractParameter re-keys the data description under its new token") {
    val cat = Catalog()
      .add("li", DataRef("parquet", "/root/testdata/sf0.001/lineitem.parquet"), "spark_parquet")
      .extractParameter("li", "sf", "sf0.001")
    // content-hash-key invariant: every data map key equals its value's token
    cat.data.foreach { case (k, dd) => assert(k == dd.token, s"stale data key $k != ${dd.token}") }
    // and the entry's {data(...)} kwarg follows the re-keyed token
    val rd = cat.entries(cat.aliases("li"))
    val dtok = rd.kwargs("data") match {
      case Templates.DataRe(t, _) => t
      case other                  => fail(s"data kwarg is not a data reference: $other")
    }
    assert(cat.data.contains(dtok))
    // re-adding an identical data ref must dedup on its token, not duplicate
    val readd = cat.add("li2", cat.data(dtok).ref, "spark_parquet")
    assert(readd.data.size == cat.data.size)
  }

  test("reference-written v2 YAML (output_instance/datatype/kwargs.url/dict params) parses") {
    // shape per reference entry.py to_dict / examples.py golden YAML
    val yaml =
      """version: 2
        |aliases:
        |  prices: e1
        |entries:
        |  e1:
        |    reader: intake.readers.readers:PandasParquet
        |    kwargs:
        |      data: '{data(d1)}'
        |    metadata: {}
        |    output_instance: pandas:DataFrame
        |    user_parameters:
        |      region:
        |        cls: intake.readers.user_parameters:SimpleUserParameter
        |        default: emea
        |        description: which region
        |        dtype: str
        |data:
        |  d1:
        |    datatype: intake.readers.datatypes:Parquet
        |    kwargs:
        |      metadata: {}
        |      storage_options: null
        |      url: /data/prices.parquet
        |    metadata: {}
        |    user_parameters: {}
        |metadata: {}
        |user_parameters:
        |  cutoff:
        |    cls: intake.readers.user_parameters:BoundedNumberUserParameter
        |    default: 5
        |    description: bound
        |    max: 10
        |    min: 1
        |""".stripMargin
    val cat = CatalogIO.fromYamlString(yaml)
    val dd = cat.data("d1")
    assert(dd.ref.kind == "parquet")
    assert(dd.ref.url == "/data/prices.parquet")
    val rd = cat.entries("e1")
    assert(rd.output == "pandas:DataFrame")
    assert(rd.userParameters.map(_.name) == Seq("region"))
    assert(rd.userParameters.head.default == "emea")
    val cutoff = cat.userParameters.find(_.name == "cutoff").get
    assert(cutoff.isInstanceOf[BoundedNumberParameter])
    assert(cutoff.asInstanceOf[BoundedNumberParameter].max == 10.0)
  }

  test("literal entries embed rows directly in the catalog") {
    val cat = Catalog().add(
      "inline",
      DataRef("literal", "", Map("data" -> "{\"id\":1,\"name\":\"a\"}\n{\"id\":2,\"name\":\"b\"}")),
      "literal_reader")
    val yaml = CatalogIO.toYamlString(cat)
    val df = CatalogIO.fromYamlString(yaml)("inline").read(spark)
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq == Seq("id", "name"))
  }

  test("sql passthrough over registered catalog views") {
    val cat = Catalog()
      .add("lineitem_v", DataRef("parquet", s"$sf/lineitem.parquet"), "spark_parquet")
    val out = cat.sql(spark, "SELECT count(*) AS n FROM lineitem_v WHERE l_quantity > 45")
    assert(out.collect().head.getLong(0) > 0)
  }
}
