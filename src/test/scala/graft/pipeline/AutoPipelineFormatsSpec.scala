package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The reference's flagship contract — `auto_pipeline(url).read()`,
  * URL in, data out — exercised end-to-end (detect kind → recommend
  * reader → read) over this round's native formats. Fixtures come from
  * the resource files the per-reader specs verify in depth.
  */
class AutoPipelineFormatsSpec extends SparkSpec {

  private def resource(name: String, to: String): String = {
    val dir = Files.createTempDirectory("auto")
    val target = dir.resolve(to)
    Files.copy(Paths.get(getClass.getResource(s"/fixtures/$name").toURI), target,
      StandardCopyOption.REPLACE_EXISTING)
    s"file://$target"
  }

  test("sqlite database url -> rows") {
    val df = Pipeline.auto(resource("sample.db", "data.sqlite"), Map("table" -> "nums")).read(spark)
    assert(df.count() == 2000)
  }

  test("geopackage url -> feature rows") {
    val df = Pipeline.auto(resource("sample.gpkg", "data.gpkg")).read(spark)
    assert(df.columns.contains("geometry_json") && df.count() == 4)
  }

  test("stata url -> typed rows") {
    val df = Pipeline.auto(resource("sample.dta", "data.dta")).read(spark)
    assert(df.columns.toSeq == Seq("id", "weight", "grade", "city") && df.count() == 200)
  }

  test("socrata resource url -> inferred rows") {
    val dir = Files.createTempDirectory("autosoc")
    Files.createDirectories(dir.resolve("resource"))
    Files.writeString(dir.resolve("resource/ab12-cd34.json"),
      """[{"zone": "a", "n": "5"}, {"zone": "b", "n": "7"}]""")
    // URL -> rows contract: the /resource/{4x4}.json pattern surfaces the
    // socrata kind among the candidates (ServiceReadersSpec covers the
    // dedicated reader); plain json wins the tiebreak here and both
    // produce the same rows on a single page
    val df = Pipeline.auto(s"file://$dir/resource/ab12-cd34.json",
      Map("paged" -> "false")).read(spark)
    assert(df.count() == 2 && df.columns.sorted.toSeq == Seq("n", "zone"))
  }

  test("influx query response url -> long-form rows") {
    val dir = Files.createTempDirectory("autoinflux")
    Files.writeString(dir.resolve("query.json"),
      """{"results":[{"series":[{"name":"m","columns":["time","v"],"values":[["t0",1.5]]}]}]}""")
    val df = graft.catalog.ServiceReaders.readInflux(spark, s"file://$dir/query.json")
    assert(df.count() == 1 && df.columns.contains("series"))
  }

  test("matrixmarket url -> long-form matrix") {
    val dir = Files.createTempDirectory("automtx")
    Files.writeString(dir.resolve("m.mtx"),
      "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 3.5\n2 2 -1.0\n")
    val df = Pipeline.auto(s"file://$dir/m.mtx").read(spark)
    assert(df.columns.toSeq == Seq("row", "col", "value") && df.count() == 2)
  }
}
