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

  test("matrixmarket url -> long-form matrix") {
    val dir = Files.createTempDirectory("automtx")
    Files.writeString(dir.resolve("m.mtx"),
      "%%MatrixMarket matrix coordinate real general\n2 2 2\n1 1 3.5\n2 2 -1.0\n")
    val df = Pipeline.auto(s"file://$dir/m.mtx").read(spark)
    assert(df.columns.toSeq == Seq("row", "col", "value") && df.count() == 2)
  }
}
