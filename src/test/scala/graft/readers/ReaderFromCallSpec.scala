package graft.readers

import java.nio.file.Files

import graft.SparkSpec

/** reader_from_call parity (reference readers.py:3669 + its test
  * test_reader.py:34 `"df = pd.read_csv(fp.name)"`): call strings lower
  * to DataRefs on the shared reader registry and round-trip real data.
  */
class ReaderFromCallSpec extends SparkSpec {
  import spark.implicits._

  test("parse: positional/keyword args, assignment prefix, literals") {
    val c = ReaderFromCall.parseCall("""df = pd.read_csv("x.csv", sep=";", header=True, n=3)""")
    assert(c.func == "pd.read_csv")
    assert(c.args == Seq("\"x.csv\""))
    assert(c.kwargs == Seq("sep" -> "\";\"", "header" -> "True", "n" -> "3"))
    val ref = ReaderFromCall.toDataRef(c)
    assert(ref.kind == "csv" && ref.url == "x.csv")
    assert(ref.options == Map("sep" -> ";", "header" -> "true", "n" -> "3"))
  }

  test("parse: nested commas/brackets stay inside one argument") {
    val c = ReaderFromCall.parseCall(
      """pd.read_csv('x.csv', names=['a', 'b'], dtype={'a': 'int64', 'b': 'str'})""")
    assert(c.args == Seq("'x.csv'"))
    assert(c.kwargs.map(_._1) == Seq("names", "dtype"))
  }

  test("identifier args resolve through vars or refuse loudly (the fp.name case)") {
    // the reference test shape: reader_from_call("df = pd.read_csv(fp.name)")
    // — its eval resolves fp.name in the caller frame; here vars is the
    // explicit stand-in for that frame
    val e = intercept[IllegalArgumentException] {
      ReaderFromCall.toDataRef(ReaderFromCall.parseCall("df = pd.read_csv(fp.name)"))
    }
    assert(e.getMessage.contains("unresolved identifier 'fp.name'"))
    val ref = ReaderFromCall.toDataRef(
      ReaderFromCall.parseCall("df = pd.read_csv(fp.name)"),
      vars = Map("fp.name" -> "/tmp/f.csv"))
    assert(ref.kind == "csv" && ref.url == "/tmp/f.csv")
  }

  test("function table: pandas/polars/dask/duckdb/numpy/xarray map to kinds") {
    def kindOf(s: String): String = ReaderFromCall.toDataRef(ReaderFromCall.parseCall(s)).kind
    assert(kindOf("""pd.read_parquet("p")""") == "parquet")
    assert(kindOf("""pl.scan_parquet("p")""") == "parquet")
    assert(kindOf("""dd.read_json("p")""") == "json")
    assert(kindOf("""duckdb.read_csv("p")""") == "csv")
    assert(kindOf("""pd.read_excel("p.xlsx")""") == "excel")
    assert(kindOf("""pd.read_stata("p.dta")""") == "stata")
    assert(kindOf("""pl.read_ipc("p.arrow")""") == "arrow_ipc")
    assert(kindOf("""pl.scan_delta("t")""") == "delta")
    assert(kindOf("""np.load("a.npy")""") == "numpy")
    assert(kindOf("""xr.open_zarr("s")""") == "zarr")
    assert(kindOf("""spark.read.parquet("p")""") == "parquet")
    intercept[IllegalArgumentException] { kindOf("""pd.to_csv("p")""") }
    // a bare spark.read.load has no format — it must refuse, not be
    // silently classified as np.load's "numpy"
    val e = intercept[IllegalArgumentException] { kindOf("""spark.read.load("p")""") }
    assert(e.getMessage.contains("without a format"))
    // ...but PySpark's load(path, format=..., **options) form is valid:
    // the kwarg IS the format, and it must not leak into reader options
    val ref = ReaderFromCall.toDataRef(ReaderFromCall.parseCall(
      """spark.read.load("/data/x", format="csv", header="true")"""))
    assert(ref.kind == "csv" && ref.url == "/data/x")
    assert(ref.options == Map("header" -> "true"))
  }

  test("malformed call strings refuse loudly, never with index errors") {
    val bad = Seq(
      """spark.read.format("csv").option(a,(b).load("p")""", // unbalanced nesting in chain
      """spark.read.format("x).load("p")""",                 // quote swallows the close paren
      """pd.read_csv("unclosed""",                           // no trailing paren at all
      """spark.read.format().load()""",                      // empty format and path
      "not a call at all")
    bad.foreach { s =>
      val e = intercept[IllegalArgumentException] {
        ReaderFromCall.toDataRef(ReaderFromCall.parseCall(s))
      }
      assert(e.getMessage != null && e.getMessage.nonEmpty, s"silent failure for: $s")
    }
  }

  test("spark.read.format chain: format/option/options/load") {
    val ref = ReaderFromCall.toDataRef(ReaderFromCall.parseCall(
      """spark.read.format("csv").option("header", "true").option("sep", "|").load("/data/x.csv")"""))
    assert(ref.kind == "csv" && ref.url == "/data/x.csv")
    assert(ref.options == Map("header" -> "true", "sep" -> "|"))
  }

  test("E2E: pd.read_csv call string round-trips written data (reference test_reader.py:34)") {
    val dir = Files.createTempDirectory("rfc").toString + "/t"
    Seq(("a", 1.0), ("b", 3.0)).toDF("col1", "col2")
      .coalesce(1).write.option("header", "true").csv(dir)
    val out = ReaderFromCall.read(spark,
      s"""df = pd.read_csv("$dir", header=True)""")
    assert(out.columns.toSeq == Seq("col1", "col2"))
    assert(out.count() == 2)
    // multiline + joinLines, as the reference's join_lines flag
    val out2 = ReaderFromCall.read(spark,
      s"""df = pd.read_csv(\n  "$dir",\n  header=True\n)""", joinLines = true)
    assert(out2.count() == 2)
  }

  test("E2E: spark.read.format chain reads parquet") {
    val dir = Files.createTempDirectory("rfc2").toString + "/t"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(dir)
    val out = ReaderFromCall.read(spark,
      s"""spark.read.format("parquet").load("$dir")""")
    assert(out.count() == 2 && out.columns.toSeq == Seq("id", "v"))
  }
}
