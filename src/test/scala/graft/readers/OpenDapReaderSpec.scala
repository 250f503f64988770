package graft.readers

import graft.SparkSpec
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Canned DDS/DODS fixtures exercising the DAP2 wire decode: DDS
  * grammar (atomic arrays, Grid with MAPS, unnamed dims), the Data:
  * split, and XDR array decoding for the promoted/padded types.
  */
class OpenDapReaderSpec extends SparkSpec {

  private val dds =
    """Dataset {
      |    Float64 sst[time = 2][lat = 3];
      |    Int16 mask[lat = 3];
      |    Float64 time[time = 2];
      |} climate;
      |""".stripMargin

  private def dodsResponse(constrainedDds: String, xdr: Array[Byte]): Array[Byte] =
    (constrainedDds + "\nData:\n").getBytes(StandardCharsets.ISO_8859_1) ++ xdr

  private val sstValues = Array(21.5, 22.0, 22.5, 18.0, 18.5, 19.0)

  private def sstXdr: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + sstValues.length * 8)
    bb.putInt(6).putInt(6)
    sstValues.foreach(bb.putDouble)
    bb.array()
  }

  private def maskXdr: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 3 * 4) // Int16 promoted to 32-bit XDR words
    bb.putInt(3).putInt(3)
    Seq(1, 0, -1).foreach(bb.putInt)
    bb.array()
  }

  private val fixtures: Map[String, Array[Byte]] = Map(
    "http://srv/dodsC/climate.nc.dds" -> dds.getBytes(StandardCharsets.ISO_8859_1),
    "http://srv/dodsC/climate.nc.dods?sst" ->
      dodsResponse("Dataset {\n    Float64 sst[time = 2][lat = 3];\n} climate;", sstXdr),
    "http://srv/dodsC/climate.nc.dods?mask" ->
      dodsResponse("Dataset {\n    Int16 mask[lat = 3];\n} climate;", maskXdr)
  )

  private val fetch: OpenDapReader.Fetch = url =>
    new java.io.ByteArrayInputStream(
      fixtures.getOrElse(url, fail(s"unexpected fetch: $url")))

  test("dds parse: atomic arrays, Grid blocks, unnamed dims") {
    val vs = OpenDapReader.parseDds(dds)
    assert(vs.map(_.name) == Seq("sst", "mask", "time"))
    assert(vs.head.dims == Seq(("time", 2), ("lat", 3)))

    val grid = OpenDapReader.parseDds(
      """Dataset {
        |    Grid {
        |     ARRAY:
        |        Float32 temp[time = 2][lat = 2];
        |     MAPS:
        |        Float64 time[time = 2];
        |        Float64 lat[lat = 2];
        |    } temp;
        |} g;""".stripMargin)
    assert(grid.map(_.name) == Seq("temp", "time", "lat"))
    assert(grid.head.dapType == "Float32") // ARRAY decl wins over the grid name
    assert(grid.head.dims.map(_._2) == Seq(2, 2))

    val unnamed = OpenDapReader.parseDds("Dataset {\n Int32 v[4][5];\n} d;")
    assert(unnamed.head.dims == Seq(("dim0", 4), ("dim1", 5)))
  }

  test("dods read decodes XDR into the long-form layout") {
    val df = OpenDapReader.read(spark, "http://srv/dodsC/climate.nc", "sst", fetch)
    assert(df.schema.fieldNames.toSeq == Seq("time", "lat", "value"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(rows.length == 6)
    assert(rows(0) == ((0L, 0L, 21.5)))
    assert(rows(5) == ((1L, 2L, 19.0)))

    // default variable = first in DDS; .dds suffix on the url is stripped
    val first = OpenDapReader.read(spark, "http://srv/dodsC/climate.nc.dds", null, fetch)
    assert(first.schema.fieldNames.toSeq == Seq("time", "lat", "value"))
  }

  test("int16 arrays arrive as promoted 32-bit XDR words") {
    val df = OpenDapReader.read(spark, "http://srv/dodsC/climate.nc", "mask", fetch)
    val vals = df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(vals.toSeq == Seq(1.0, 0.0, -1.0))
  }

  test("count mismatch and missing Data: marker are rejected") {
    val bad = ByteBuffer.allocate(16).putInt(6).putInt(5).array()
    intercept[IllegalArgumentException] {
      OpenDapReader.decodeXdr(OpenDapReader.DapVar("x", "Float64", Seq(("d", 6))), bad)
    }
    intercept[IllegalArgumentException] {
      OpenDapReader.splitDods("Dataset { } d;".getBytes(StandardCharsets.ISO_8859_1))
    }
  }

  test("opendap reader is registered and dodsC urls are detected") {
    val (ok, _) = SparkReaders.recommend(graft.datatypes.DataRef("opendap", "http://srv/dodsC/x.nc"))
    assert(ok.exists(_.name == "opendap_reader"))
    val kinds = graft.datatypes.Detect.recommend("https://thredds.example.org/thredds/dodsC/model/run.nc")
    assert(kinds.exists(_.kind.name == "opendap"))
  }
}
