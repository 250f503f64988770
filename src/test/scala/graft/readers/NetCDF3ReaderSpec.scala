package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.Files

/** Fixture built byte-by-byte to the published NetCDF classic spec:
  * dims x=2, y=3 and unlimited time; fixed var `temp(x,y)` double and
  * record var `series(time,y)` float, plus a global attribute.
  */
class NetCDF3ReaderSpec extends SparkSpec {
  import spark.implicits._

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def build(tempBegin: Int, seriesBegin: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    def name(s: String): Unit = {
      out.writeInt(s.length)
      out.write(s.getBytes("UTF-8"))
      (s.length until pad4(s.length)).foreach(_ => out.writeByte(0))
    }
    out.write("CDF".getBytes("UTF-8")); out.writeByte(1) // version 1
    out.writeInt(2) // numrecs
    // dim_list
    out.writeInt(0x0A); out.writeInt(3)
    name("time"); out.writeInt(0) // record dim
    name("x"); out.writeInt(2)
    name("y"); out.writeInt(3)
    // global attributes: title = "t"
    out.writeInt(0x0C); out.writeInt(1)
    name("title"); out.writeInt(2); out.writeInt(1); out.write("t".getBytes); out.writeByte(0); out.writeByte(0); out.writeByte(0)
    // var_list
    out.writeInt(0x0B); out.writeInt(2)
    // temp(x, y) double: dimids 1,2; no atts; type 6; vsize 48
    name("temp"); out.writeInt(2); out.writeInt(1); out.writeInt(2)
    out.writeInt(0); out.writeInt(0) // absent att list
    out.writeInt(6); out.writeInt(48); out.writeInt(tempBegin)
    // series(time, y) float: dimids 0,2; no atts; type 5; vsize 12
    name("series"); out.writeInt(2); out.writeInt(0); out.writeInt(2)
    out.writeInt(0); out.writeInt(0)
    out.writeInt(5); out.writeInt(12); out.writeInt(seriesBegin)
    out.flush()
    bos.toByteArray
  }

  private lazy val ncPath: String = {
    val headerLen = build(0, 0).length
    val tempBegin = headerLen
    val seriesBegin = headerLen + 48
    val bos = new ByteArrayOutputStream()
    bos.write(build(tempBegin, seriesBegin))
    val out = new DataOutputStream(bos)
    // temp values: 10,11,12 / 20,21,22 (row-major x,y)
    Seq(10.0, 11.0, 12.0, 20.0, 21.0, 22.0).foreach(out.writeDouble)
    // record 0: series = 1,2,3 ; record 1: series = 4,5,6
    Seq(1f, 2f, 3f).foreach(out.writeFloat)
    Seq(4f, 5f, 6f).foreach(out.writeFloat)
    out.flush()
    val dir = Files.createTempDirectory("nc3")
    Files.write(dir.resolve("fix.nc"), bos.toByteArray)
    s"file://$dir/fix.nc"
  }

  test("header parses dims, attrs, vars") {
    val hdr = NetCDF3Reader.header(ncPath)
    assert(hdr.version == 1 && hdr.numRecs == 2)
    assert(hdr.dims.map(d => d.name -> d.length) == Seq("time" -> 0, "x" -> 2, "y" -> 3))
    assert(hdr.attrs == Map("title" -> "t"))
    assert(hdr.vars.map(_.name) == Seq("temp", "series"))
    assert(hdr.recSize == 12)
  }

  test("fixed variable reads long-form with real dim names") {
    val df = NetCDF3Reader.read(spark, ncPath, "temp")
    assert(df.columns.toSeq == Seq("x", "y", "value"))
    val rows = df.as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      (0L, 0L, 10.0), (0L, 1L, 11.0), (0L, 2L, 12.0),
      (1L, 0L, 20.0), (1L, 1L, 21.0), (1L, 2L, 22.0)))
  }

  test("record variable interleaves per record") {
    val df = NetCDF3Reader.read(spark, ncPath, "series")
    assert(df.columns.toSeq == Seq("time", "y", "value"))
    val rows = df.as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      (0L, 0L, 1.0), (0L, 1L, 2.0), (0L, 2L, 3.0),
      (1L, 0L, 4.0), (1L, 1L, 5.0), (1L, 2L, 6.0)))
  }

  test("single short record variable packs records without padding") {
    // classic-format special case: exactly one record var of byte/char/short
    // type → record slabs are NOT 4-byte padded; stride is the unpadded size
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    def name(s: String): Unit = {
      out.writeInt(s.length); out.write(s.getBytes("UTF-8"))
      (s.length until pad4(s.length)).foreach(_ => out.writeByte(0))
    }
    def header(begin: Int): Unit = {
      out.write("CDF".getBytes("UTF-8")); out.writeByte(1)
      out.writeInt(2) // numrecs
      out.writeInt(0x0A); out.writeInt(2)
      name("time"); out.writeInt(0)
      name("y"); out.writeInt(3)
      out.writeInt(0); out.writeInt(0) // absent global atts
      out.writeInt(0x0B); out.writeInt(1)
      name("s"); out.writeInt(2); out.writeInt(0); out.writeInt(1)
      out.writeInt(0); out.writeInt(0)
      out.writeInt(3); out.writeInt(8); out.writeInt(begin) // short; vsize padded to 8
    }
    header(0)
    val headerLen = bos.size()
    bos.reset()
    header(headerLen)
    // two 6-byte records back to back — no padding between slabs
    Seq(1, 2, 3, 4, 5, 6).foreach(v => out.writeShort(v))
    out.flush()
    val dir = Files.createTempDirectory("nc3s")
    Files.write(dir.resolve("s.nc"), bos.toByteArray)
    val path = s"file://$dir/s.nc"
    assert(NetCDF3Reader.header(path).recSize == 6)
    val rows = NetCDF3Reader.read(spark, path, "s")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      (0L, 0L, 1.0), (0L, 1L, 2.0), (0L, 2L, 3.0),
      (1L, 0L, 4.0), (1L, 1L, 5.0), (1L, 2L, 6.0)))
  }

  test("registry reader resolves by kind with variable option") {
    val r = SparkReaders.reader("netcdf3_reader").get
    val df = r.read(spark, DataRef("netcdf3", ncPath, options = Map("variable" -> "series")))
    assert(df.count() == 6)
    // default: first variable
    val d2 = r.read(spark, DataRef("netcdf3", ncPath))
    assert(d2.columns.toSeq == Seq("x", "y", "value"))
  }
}
