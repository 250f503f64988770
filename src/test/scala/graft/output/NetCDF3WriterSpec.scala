package graft.output

import graft.SparkSpec
import graft.readers.NetCDF3Reader

/** Write→read round-trip through the in-repo NetCDF3 stack: the writer
  * emits classic CDF-1 (big-endian, fixed dims, contiguous data) and
  * the existing header parser + distributed reader decode it back.
  */
class NetCDF3WriterSpec extends SparkSpec {

  test("2-D double round-trips with real dim names and fill for absent cells") {
    import spark.implicits._
    // 2x3 grid with one absent cell (1,2) → fillValue
    val df = Seq(
      (0L, 0L, 1.5), (0L, 1L, 2.5), (0L, 2L, 3.5),
      (1L, 0L, -1.0), (1L, 1L, 0.25)
    ).toDF("time", "lat", "value")
    val dir = java.nio.file.Files.createTempDirectory("ncw").toFile
    val url = s"file://$dir/grid.nc"
    val ref = NetCDF3Writer.write(df, url, varName = "sst", shape = Seq(2, 3), fillValue = -9.0)
    assert(ref.kind == "netcdf3" && ref.options("variable") == "sst")

    val hdr = NetCDF3Reader.header(url, spark.sparkContext.hadoopConfiguration)
    assert(hdr.dims.map(d => (d.name, d.length)) == Seq(("time", 2), ("lat", 3)))
    assert(hdr.vars.map(_.name) == Seq("sst"))

    val back = NetCDF3Reader.read(spark, url, "sst")
      .orderBy("time", "lat").as[(Long, Long, Double)].collect()
    assert(back.length == 6)
    assert(back.toSeq == Seq(
      (0L, 0L, 1.5), (0L, 1L, 2.5), (0L, 2L, 3.5),
      (1L, 0L, -1.0), (1L, 1L, 0.25), (1L, 2L, -9.0)))
  }

  test("1-D int with inferred shape round-trips") {
    import spark.implicits._
    val df = Seq.tabulate(7)(i => (i.toLong, (i * 10).toDouble)).toDF("x", "value")
    val dir = java.nio.file.Files.createTempDirectory("ncw1").toFile
    val url = s"file://$dir/v.nc"
    NetCDF3Writer.write(df, url, varName = "v", dtype = "int")
    val back = NetCDF3Reader.read(spark, url, "v").orderBy("x").as[(Long, Double)].collect()
    assert(back.toSeq == Seq.tabulate(7)(i => (i.toLong, (i * 10).toDouble)))
  }

  test("cell bound rejects oversized grids") {
    import spark.implicits._
    val df = Seq((0L, 0.0)).toDF("x", "value")
    intercept[IllegalArgumentException] {
      NetCDF3Writer.serialize(df, "v", shape = Seq(1000), maxCells = 10)
    }
  }

  test("row bound fires without materializing an over-bound frame") {
    import spark.implicits._
    // 10M-row frame, bound 100: limit(101).collect() touches 101 rows;
    // a full collect here would be ~240 MB of Row objects. The require
    // message (not an OOM) is the contract.
    val big = spark.range(10L * 1000 * 1000).select($"id".as("x"), ($"id" * 2).cast("double").as("value"))
    val e = intercept[IllegalArgumentException] {
      NetCDF3Writer.serialize(big, "v", maxCells = 100)
    }
    assert(e.getMessage.contains("exceeds 100 rows"))
  }

  test("byte-size cap rejects grids over the 2 GiB artifact limit even with a large maxCells") {
    import spark.implicits._
    val df = Seq((0L, 0.0)).toDF("x", "value")
    // 300M double cells = 2.4 GB > Int.MaxValue bytes; maxCells alone
    // would admit it — the byte cap must refuse before any allocation.
    val e = intercept[IllegalArgumentException] {
      NetCDF3Writer.serialize(df, "v", shape = Seq(300 * 1000 * 1000), maxCells = 400L * 1000 * 1000)
    }
    assert(e.getMessage.contains("cells exceeds bound"))
  }

  test("integer dim columns are accepted") {
    import spark.implicits._
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0)).toDF("x", "value") // IntegerType dim
    val dir = java.nio.file.Files.createTempDirectory("ncwi").toFile
    val url = s"file://$dir/i.nc"
    NetCDF3Writer.write(df, url, varName = "v")
    val back = NetCDF3Reader.read(spark, url, "v").orderBy("x").as[(Long, Double)].collect()
    assert(back.toSeq == Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)))
  }

  test("rows outside an explicit shape fail with a count instead of silently dropping") {
    import spark.implicits._
    val df = Seq((0L, 1.0), (5L, 2.0), (7L, 3.0)).toDF("x", "value")
    val e = intercept[IllegalArgumentException] {
      NetCDF3Writer.serialize(df, "v", shape = Seq(3))
    }
    assert(e.getMessage.contains("2 rows fall outside shape 3"))
  }
}
