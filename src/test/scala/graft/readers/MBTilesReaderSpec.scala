package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}

/** Fixture `fixtures/sample.mbtiles` was written by the real SQLite
  * engine (python stdlib sqlite3): `metadata` name/value pairs and a raw
  * `tiles` table holding all tiles for zooms 0-2 with a tiny per-tile
  * blob.
  */
class MBTilesReaderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    val res = getClass.getResource("/fixtures/sample.mbtiles")
    assert(res != null, "missing fixtures/sample.mbtiles")
    res.toString
  }

  test("metadata reads as a map") {
    val m = MBTilesReader.metadata(spark, url)
    assert(m("name") == "fixture" && m("format") == "png" && m("maxzoom") == "2")
  }

  test("tiles read with TMS to XYZ row flip") {
    val df = MBTilesReader.read(spark, url)
    assert(df.columns.toSeq == Seq("zoom_level", "tile_column", "tile_row", "xyz_row", "tile_data"))
    assert(df.count() == 1 + 4 + 16)
    val z2 = df.filter($"zoom_level" === 2 && $"tile_column" === 1 && $"tile_row" === 3).head()
    assert(z2.getAs[Long]("xyz_row") == 0L) // 2^2 - 1 - 3
    val blob = z2.getAs[Array[Byte]]("tile_data")
    assert(blob.toSeq == Seq(0x89.toByte, 0x50.toByte, 0x4e.toByte, 0x47.toByte, 2.toByte, 1.toByte, 3.toByte))
  }

  test("kind detection prefers mbtiles over sqlite for .mbtiles") {
    val head = "SQLite format 3".getBytes ++ Array[Byte](0)
    assert(Detect.recommend("tiles.mbtiles", head = head).head.kind.name == "mbtiles")
    assert(SparkReaders.reader("mbtiles_reader").get.read(spark, DataRef("mbtiles", url)).count() == 21)
  }
}
