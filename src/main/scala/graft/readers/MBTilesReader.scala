package graft.readers

import graft.datatypes.DataRef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MBTiles reader (published MBTiles spec; reference readers.py:2315
  * MBTiles via sqlite). An MBTiles archive IS a SQLite database, so the
  * native [[SqliteReader]] does the distributed page scanning; this
  * layer exposes the `tiles` table with TMS→XYZ row flipping and the
  * `metadata` key/value map.
  *
  * Note: MBTiles commonly stores tiles through a `map`+`images` view
  * pair; views have no b-tree, so only the raw-`tiles`-table layout is
  * readable natively — the view layout raises with a clear message.
  */
object MBTilesReader {

  /** The archive's metadata table as a Scala map (driver-side; tiny). */
  def metadata(spark: SparkSession, url: String): Map[String, String] =
    SqliteReader.read(spark, url, "metadata")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  /** Tiles as (zoom_level, tile_column, tile_row, xyz_row, tile_data):
    * `tile_row` is the stored TMS row, `xyz_row` the flipped
    * `2^zoom - 1 - row` most consumers expect.
    */
  def read(spark: SparkSession, url: String): DataFrame = {
    val names = SqliteReader.tables(url, spark.sparkContext.hadoopConfiguration).map(_.name)
    require(names.contains("tiles"),
      s"no raw `tiles` table in $url (tables: ${names.mkString(", ")}); view-backed MBTiles unsupported")
    SqliteReader.read(spark, url, "tiles")
      .withColumn("xyz_row",
        (pow(lit(2), col("zoom_level")).cast("long") - 1 - col("tile_row")).cast("long"))
      .select("zoom_level", "tile_column", "tile_row", "xyz_row", "tile_data")
  }
}

class MBTilesReaderImpl extends Reader {
  val name = "mbtiles_reader"
  val implementsKinds = Set("mbtiles")
  def read(spark: SparkSession, ref: DataRef): DataFrame = MBTilesReader.read(spark, ref.url)
}
