package graft.readers

import graft.datatypes.DataRef
import graft.ops.Multimodal
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoTIFF support (published TIFF 6.0 + GeoTIFF specs; reference
  * RasterIOXarray readers.py:1496, there via rasterio): the TIFF IFD
  * walk extracts the georeferencing tags — ModelPixelScale (33550) and
  * ModelTiepoint (33922) — giving the affine pixel→world transform,
  * while pixel decode rides the JDK ImageIO TIFF codec already behind
  * [[Multimodal.decodeImage]]. `read` emits one row per pixel with
  * both raster indices and world coordinates; tiny driver footprint
  * (IFD only), pixels decode in the binaryFile scan on executors.
  */
object GeoTiffReader {

  final case class GeoRef(scaleX: Double, scaleY: Double, originX: Double, originY: Double) {
    def worldX(col: Double): Double = originX + col * scaleX
    def worldY(row: Double): Double = originY - row * scaleY
  }

  /** Parse the first IFD for the GeoTIFF transform tags. */
  def georef(bytes: Array[Byte]): Option[GeoRef] = {
    if (bytes.length < 8) return None
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _          => return None
    }
    val bb = ByteBuffer.wrap(bytes).order(order)
    if (bb.getShort(2) != 42) return None
    val ifdAt = bb.getInt(4)
    if (ifdAt < 0 || ifdAt + 2 > bytes.length) return None
    val n = bb.getShort(ifdAt) & 0xffff
    var scale: Option[(Double, Double)] = None
    var tiepoint: Option[(Double, Double, Double, Double)] = None
    (0 until n).foreach { i =>
      val e = ifdAt + 2 + i * 12
      if (e + 12 <= bytes.length) {
        val tag = bb.getShort(e) & 0xffff
        val count = bb.getInt(e + 4)
        val valueAt = bb.getInt(e + 8) // doubles never fit inline
        if (tag == 33550 && count >= 2 && valueAt + 16 <= bytes.length)
          scale = Some((bb.getDouble(valueAt), bb.getDouble(valueAt + 8)))
        if (tag == 33922 && count >= 6 && valueAt + 48 <= bytes.length)
          tiepoint = Some((bb.getDouble(valueAt), bb.getDouble(valueAt + 8),
            bb.getDouble(valueAt + 24), bb.getDouble(valueAt + 32)))
      }
    }
    for ((sx, sy) <- scale; (px, py, wx, wy) <- tiepoint)
      yield GeoRef(sx, sy, wx - px * sx, wy + py * sy)
  }

  /** Read a GeoTIFF directory/glob: one row per pixel with raster
    * indices, world coordinates and RGB values.
    */
  def read(spark: SparkSession, url: String): DataFrame = {
    val dec = udf { (content: Array[Byte]) =>
      for {
        (_, w, h, px) <- Multimodal.decodeImage(content)
        g <- georef(content)
      } yield {
        (0 until w * h).map { i =>
          val (row, colI) = (i / w, i % w)
          (row.toLong, colI.toLong, g.worldX(colI + 0.5), g.worldY(row + 0.5),
            px(i * 3) & 0xff, px(i * 3 + 1) & 0xff, px(i * 3 + 2) & 0xff)
        }
      }
    }
    Multimodal.readBinary(spark, url, "*.tif*")
      .select(col("path"), explode(dec(col("content"))).as("_p"))
      .select(
        col("path"),
        col("_p._1").as("row"), col("_p._2").as("col"),
        col("_p._3").as("x"), col("_p._4").as("y"),
        col("_p._5").as("r"), col("_p._6").as("g"), col("_p._7").as("b"))
  }
}

class GeoTiffReaderImpl extends Reader {
  val name = "geotiff_reader"
  val implementsKinds = Set("tiff", "cog")
  // a COG is geo by definition (datatypes.py:1449 — byte-identical to
  // TIFF, the naming convention is the signal); plain tiff needs the
  // explicit geo opt-in to route here over the image/binary readers
  override def isOk(ref: DataRef): Boolean =
    ref.kind == "cog" || (ref.kind == "tiff" && ref.options.get("geo").contains("true"))
  def read(spark: SparkSession, ref: DataRef): DataFrame = GeoTiffReader.read(spark, ref.url)
}
