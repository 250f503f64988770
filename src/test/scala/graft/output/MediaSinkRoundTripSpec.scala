package graft.output

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TIFF and NRRD sinks round-trip through the repo's OWN readers — the
  * strongest offline proof a from-scratch encoder can give (reference
  * output.py:298 NumpyToTIFF, :414 SimpleITKToNRRD).
  */
class MediaSinkRoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("encodeTiff: ImageIO (the repo's tiff decode path) reads the pixels back exactly") {
    val (w, h) = (5, 3)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val tif = MediaWriters.encodeTiff(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tif))
    assert(img != null, "ImageIO could not parse the baseline TIFF")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val expected = ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == expected, s"pixel ($x,$y)")
    }
  }

  test("tiffImages writes one decodable file per row, executor-side") {
    val dir = Files.createTempDirectory("tifs").toString
    val rows = Seq(
      ("a", 2, 2, Array.tabulate(12)(_.toByte)),
      ("b", 3, 1, Array.tabulate(9)(i => (255 - i).toByte)))
    val ref = MediaWriters.tiffImages(rows.toDF("name", "width", "height", "pixels_rgb"), dir)
    assert(ref.kind == "tiff")
    val a = javax.imageio.ImageIO.read(new java.io.File(s"$dir/a.tiff"))
    val b = javax.imageio.ImageIO.read(new java.io.File(s"$dir/b.tiff"))
    assert(a.getWidth == 2 && a.getHeight == 2 && b.getWidth == 3 && b.getHeight == 1)
  }

  test("NrrdWriter round-trips a 2-D long-form frame through NrrdReader") {
    // 4x3 array, values = 10*dim0 + dim1
    val df = (for { i <- 0L until 4L; j <- 0L until 3L } yield (i, j, (10 * i + j).toDouble))
      .toDF("dim0", "dim1", "value")
    val path = Files.createTempDirectory("nrrd").toString + "/a.nrrd"
    val ref = NrrdWriter.write(df, path)
    assert(ref.kind == "nrrd" && ref.metadata("sizes") == "4x3")
    val back = graft.readers.NrrdReader.read(spark, path)
      .as[(Long, Long, Double)].collect().toSet
    assert(back == df.as[(Long, Long, Double)].collect().toSet)
    // header is detectable by the shared registry
    val (imp, rest) = graft.readers.SparkReaders.recommend(ref)
    assert((imp ++ rest).exists(_.name == "nrrd_reader"))
    // boundedness refusal
    val e = intercept[IllegalArgumentException] {
      NrrdWriter.write(df, path, cellCap = 5)
    }
    assert(e.getMessage.contains("small-artifact"))
  }
}
