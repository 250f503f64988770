package graft.output

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.PngCodec

/** DataFrame → PNG chart parity with the reference's ToMatplotlib +
  * MatplotlibToPNG chain (output.py:132/:147) — decoded-pixel assertions,
  * not just "bytes came out".
  */
class ChartRendererSpec extends SparkSpec {
  import spark.implicits._

  private def decode(png: Array[Byte]): (Int, Int, Array[Byte]) =
    PngCodec.decode(png).getOrElse(fail("renderer produced an undecodable PNG"))

  private def colorsOf(png: Array[Byte]): Set[Int] = {
    val (w, h, rgb) = decode(png)
    (0 until w * h).map { p =>
      ((rgb(p * 3) & 0xff) << 16) | ((rgb(p * 3 + 1) & 0xff) << 8) | (rgb(p * 3 + 2) & 0xff)
    }.toSet
  }

  test("linePlot: decodable PNG of requested size with axes, grid and one series color") {
    val df = (0 until 100).map(i => (i.toDouble, math.sin(i / 10.0))).toDF("x", "y")
    val png = ChartRenderer.linePlot(df, "x", Seq("y"), width = 400, height = 300)
    val (w, h, _) = decode(png)
    assert(w == 400 && h == 300)
    val cs = colorsOf(png)
    assert(cs.contains(0xffffff) && cs.contains(0x000000)) // background + axes
    assert(cs.contains(0x1f77b4), "series polyline missing")  // palette(0)
  }

  test("scatterPlot: two series get two distinct palette colors") {
    val df = (0 until 50).map(i => (i.toDouble, i * 2.0, 100.0 - i)).toDF("x", "a", "b")
    val cs = colorsOf(ChartRenderer.scatterPlot(df, "x", Seq("a", "b"), width = 300, height = 200))
    assert(cs.contains(0x1f77b4) && cs.contains(0xd62728))
  }

  test("NaN and infinite rows are dropped, not allowed to poison the extents") {
    // without the finiteness filter a NaN makes the extents NaN and an
    // Infinity collapses every finite point onto one frame edge — the
    // plot renders but is garbage either way
    val clean = (0 until 50).map(i => (i.toDouble, i * 2.0))
    val dirty = clean :+ (Double.NaN, 1.0) :+ (25.0, Double.NaN) :+
      (26.0, Double.PositiveInfinity) :+ (Double.NegativeInfinity, 3.0)
    val pngClean = ChartRenderer.linePlot(clean.toDF("x", "y"), "x", Seq("y"), width = 300, height = 200)
    val pngDirty = ChartRenderer.linePlot(dirty.toDF("x", "y"), "x", Seq("y"), width = 300, height = 200)
    assert(java.util.Arrays.equals(pngClean, pngDirty),
      "a NaN x or y must render identically to the clean frame")
  }

  test("histogram bins distributed and draws bars proportional to counts") {
    // 90 values in [0,1), 10 in [9,10) — with 10 bins, bin 0 is 9x bin 9
    val df = ((0 until 90).map(_ % 10 / 10.0) ++ (0 until 10).map(9 + _ / 10.0)).toDF("v")
    val png = ChartRenderer.histogram(df, "v", bins = 10, width = 300, height = 200)
    val (w, h, rgb) = decode(png)
    def barHeight(xFrac: Double): Int = {
      val x = (40 + xFrac * (w - 40 - 10 - 1)).toInt
      (0 until h).count { y =>
        val p = (y * w + x) * 3
        ((rgb(p) & 0xff) << 16 | (rgb(p + 1) & 0xff) << 8 | (rgb(p + 2) & 0xff)) == 0x1f77b4
      }
    }
    val tall = barHeight(0.05)   // inside bin 0
    val short = barHeight(0.95)  // inside bin 9
    assert(tall > short * 4, s"bin-0 bar ($tall px) should dwarf bin-9 ($short px)")
    assert(short > 0, "bin-9 bar missing")
  }

  test("row cap refuses loudly; toPngFile writes a DataRef the registry can re-open") {
    val df = (0 until 100).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ChartRenderer.linePlot(df, "x", Seq("y"), maxRows = 50)
    }
    assert(e.getMessage.contains("downsample"))
    val path = Files.createTempDirectory("chart").toString + "/c.png"
    val ref = ChartRenderer.toPngFile(df, path, "line", "x", Seq("y"), width = 200, height = 150)
    assert(ref.kind == "png" && ref.metadata("chart") == "line")
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    val (w, _, _) = decode(bytes)
    assert(w == 200)
    // the png kind resolves through the shared reader registry
    val (imp, rest) = graft.readers.SparkReaders.recommend(ref)
    assert((imp ++ rest).nonEmpty)
  }
}
