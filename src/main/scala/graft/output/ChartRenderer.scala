package graft.output

import graft.datatypes.DataRef
import graft.ops.PngCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Headless chart rendering: DataFrame → PNG, pure JVM (reference
  * intake/readers/output.py:132 ToMatplotlib + :147 MatplotlibToPNG —
  * `df.plot(ax)` then `fig.savefig(png)`; here the figure IS the PNG,
  * rasterized through the same [[PngCodec]] the media writers use, no
  * plotting library).
  *
  * Scale contract: a chart is a bounded artifact by definition —
  *  - line/scatter collect at most `maxRows` points (refuse loudly past
  *    the cap; downsample upstream with `Relational.exactSampleK` or
  *    `Mixing.hashSample` — the cap is the same documented driver-side
  *    boundedness class as `Hdf5Writer`);
  *  - axis extents come from one distributed `agg(min,max)`, never a
  *    driver scan;
  *  - histograms bin DISTRIBUTED (floor((v-lo)/w) groupBy — one shuffle
  *    of (bin, count) rows) and only the `bins` counts reach the driver,
  *    so a 100 TB column histograms fine.
  */
object ChartRenderer {

  private val White = 0xffffff
  private val Black = 0x000000
  private val Grid = 0xdddddd
  /** series palette (colorblind-safe-ish hues) */
  private val Palette = Array(0x1f77b4, 0xd62728, 0x2ca02c, 0x9467bd, 0xff7f0e, 0x17becf)

  /** mutable RGB raster with primitive draw ops */
  private final class Raster(val w: Int, val h: Int) {
    val buf = new Array[Byte](w * h * 3)
    fillRect(0, 0, w, h, White)
    def set(x: Int, y: Int, c: Int): Unit =
      if (x >= 0 && x < w && y >= 0 && y < h) {
        val p = (y * w + x) * 3
        buf(p) = ((c >> 16) & 0xff).toByte
        buf(p + 1) = ((c >> 8) & 0xff).toByte
        buf(p + 2) = (c & 0xff).toByte
      }
    def fillRect(x0: Int, y0: Int, rw: Int, rh: Int, c: Int): Unit = {
      var y = y0
      while (y < y0 + rh) { var x = x0; while (x < x0 + rw) { set(x, y, c); x += 1 }; y += 1 }
    }
    def line(x0: Int, y0: Int, x1: Int, y1: Int, c: Int): Unit = {
      // Bresenham
      var (x, y) = (x0, y0)
      val dx = math.abs(x1 - x0); val dy = -math.abs(y1 - y0)
      val sx = if (x0 < x1) 1 else -1; val sy = if (y0 < y1) 1 else -1
      var err = dx + dy
      var continue = true
      while (continue) {
        set(x, y, c)
        if (x == x1 && y == y1) continue = false
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; x += sx }
          if (e2 <= dx) { err += dx; y += sy }
        }
      }
    }
    def dot(x: Int, y: Int, c: Int): Unit = fillRect(x - 1, y - 1, 3, 3, c)
  }

  /** 3x5 bitmap glyphs for tick labels: digits, minus, dot, e. Each
    * glyph is 5 rows of 3 bits, MSB left. */
  private val Glyphs: Map[Char, Array[Int]] = Map(
    '0' -> Array(7, 5, 5, 5, 7), '1' -> Array(2, 6, 2, 2, 7),
    '2' -> Array(7, 1, 7, 4, 7), '3' -> Array(7, 1, 7, 1, 7),
    '4' -> Array(5, 5, 7, 1, 1), '5' -> Array(7, 4, 7, 1, 7),
    '6' -> Array(7, 4, 7, 5, 7), '7' -> Array(7, 1, 2, 2, 2),
    '8' -> Array(7, 5, 7, 5, 7), '9' -> Array(7, 5, 7, 1, 7),
    '-' -> Array(0, 0, 7, 0, 0), '.' -> Array(0, 0, 0, 0, 2),
    'e' -> Array(0, 6, 7, 4, 3))

  private def drawText(r: Raster, x: Int, y: Int, s: String, c: Int): Unit = {
    var cx = x
    s.foreach { ch =>
      Glyphs.get(ch).foreach { g =>
        var row = 0
        while (row < 5) {
          var b = 0
          while (b < 3) {
            if (((g(row) >> (2 - b)) & 1) == 1) r.set(cx + b, y + row, c)
            b += 1
          }
          row += 1
        }
      }
      cx += 4
    }
  }

  private def fmt(v: Double): String = {
    val s = if (v == v.toLong.toDouble && math.abs(v) < 1e15) v.toLong.toString
    else f"$v%.3g"
    s.replace("E", "e").replace("+", "")
  }

  private final case class Frame(w: Int, h: Int, x0: Double, x1: Double, y0: Double, y1: Double) {
    val (padL, padR, padT, padB) = (40, 10, 10, 20)
    def px(x: Double): Int =
      padL + (((x - x0) / (if (x1 == x0) 1 else x1 - x0)) * (w - padL - padR - 1)).round.toInt
    def py(y: Double): Int =
      (h - padB - 1) - (((y - y0) / (if (y1 == y0) 1 else y1 - y0)) * (h - padT - padB - 1)).round.toInt
  }

  private def drawAxes(r: Raster, f: Frame): Unit = {
    r.line(f.padL, f.padT, f.padL, f.h - f.padB, Black)
    r.line(f.padL, f.h - f.padB, f.w - f.padR, f.h - f.padB, Black)
    // 5 ticks per axis with grid + labels
    (0 to 4).foreach { i =>
      val xv = f.x0 + (f.x1 - f.x0) * i / 4.0
      val yv = f.y0 + (f.y1 - f.y0) * i / 4.0
      val xp = f.px(xv); val yp = f.py(yv)
      r.line(xp, f.padT, xp, f.h - f.padB, Grid)
      r.line(f.padL, yp, f.w - f.padR, yp, Grid)
      r.line(xp, f.h - f.padB, xp, f.h - f.padB + 3, Black)
      r.line(f.padL - 3, yp, f.padL, yp, Black)
      drawText(r, xp - 6, f.h - f.padB + 5, fmt(xv), Black)
      drawText(r, 2, yp - 2, fmt(yv), Black)
    }
  }

  /** Collect at most maxRows (x, y...) points — refuses loudly past the
    * cap so an accidental full-table plot cannot OOM the driver. */
  private def collectPoints(df: DataFrame, xCol: String, yCols: Seq[String], maxRows: Int): Array[Array[Double]] = {
    val proj = df.select((xCol +: yCols).map(c => col(c).cast("double")): _*)
    val rows = proj.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"chart input exceeds maxRows=$maxRows points — downsample first (hashSample/exactSampleK)")
    // drop null and non-finite cells: one NaN makes the Frame extents
    // NaN, one Infinity collapses every finite point onto the frame
    // edge — either way NaN.round.toInt lands at pixel 0
    rows.filterNot(r =>
        (0 to yCols.length).exists(i => r.isNullAt(i) || !java.lang.Double.isFinite(r.getDouble(i))))
      .map(r => Array.tabulate(yCols.length + 1)(r.getDouble))
  }

  private def render(points: Array[Array[Double]], nSeries: Int, width: Int, height: Int,
      asLine: Boolean): Array[Byte] = {
    require(points.nonEmpty, "no points to plot")
    val xs = points.map(_(0))
    val allY = points.flatMap(_.drop(1))
    val f = Frame(width, height, xs.min, xs.max, allY.min, allY.max)
    val r = new Raster(width, height)
    drawAxes(r, f)
    val sorted = if (asLine) points.sortBy(_(0)) else points
    (1 to nSeries).foreach { s =>
      val c = Palette((s - 1) % Palette.length)
      var prev: Option[(Int, Int)] = None
      sorted.foreach { p =>
        val (xp, yp) = (f.px(p(0)), f.py(p(s)))
        if (asLine) { prev.foreach { case (px0, py0) => r.line(px0, py0, xp, yp, c) }; prev = Some((xp, yp)) }
        else r.dot(xp, yp, c)
      }
    }
    PngCodec.encode(width, height, r.buf)
  }

  /** Line plot of yCols over xCol. Returns PNG bytes. */
  def linePlot(df: DataFrame, xCol: String, yCols: Seq[String],
      width: Int = 800, height: Int = 600, maxRows: Int = 100000): Array[Byte] =
    render(collectPoints(df, xCol, yCols, maxRows), yCols.length, width, height, asLine = true)

  /** Scatter plot of yCols vs xCol. Returns PNG bytes. */
  def scatterPlot(df: DataFrame, xCol: String, yCols: Seq[String],
      width: Int = 800, height: Int = 600, maxRows: Int = 100000): Array[Byte] =
    render(collectPoints(df, xCol, yCols, maxRows), yCols.length, width, height, asLine = false)

  /** Histogram of a numeric column. Binning is DISTRIBUTED: extents via
    * one agg, bin assignment map-side, one (bin, count) shuffle — only
    * `bins` counts reach the driver, so the column can be 100 TB. */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 50,
      width: Int = 800, height: Int = 600): Array[Byte] = {
    require(bins >= 1 && bins <= 10000, s"bins out of range: $bins")
    // NaNs would throw in the ANSI int cast below (and poison extents);
    // a chart silently skipping them is the plotting convention
    val v0 = col(valueCol).cast("double")
    val df2 = df.where(v0.isNotNull && !isnan(v0))
    val v = col(valueCol).cast("double")
    val ext = df2.agg(min(v).as("lo"), max(v).as("hi")).collect()(0)
    require(!ext.isNullAt(0), s"no non-null values in $valueCol")
    val (lo, hi) = (ext.getDouble(0), ext.getDouble(1))
    val w = if (hi == lo) 1.0 else (hi - lo) / bins
    val counts = df2.select(least(floor((v - lo) / w).cast("int"), lit(bins - 1)).as("_b"))
      .where(col("_b").isNotNull)
      .groupBy("_b").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxN = counts.values.max.toDouble
    val f = Frame(width, height, lo, hi, 0, maxN)
    val r = new Raster(width, height)
    drawAxes(r, f)
    (0 until bins).foreach { b =>
      val n = counts.getOrElse(b, 0L)
      if (n > 0) {
        val xa = f.px(lo + b * w); val xb = f.px(lo + (b + 1) * w)
        val top = f.py(n.toDouble)
        r.fillRect(xa, top, math.max(1, xb - xa - 1), (f.h - f.padB) - top, Palette(0))
      }
    }
    PngCodec.encode(width, height, r.buf)
  }

  /** Write a chart PNG to `path` and return the datatype descriptor —
    * the MatplotlibToPNG shape (output.py:147): figure → PNG file a
    * registered reader can re-open.
    */
  def toPngFile(df: DataFrame, path: String, kind: String, xCol: String, yCols: Seq[String],
      bins: Int = 50, width: Int = 800, height: Int = 600, maxRows: Int = 100000): DataRef = {
    val png = kind match {
      case "line"      => linePlot(df, xCol, yCols, width, height, maxRows)
      case "scatter"   => scatterPlot(df, xCol, yCols, width, height, maxRows)
      case "histogram" => histogram(df, xCol, bins, width, height)
      case other       => throw new IllegalArgumentException(s"unknown chart kind: $other (line|scatter|histogram)")
    }
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(png) finally out.close()
    DataRef("png", path, metadata = Map("chart" -> kind, "width" -> width.toString, "height" -> height.toString))
  }
}
