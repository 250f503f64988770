package graft.ops

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

class PngCodecSpec extends SparkSpec {

  /** Independent minimal PNG builder: deflates the given raw scanline
    * bytes (filter byte + pixels per line) under the given IHDR.
    */
  private def buildPng(w: Int, h: Int, colorType: Int, raw: Array[Byte],
      palette: Option[Array[Byte]] = None, interlace: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      out.write(be32(data.length)); out.write(typ.getBytes("ISO-8859-1")); out.write(data)
      val c = new CRC32(); c.update(typ.getBytes("ISO-8859-1")); c.update(data)
      out.write(be32(c.getValue.toInt))
    }
    val ihdr = new ByteArrayOutputStream()
    def be32(v: Int) = { ihdr.write(v >> 24); ihdr.write((v >> 16) & 0xff); ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff) }
    be32(w); be32(h); ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(interlace)
    chunk("IHDR", ihdr.toByteArray)
    palette.foreach(p => chunk("PLTE", p))
    val d = new Deflater(); d.setInput(raw); d.finish()
    val z = new ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("encode/decode round-trips RGB pixels exactly") {
    val w = 5; val h = 4
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val Some((dw, dh, out)) = PngCodec.decode(PngCodec.encode(w, h, rgb))
    assert((dw, dh) == (w, h))
    assert(out.toSeq == rgb.toSeq)
  }

  test("all five scanline filters reconstruct") {
    // 2x5 RGB image, one row per filter type (plus a 0 row first since
    // Up/Paeth reference the previous reconstructed line)
    val w = 2; val h = 5
    val img = Array.tabulate(h, w * 3)((y, x) => ((x * 29 + y * 53 + 7) % 256))
    val raw = new ByteArrayOutputStream()
    val bpp = 3
    for (y <- 0 until h) {
      val filter = y // 0..4
      raw.write(filter)
      for (x <- 0 until w * 3) {
        val cur = img(y)(x)
        val a = if (x >= bpp) img(y)(x - bpp) else 0
        val b = if (y > 0) img(y - 1)(x) else 0
        val c = if (x >= bpp && y > 0) img(y - 1)(x - bpp) else 0
        val enc = filter match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw.write(enc & 0xff)
      }
    }
    val Some((dw, dh, out)) = PngCodec.decode(buildPng(w, h, 2, raw.toByteArray))
    assert((dw, dh) == (w, h))
    assert(out.toSeq == img.flatten.map(_.toByte).toSeq)
  }

  test("grayscale, gray+alpha, RGBA and palette normalize to RGB") {
    // gray 2x1: values 10, 200
    val g = PngCodec.decode(buildPng(2, 1, 0, Array[Byte](0, 10, 200.toByte))).get._3
    assert(g.toSeq == Seq[Byte](10, 10, 10, 200.toByte, 200.toByte, 200.toByte))
    // gray+alpha 1x1: value 77, alpha dropped
    val ga = PngCodec.decode(buildPng(1, 1, 4, Array[Byte](0, 77, 128.toByte))).get._3
    assert(ga.toSeq == Seq[Byte](77, 77, 77))
    // RGBA 1x1, alpha dropped
    val rgba = PngCodec.decode(buildPng(1, 1, 6, Array[Byte](0, 1, 2, 3, 99.toByte))).get._3
    assert(rgba.toSeq == Seq[Byte](1, 2, 3))
    // palette 2x1: indices 1, 0 into [red, green]
    val plte = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0)
    val pal = PngCodec.decode(buildPng(2, 1, 3, Array[Byte](0, 1, 0), Some(plte))).get._3
    assert(pal.toSeq == Seq[Byte](0, 255.toByte, 0, 255.toByte, 0, 0))
  }

  test("Adam7 interlaced images deinterlace to row-major pixels") {
    val w = 4; val h = 4
    // pixel (x,y) -> distinctive RGB triple
    def px(x: Int, y: Int): Seq[Int] = Seq(x * 40 + y, 100 + x, 200 - y)
    // pass grid per the PNG spec; emit each non-empty pass's scanlines
    // with filter 0
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                     (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val raw = new ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = (w - x0 + dx - 1) / dx
      val ph = (h - y0 + dy - 1) / dy
      if (pw > 0 && ph > 0) {
        for (py <- 0 until ph) {
          raw.write(0)
          for (pxi <- 0 until pw) px(x0 + pxi * dx, y0 + py * dy).foreach(raw.write)
        }
      }
    }
    val Some((dw, dh, rgb)) = PngCodec.decode(buildPng(w, h, 2, raw.toByteArray, interlace = 1))
    assert((dw, dh) == (w, h))
    val expected = (0 until h).flatMap(y => (0 until w).flatMap(x => px(x, y))).map(_.toByte)
    assert(rgb.toSeq == expected)
  }

  test("rejects non-png, truncated and 16-bit input") {
    assert(PngCodec.decode("nope".getBytes).isEmpty)
    val good = PngCodec.encode(3, 3, new Array[Byte](27))
    assert(PngCodec.decode(java.util.Arrays.copyOf(good, good.length - 20)).isEmpty)
    // depth 16 unsupported → None, not a crash
    val ihdr16 = buildPng(1, 1, 0, Array[Byte](0, 1, 1))
    ihdr16(24) = 16.toByte // depth byte inside IHDR (crc now wrong, but we don't verify crc)
    assert(PngCodec.decode(ihdr16).isEmpty)
    // crafted chunk length near Int.MaxValue must not overflow the bounds
    // check into an IndexOutOfBounds crash — contract is Option.None
    val crafted = PngCodec.encode(1, 1, new Array[Byte](3))
    crafted(8) = 0x7f.toByte; crafted(9) = 0xff.toByte
    crafted(10) = 0xff.toByte; crafted(11) = 0xf0.toByte
    assert(PngCodec.decode(crafted).isEmpty)
  }

  test("decodeImage picks the real PNG path end-to-end through Spark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pngmm")
    val rgb = Array.tabulate(4 * 2 * 3)(i => (i * 17 % 256).toByte)
    java.nio.file.Files.write(dir.resolve("img.png"), PngCodec.encode(4, 2, rgb))
    val df = Multimodal.readBinary(spark, s"file://$dir", "*.png")
    val row = Multimodal.withDecodedPixels(df)
      .select("img_format", "width", "height", "pixels_rgb")
      .as[(String, Int, Int, Array[Byte])].head()
    assert((row._1, row._2, row._3) == ("png", 4, 2))
    assert(row._4.toSeq == rgb.toSeq)
  }
}
