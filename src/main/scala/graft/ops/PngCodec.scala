package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, DataFormatException, Deflater, Inflater}

/** Pure-JVM PNG codec (published PNG spec; zlib via `java.util.zip`).
  *
  * Decode covers the common still-image profile: 8-bit depth, color
  * types gray / gray+alpha / palette / RGB / RGBA, both interlace
  * modes (none and Adam7 seven-pass), all five scanline filters
  * including Paeth. Output is row-major RGB, same contract as the
  * BMP/PPM decoders in [[Multimodal]]. Encode writes 8-bit RGB (color
  * type 2), filter 0, one deflated IDAT — the mirror the PNG sink in
  * [[graft.output.MediaWriters]] uses (reference
  * intake/readers/output.py:117 NumpyToPNG, there via PIL).
  */
object PngCodec {

  private val Sig: Array[Byte] =
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, '\r'.toInt, '\n'.toInt, 0x1a, '\n'.toInt).map(_.toByte)

  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 45) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
    def be32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)

    var pos = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && pos + 12 <= bytes.length) {
      val len = be32(pos)
      // bound computed in Long: a crafted len near Int.MaxValue overflows
      // pos + 12 + len in Int, sneaking past the check and crashing below
      if (len < 0 || pos.toLong + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "ISO-8859-1")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(pos + 8); h = be32(pos + 12)
          depth = bytes(pos + 16) & 0xff; colorType = bytes(pos + 17) & 0xff
          interlace = bytes(pos + 20) & 0xff
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (w <= 0 || h <= 0 || depth != 8 || interlace > 1) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && palette == null) return None
    if (w.toLong * h * channels > Int.MaxValue - 64) return None

    // Adam7 pass grid: (xStart, yStart, xStep, yStep); interlace 0 is a
    // single full pass
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
               (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = p match {
      case (x0, y0, dx, dy) => ((w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
    }
    val rawSize = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0 else ph * (1 + pw * channels)
    }.sum

    // one inflate of the concatenated IDAT payload
    val stride = w * channels
    val raw = new Array[Byte](rawSize)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: DataFormatException => return None }
    finally inf.end()
    if (off != raw.length) return None

    // unfilter one pass's scanlines (filters reference the RECONSTRUCTED
    // previous bytes, so each line runs sequentially)
    val bpp = channels
    def unfilter(from: Int, pw: Int, ph: Int): Option[Array[Byte]] = {
      val pStride = pw * bpp
      val out = new Array[Byte](ph * pStride)
      var y = 0
      while (y < ph) {
        val filter = raw(from + y * (1 + pStride)) & 0xff
        val src = from + y * (1 + pStride) + 1
        val dst = y * pStride
        var x = 0
        while (x < pStride) {
          val rw = raw(src + x) & 0xff
          val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
          val b = if (y > 0) out(dst - pStride + x) & 0xff else 0
          val c = if (x >= bpp && y > 0) out(dst - pStride + x - bpp) & 0xff else 0
          val v = filter match {
            case 0 => rw
            case 1 => rw + a
            case 2 => rw + b
            case 3 => rw + (a + b) / 2
            case 4 =>
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              rw + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          out(dst + x) = v.toByte
          x += 1
        }
        y += 1
      }
      Some(out)
    }

    val img = new Array[Byte](h * stride)
    var passOff = 0
    passes.foreach { case p @ (x0, y0, dx, dy) =>
      val (pw, ph) = passDims(p)
      if (pw > 0 && ph > 0) {
        val dec = unfilter(passOff, pw, ph) match {
          case Some(d) => d
          case None => return None
        }
        // scatter the pass's pixels to their interleaved positions
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            System.arraycopy(dec, (py * pw + px) * bpp, img, ((y0 + py * dy) * w + (x0 + px * dx)) * bpp, bpp)
            px += 1
          }
          py += 1
        }
        passOff += ph * (1 + pw * bpp)
      }
    }

    // normalize to row-major RGB
    val rgb = new Array[Byte](w * h * 3)
    var px = 0
    val n = w * h
    while (px < n) {
      val s = px * channels
      val o = px * 3
      colorType match {
        case 0 => val g = img(s); rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        case 4 => val g = img(s); rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g // alpha dropped
        case 2 => rgb(o) = img(s); rgb(o + 1) = img(s + 1); rgb(o + 2) = img(s + 2)
        case 6 => rgb(o) = img(s); rgb(o + 1) = img(s + 1); rgb(o + 2) = img(s + 2)
        case 3 =>
          val idx = (img(s) & 0xff) * 3
          if (idx + 2 >= palette.length) return None
          rgb(o) = palette(idx); rgb(o + 1) = palette(idx + 1); rgb(o + 2) = palette(idx + 2)
      }
      px += 1
    }
    Some((w, h, rgb))
  }

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val typBytes = typ.getBytes("ISO-8859-1")
    out.write(be32(data.length))
    out.write(typBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(typBytes); crc.update(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** Encode row-major RGB as an 8-bit truecolor PNG (filter 0). */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"expected ${w * h * 3} rgb bytes, got ${rgb.length}")
    val out = new ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = new ByteArrayOutputStream()
    Seq(w, h).foreach { v =>
      ihdr.write((v >> 24) & 0xff); ihdr.write((v >> 16) & 0xff); ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff)
    }
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0) // depth, RGB, deflate, adaptive, no interlace
    chunk(out, "IHDR", ihdr.toByteArray)

    val stride = w * 3
    val filtered = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      filtered(y * (1 + stride)) = 0
      System.arraycopy(rgb, y * stride, filtered, y * (1 + stride) + 1, stride)
      y += 1
    }
    val d = new Deflater()
    d.setInput(filtered); d.finish()
    val z = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    chunk(out, "IDAT", z.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

}
