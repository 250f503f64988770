package graft.ops

import graft.inspect.HeaderParsers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque binary columns
  * with typed, executor-side metadata extraction.
  *
  * Ingestion is `binaryFile` (path, modificationTime, length, content) —
  * the binary payload stays distributed; nothing is collected to the
  * driver. Header-level metadata (dimensions, sample rate, duration) is
  * parsed with real pure-JVM parsers ([[graft.inspect.HeaderParsers]]).
  * Pixel decode is REAL for PNG (full zlib+unfilter codec,
  * [[PngCodec]]), 24/32-bit uncompressed BMP, binary PPM, and
  * JPEG/TIFF/GIF (the JDK's own `javax.imageio` codecs — standard
  * library, no added dependency) — all spec'd end-to-end. Bytes no
  * decoder handles yield NULL features (and zero frame rows): a
  * production output column never contains fabricated data. The
  * deterministic synthetic stub survives only behind the explicit
  * test-only `syntheticFallback` parameter.
  */
object Multimodal {

  /** Decode a 24/32-bit uncompressed BMP into row-major RGB bytes. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOff = bb.getInt(10)
    val width = bb.getInt(18)
    val heightRaw = bb.getInt(22)
    val bpp = bb.getShort(28).toInt
    val compression = bb.getInt(30)
    if (compression != 0 || (bpp != 24 && bpp != 32) || width <= 0 || heightRaw == 0) return None
    val height = math.abs(heightRaw)
    val topDown = heightRaw < 0
    val bytesPerPx = bpp / 8
    val rowStride = (width * bytesPerPx + 3) & ~3
    if (dataOff + rowStride.toLong * height > bytes.length) return None
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = dataOff + srcRow * rowStride
      var x = 0
      while (x < width) {
        val p = rowOff + x * bytesPerPx // stored BGR(A)
        val o = (y * width + x) * 3
        out(o) = bytes(p + 2); out(o + 1) = bytes(p + 1); out(o + 2) = bytes(p)
        x += 1
      }
      y += 1
    }
    Some((width, height, out))
  }

  /** Decode a binary PPM (P6, maxval <= 255) into row-major RGB bytes. */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 10 || bytes(0) != 'P' || bytes(1) != '6') return None
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    var pos = 2
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else go = false
      }
    }
    def int(): Int = {
      skipWsAndComments()
      var v = 0
      while (pos < bytes.length && bytes(pos).toChar.isDigit) { v = v * 10 + (bytes(pos) - '0'); pos += 1 }
      v
    }
    val (w, h, maxval) = (int(), int(), int())
    pos += 1 // single whitespace after maxval
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    if (pos + w.toLong * h * 3 > bytes.length) return None
    Some((w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3)))
  }

  /** Formats the JDK's bundled ImageIO codecs decode, identified by
    * magic so other byte streams never reach ImageIO.
    */
  private def imageIoFormat(b: Array[Byte]): Option[String] =
    if (b.length < 4) None
    else if (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) Some("jpeg")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
             (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) Some("tiff")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else None

  /** JPEG/TIFF/GIF decode through the JDK's bundled ImageIO codecs
    * (standard library — no added dependency).
    */
  def decodeViaImageIo(bytes: Array[Byte]): Option[(String, Int, Int, Array[Byte])] =
    imageIoFormat(bytes).flatMap { fmt =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val o = (y * w + x) * 3
            out(o) = ((rgb >> 16) & 0xff).toByte
            out(o + 1) = ((rgb >> 8) & 0xff).toByte
            out(o + 2) = (rgb & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Some((fmt, w, h, out))
      }
    }

  /** Real pixel decode where a JVM codec exists: (format, width,
    * height, row-major RGB bytes).
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Array[Byte])] =
    PngCodec.decode(bytes).map { case (w, h, px) => ("png", w, h, px) }
      .orElse(decodeBmp(bytes).map { case (w, h, px) => ("bmp", w, h, px) })
      .orElse(decodePpm(bytes).map { case (w, h, px) => ("ppm", w, h, px) })
      .orElse(decodeViaImageIo(bytes))

  /** Read a directory/glob of binary files as (path, length, content). */
  def readBinary(spark: SparkSession, url: String, globFilter: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", globFilter)
      .load(url)
      .select(col("path"), col("length"), col("content"))

  private val imageMetaUdf = udf { (content: Array[Byte]) =>
    if (content == null) None
    else
      HeaderParsers.pngDims(content).map { case (w, h) => ("png", w, h) }
        .orElse(HeaderParsers.jpegDims(content).map { case (w, h) => ("jpeg", w, h) })
        .orElse(decodeImage(content).map { case (f, w, h, _) => (f, w, h) })
  }

  /** Attach (format, width, height) parsed from image headers. */
  def withImageMeta(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("image_meta", imageMetaUdf(col(contentCol)))
      .withColumn("img_format", col("image_meta._1"))
      .withColumn("width", col("image_meta._2"))
      .withColumn("height", col("image_meta._3"))
      .drop("image_meta")

  private val wavMetaUdf = udf { (content: Array[Byte]) =>
    if (content == null) None
    else HeaderParsers.wavInfo(content).map { m =>
      (m("channels").asInstanceOf[Int], m("sample_rate").asInstanceOf[Int],
        m("duration_sec").asInstanceOf[Double])
    }
  }

  /** Attach (channels, sample_rate, duration_sec) parsed from WAV headers. */
  def withAudioMeta(df: DataFrame, contentCol: String = "content"): DataFrame =
    df.withColumn("audio_meta", wavMetaUdf(col(contentCol)))
      .withColumn("channels", col("audio_meta._1"))
      .withColumn("sample_rate", col("audio_meta._2"))
      .withColumn("duration_sec", col("audio_meta._3"))
      .drop("audio_meta")

  /** Decode WAV PCM samples: walks the RIFF chunks to fmt + data and
    * returns (sample_rate, channels, interleaved samples in [-1, 1]).
    * PCM 8/16/24/32-bit and IEEE float32 (format 3) supported — the
    * real audio-decode counterpart of the image codecs above.
    */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 44 || new String(bytes, 0, 4, "ISO-8859-1") != "RIFF" ||
        new String(bytes, 8, 4, "ISO-8859-1") != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var fmt = 0; var channels = 0; var rate = 0; var bits = 0
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "ISO-8859-1")
      val len = bb.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      id match {
        case "fmt " =>
          fmt = bb.getShort(pos + 8) & 0xffff
          channels = bb.getShort(pos + 10) & 0xffff
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
        case "data" => data = Some((pos + 8, len))
        case _      => ()
      }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    data.flatMap { case (off, len) =>
      if (channels <= 0 || rate <= 0) None
      else (fmt, bits) match {
        case (1, 8) => Some((rate, channels,
          Array.tabulate(len)(i => ((bytes(off + i) & 0xff) - 128) / 128.0)))
        case (1, 16) => Some((rate, channels,
          Array.tabulate(len / 2)(i => bb.getShort(off + i * 2) / 32768.0)))
        case (1, 24) => Some((rate, channels,
          Array.tabulate(len / 3) { i =>
            val p = off + i * 3
            val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) << 16)
            v / 8388608.0
          }))
        case (1, 32) => Some((rate, channels,
          Array.tabulate(len / 4)(i => bb.getInt(off + i * 4) / 2147483648.0)))
        case (3, 32) => Some((rate, channels,
          Array.tabulate(len / 4)(i => bb.getFloat(off + i * 4).toDouble)))
        case _ => None
      }
    }
  }

  /** Per-window RMS energy of decoded samples — a fixed-size feature
    * vector, the audio counterpart of [[poolFeatures]].
    */
  def rmsFeatures(samples: Array[Double], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (samples.isEmpty) return out
    var w = 0
    while (w < dim) {
      val lo = (samples.length.toLong * w / dim).toInt
      val hi = math.max(lo + 1, (samples.length.toLong * (w + 1) / dim).toInt)
      var acc = 0.0
      var i = lo
      while (i < hi) { acc += samples(i) * samples(i); i += 1 }
      out(w) = math.sqrt(acc / (hi - lo)).toFloat
      w += 1
    }
    out
  }

  /** Decode audio content into (sample_rate, channels, n_samples,
    * audio_features) columns; nulls where the bytes aren't decodable WAV.
    */
  def audioFeatures(df: DataFrame, dim: Int = 32, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte], d: Int) =>
      if (content == null) None
      else decodeWavSamples(content).map { case (rate, ch, samples) =>
        (rate, ch, samples.length.toLong / math.max(1, ch), rmsFeatures(samples, d))
      }
    }
    df.withColumn("_au", u(col(contentCol), lit(dim)))
      .withColumn("sample_rate", col("_au._1"))
      .withColumn("channels", col("_au._2"))
      .withColumn("n_samples", col("_au._3"))
      .withColumn("audio_features", col("_au._4"))
      .drop("_au")
  }

  /** Grayscale average-pool of decoded pixels into a fixed-size vector:
    * the image is divided into `dim` horizontal strips of rows, each
    * strip's mean luminance (0..1) is one feature. Real math over real
    * pixels — deterministic and codec-free.
    */
  def poolFeatures(w: Int, h: Int, rgb: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val counts = new Array[Int](dim)
    var y = 0
    while (y < h) {
      val strip = math.min(dim - 1, y * dim / h)
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        val lum = (0.299 * (rgb(o) & 0xff) + 0.587 * (rgb(o + 1) & 0xff) + 0.114 * (rgb(o + 2) & 0xff)) / 255.0
        out(strip) += lum.toFloat
        counts(strip) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
    out
  }

  /** Slice one frame's bytes out of the container per its index entry;
    * None when the extent is outside the buffer (corrupt index).
    */
  private def frameBytes(content: Array[Byte], f: VideoContainer.Frame): Option[Array[Byte]] =
    // overflow-safe form: `offset + size <= length` wraps negative for a
    // corrupt co64 offset near Long.MaxValue and would pass the naive
    // check, crashing copyOfRange inside an executor UDF
    if (f.offset >= 0 && f.size > 0 && f.size <= content.length && f.offset <= content.length - f.size)
      Some(java.util.Arrays.copyOfRange(content, f.offset.toInt, (f.offset + f.size).toInt))
    else None

  /** Decode one video frame to pooled features: MJPEG frames (the
    * dominant intra-only AVI codec, and what the reference's imageio
    * engine handles without ffmpeg — `readers.py:3644` ImageIOVideo) are
    * plain JPEG bitstreams, so the existing image decode applies
    * directly. Inter-coded codecs (H.264 etc.) return None — out of
    * scope without a codec library, stated rather than faked.
    */
  private def decodeFrameFeatures(content: Array[Byte], f: VideoContainer.Frame, dim: Int): Option[Array[Float]] =
    frameBytes(content, f).flatMap(decodeImage(_)).map { case (_, w, h, rgb) => poolFeatures(w, h, rgb, dim) }

  /** Deterministic placeholder features — TEST-ONLY shape exerciser for
    * codecs with no JVM decoder, reachable only via the explicit
    * `syntheticFallback = true` parameter. Production paths NEVER emit
    * these: fabricated vectors in a features column silently poison any
    * downstream similarity computation, where a null is filterable. The
    * reference has the same contract — PIL raises on undecodable bytes
    * (reference intake/readers.py:2228); it never invents pixels.
    */
  private def syntheticFeatures(content: Array[Byte], salt: Int, dim: Int): Array[Float] = {
    val seed = java.util.Arrays.hashCode(content).toLong * 31 + salt
    val rnd = new scala.util.Random(seed)
    Array.fill(dim)(rnd.nextFloat())
  }

  /** Pixel decode → features. PNG/BMP/PPM run the REAL native decode +
    * pooling, as do JPEG/TIFF/GIF via ImageIO; video containers decode
    * their FIRST frame for real when the codec is intra-only JPEG
    * (MJPEG). Bytes no decoder handles yield null (matching
    * [[decodeFrameFeatures]]) unless the test-only synthetic fallback is
    * explicitly requested.
    */
  private def decodeUdf(syntheticFallback: Boolean) = udf { (content: Array[Byte], dim: Int) =>
    if (content == null) null
    else decodeImage(content) match {
      case Some((_, w, h, rgb)) => poolFeatures(w, h, rgb, dim)
      case None =>
        VideoContainer.parse(content)
          .flatMap(vi => vi.frames.headOption.flatMap(decodeFrameFeatures(content, _, dim)))
          .getOrElse(if (syntheticFallback) syntheticFeatures(content, 0, dim) else null)
    }
  }

  /** Decoded pixel access for the codec'd formats: adds (img_format,
    * width, height, pixels_rgb) columns; null for formats without a
    * native decoder.
    */
  def withDecodedPixels(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte]) =>
      if (content == null) None else decodeImage(content)
    }
    df.withColumn("_dec", u(col(contentCol)))
      .withColumn("img_format", col("_dec._1"))
      .withColumn("width", col("_dec._2"))
      .withColumn("height", col("_dec._3"))
      .withColumn("pixels_rgb", col("_dec._4"))
      .drop("_dec")
  }

  /** Decode + feature-extract images into fixed-size float vectors.
    * Output schema matches the embeddings table (`array<float>`), so
    * downstream similarity ops compose directly. Undecodable bytes get
    * null features — filter with `features IS NOT NULL` before
    * similarity. `syntheticFallback` (test-only) substitutes the
    * deterministic placeholder to exercise pipeline shape for absent
    * codecs.
    */
  def imageFeatures(df: DataFrame, dim: Int = 64, contentCol: String = "content",
      syntheticFallback: Boolean = false): DataFrame =
    df.withColumn("features", decodeUdf(syntheticFallback)(col(contentCol), lit(dim)))

  /** Video container metadata columns from the real MP4/AVI index walk
    * ([[VideoContainer]]): (video_format, width, height, n_frames,
    * duration_sec); nulls for non-video bytes. The video sibling of
    * [[withImageMeta]].
    */
  def withVideoMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte]) =>
      if (content == null) None
      else VideoContainer.parse(content).map(vi =>
        (vi.format, vi.width, vi.height, vi.nFrames, vi.durationSec))
    }
    df.withColumn("_vm", u(col(contentCol)))
      .withColumn("video_format", col("_vm._1"))
      .withColumn("width", col("_vm._2"))
      .withColumn("height", col("_vm._3"))
      .withColumn("n_frames", col("_vm._4"))
      .withColumn("duration_sec", col("_vm._5"))
      .drop("_vm")
  }

  /** Frame sampling: emit up to `n` (frame_index, frame_time_sec,
    * features) rows per video binary. For real containers (MP4/AVI via
    * [[VideoContainer]]) the frames are evenly spaced over the REAL
    * frame index, each frame's bytes are sliced out of the container by
    * its sample-table extent, and MJPEG frames decode to real pooled
    * pixel features (see [[decodeFrameFeatures]]); `features` is null
    * for frames whose codec we can't decode. Bytes that are not a
    * parseable container have no frames and emit ZERO rows — same
    * contract as the null features, one level up. `syntheticFallback`
    * (test-only) restores the n-replicate placeholder explode to
    * exercise row-multiplicity plumbing.
    */
  def sampleFrames(df: DataFrame, n: Int, dim: Int = 64, contentCol: String = "content",
      syntheticFallback: Boolean = false): DataFrame = {
    val u = udf { (content: Array[Byte], nn: Int, d: Int) =>
      if (content == null) Seq.empty[(Int, Double, Array[Float])]
      else VideoContainer.parse(content) match {
        case Some(vi) if vi.frames.nonEmpty =>
          val total = vi.frames.length
          val count = math.min(nn, total)
          val starts = vi.frames.scanLeft(0.0)(_ + _.dtSec)
          (0 until count).map { j =>
            val i = (j.toLong * total / count).toInt
            (i, starts(i), decodeFrameFeatures(content, vi.frames(i), d).orNull)
          }
        case _ =>
          if (syntheticFallback) (0 until nn).map(i => (i, 0.0, syntheticFeatures(content, i, d)))
          else Seq.empty[(Int, Double, Array[Float])]
      }
    }
    df.withColumn("_fr", explode(u(col(contentCol), lit(n), lit(dim))))
      .withColumn("frame_index", col("_fr._1"))
      .withColumn("frame_time_sec", col("_fr._2"))
      .withColumn("features", col("_fr._3"))
      .drop("_fr")
  }
}
