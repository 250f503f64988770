package graft.output

import graft.SparkSpec
import graft.inspect.HeaderParsers
import graft.ops.{Multimodal, PngCodec}
import java.nio.file.{Files, Paths}

class MediaWritersSpec extends SparkSpec {
  import spark.implicits._

  test("pngImages writes one decodable PNG per row") {
    val dir = Files.createTempDirectory("pngsink")
    val imgs = Seq(
      ("a", 2, 2, Array.tabulate(12)(i => (i * 11 % 256).toByte)),
      ("b", 3, 1, Array.tabulate(9)(i => (255 - i).toByte)))
    val df = imgs.toDF("name", "width", "height", "pixels_rgb")
    val ref = MediaWriters.pngImages(df, s"file://$dir")
    assert(ref.kind == "png")

    // read back through the binaryFile scan + the real decode path
    val back = Multimodal.withDecodedPixels(Multimodal.readBinary(spark, s"file://$dir", "*.png"))
      .select("path", "width", "height", "pixels_rgb")
      .as[(String, Int, Int, Array[Byte])].collect()
      .map { case (p, w, h, px) => (p.split('/').last, w, h, px.toSeq) }.sortBy(_._1)
    assert(back.map(r => (r._1, r._2, r._3)).toSeq == Seq(("a.png", 2, 2), ("b.png", 3, 1)))
    assert(back(0)._4 == imgs(0)._4.toSeq && back(1)._4 == imgs(1)._4.toSeq)
  }

  test("wavAudio writes PCM-16 WAVs with correct header and samples") {
    val dir = Files.createTempDirectory("wavsink")
    val samples = (0 until 800).map(i => math.sin(2 * math.Pi * i / 80.0))
    val df = Seq(("tone", samples)).toDF("name", "samples")
    val ref = MediaWriters.wavAudio(df, s"file://$dir", sampleRate = 8000)
    assert(ref.options("sample_rate") == "8000")

    val bytes = Files.readAllBytes(Paths.get(s"$dir/tone.wav"))
    val info = HeaderParsers.wavInfo(bytes).get
    assert(info("sample_rate") == 8000 && info("channels") == 1)
    assert(math.abs(info("duration_sec").asInstanceOf[Double] - 0.1) < 1e-9)
    // spot-check sample payload round-trips at 16-bit precision
    val bb = java.nio.ByteBuffer.wrap(bytes, 44, 1600).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val decoded = (0 until 800).map(_ => bb.getShort / 32767.0)
    val maxErr = decoded.zip(samples).map { case (d, s) => math.abs(d - s) }.max
    assert(maxErr < 1.0 / 32000)
  }

  test("WAV sample decode round-trips the sink and feeds RMS features") {
    val dir = Files.createTempDirectory("wavrt")
    // 0.25-amplitude sine then silence: first-half RMS ~0.177, second ~0
    val n = 8000
    val samples = (0 until n).map(i => if (i < n / 2) 0.25 * math.sin(2 * math.Pi * i / 50.0) else 0.0)
    MediaWriters.wavAudio(Seq(("t", samples)).toDF("name", "samples"), s"file://$dir", sampleRate = 8000)

    val bytes = Files.readAllBytes(Paths.get(s"$dir/t.wav"))
    val Some((rate, ch, decoded)) = Multimodal.decodeWavSamples(bytes)
    assert(rate == 8000 && ch == 1 && decoded.length == n)
    val maxErr = decoded.zip(samples).map { case (d, s) => math.abs(d - s) }.max
    assert(maxErr < 1.0 / 16000)

    val feats = Multimodal.audioFeatures(
      Multimodal.readBinary(spark, s"file://$dir", "*.wav"), dim = 2)
    val row = feats.select("sample_rate", "channels", "n_samples", "audio_features").head()
    assert(row.getInt(0) == 8000 && row.getInt(1) == 1 && row.getLong(2) == n)
    val f = row.getAs[scala.collection.Seq[Float]](3)
    assert(math.abs(f(0) - 0.25 / math.sqrt(2)) < 0.01 && f(1) < 0.01)
  }

  test("float32 and 8-bit WAV variants decode") {
    def wav(fmt: Int, bits: Int, payload: Array[Byte], rate: Int = 4000): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + payload.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + payload.length).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
        .putInt(rate).putInt(rate * bits / 8).putShort((bits / 8).toShort).putShort(bits.toShort)
      bb.put("data".getBytes).putInt(payload.length).put(payload)
      bb.array()
    }
    val f32 = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(0.5f).putFloat(-0.25f).array()
    val Some((_, _, a)) = Multimodal.decodeWavSamples(wav(3, 32, f32))
    assert(a.toSeq == Seq(0.5, -0.25))
    val Some((_, _, b)) = Multimodal.decodeWavSamples(wav(1, 8, Array[Byte](128.toByte, 0, 255.toByte)))
    assert(b(0) == 0.0 && b(1) == -1.0 && math.abs(b(2) - 0.9921875) < 1e-9)
    assert(Multimodal.decodeWavSamples("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("encodeWav validates interleaving and clamps out-of-range samples") {
    intercept[IllegalArgumentException](MediaWriters.encodeWav(new Array[Double](3), 8000, channels = 2))
    val wav = MediaWriters.encodeWav(Array(2.0, -2.0), 8000)
    val bb = java.nio.ByteBuffer.wrap(wav, 44, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getShort == 32767 && bb.getShort == -32767)
  }

  test("jpegImages writes JDK-codec JPEGs that the decode path reads back") {
    val dir = Files.createTempDirectory("jpgsink")
    // flat mid-gray compresses near-losslessly, so tolerance stays tight
    val rgb = Array.fill(8 * 8 * 3)(128.toByte)
    val ref = MediaWriters.jpegImages(
      Seq(("g", 8, 8, rgb)).toDF("name", "width", "height", "pixels_rgb"), s"file://$dir")
    assert(ref.kind == "jpeg")
    val bytes = Files.readAllBytes(Paths.get(s"$dir/g.jpg"))
    assert(bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) // SOI magic
    val Some(("jpeg", w, h, px)) = Multimodal.decodeImage(bytes)
    assert((w, h) == (8, 8))
    val maxErr = px.zip(rgb).map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 2) // lossy, but flat gray stays within 2/255

    // end-to-end: executor-side decode feeds real pooled features
    val feats = Multimodal.imageFeatures(
      Multimodal.readBinary(spark, s"file://$dir", "*.jpg"), dim = 2)
      .select("features").as[Seq[Float]].head()
    assert(feats.length == 2)
    feats.foreach(f => assert(math.abs(f - 128f / 255f) < 0.02f))
  }

  test("TIFF and GIF decode through the JDK ImageIO path") {
    def encodeWith(fmt: String, w: Int, h: Int, rgbFn: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbFn(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    // TIFF is lossless: exact pixel round-trip
    val tiff = encodeWith("tiff", 3, 2, (x, y) => (x * 50) << 16 | (y * 90) << 8 | 17)
    val Some(("tiff", tw, th, tpx)) = Multimodal.decodeImage(tiff)
    assert((tw, th) == (3, 2))
    assert(tpx.slice(0, 3).toSeq == Seq[Byte](0, 0, 17))
    assert(tpx.slice((2 + 1 * 3) * 3, (2 + 1 * 3) * 3 + 3).toSeq == Seq[Byte](100, 90, 17))
    // GIF palettizes: two flat colors survive exactly
    val gif = encodeWith("gif", 2, 1, (x, _) => if (x == 0) 0xff0000 else 0x0000ff)
    val Some(("gif", gw, gh, gpx)) = Multimodal.decodeImage(gif)
    assert((gw, gh) == (2, 1))
    assert(gpx.toSeq == Seq[Byte](255.toByte, 0, 0, 0, 0, 255.toByte))
  }

  test("pngImages round-trips through PngCodec directly") {
    val dir = Files.createTempDirectory("pngsink2")
    val rgb = Array.tabulate(27)(i => (i * 7 % 256).toByte)
    MediaWriters.pngImages(Seq(("x", 3, 3, rgb)).toDF("name", "width", "height", "pixels_rgb"), s"file://$dir")
    val Some((w, h, px)) = PngCodec.decode(Files.readAllBytes(Paths.get(s"$dir/x.png")))
    assert((w, h) == (3, 3) && px.toSeq == rgb.toSeq)
  }
}
