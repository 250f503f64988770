package graft.output

import graft.datatypes.DataRef
import graft.ops.PngCodec
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media sinks (reference intake/readers/output.py:117-432 NumpyToPNG /
  * NumpyToWAV, there via PIL and scipy): one media file per row, written
  * executor-side through the Hadoop filesystem — the driver never sees
  * pixel or sample data, so output scales with the cluster like every
  * other sink here. Each returns a [[DataRef]] descriptor over the
  * output directory, re-entering the catalog per the output convention.
  */
object MediaWriters {

  /** Encode mono/stereo PCM-16 WAV from samples in [-1, 1] (reference
    * output.py NumpyToWAV, there via scipy.io.wavfile). Interleaved
    * input when channels > 1.
    */
  def encodeWav(samples: Array[Double], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "samples must interleave evenly")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataLen).put("WAVE".getBytes("ISO-8859-1"))
    bb.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    bb.put("data".getBytes("ISO-8859-1")).putInt(dataLen)
    samples.foreach { s =>
      val clamped = math.max(-1.0, math.min(1.0, s))
      bb.putShort(math.round(clamped * 32767.0).toShort)
    }
    bb.array()
  }

  /** Write one 8-bit RGB PNG per row: (`nameCol`, `widthCol`,
    * `heightCol`, `pixelsCol` row-major RGB) — the inverse of
    * [[graft.ops.Multimodal.withDecodedPixels]].
    */
  def pngImages(
      df: DataFrame,
      url: String,
      nameCol: String = "name",
      widthCol: String = "width",
      heightCol: String = "height",
      pixelsCol: String = "pixels_rgb"
  ): DataRef = {
    val base = url.stripSuffix("/")
    val sconf = graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string"), col(widthCol).cast("int"), col(heightCol).cast("int"), col(pixelsCol))
      .rdd.foreachPartition { it =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        it.foreach { r =>
          val png = PngCodec.encode(r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))
          val out = fs.create(new Path(s"$base/${r.getString(0)}.png"), true)
          try out.write(png) finally out.close()
        }
      }
    DataRef("png", base)
  }

  /** Minimal baseline TIFF (little-endian, one uncompressed RGB strip):
    * II42 header + a 9-tag IFD (width/length/bits 8,8,8/compression 1/
    * photometric RGB/strip offset/samples 3/rows-per-strip/byte count) —
    * the smallest layout every baseline reader (incl. the JDK ImageIO
    * codec the repo's own decode path uses) accepts. Reference
    * output.py:298 NumpyToTIFF / :358 PILImageToTIFF, there via PIL.
    */
  def encodeTiff(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
    val nTags = 9
    val ifdStart = 8
    val bitsAt = ifdStart + 2 + nTags * 12 + 4 // after entry count + entries + next-IFD
    val dataAt = bitsAt + 6
    val bb = java.nio.ByteBuffer.allocate(dataAt + rgb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdStart)
    bb.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit =
      bb.putShort(id.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    // SHORT values sit in the low bytes of the 4-byte value slot (LE)
    tag(256, 4, 1, w)            // ImageWidth LONG
    tag(257, 4, 1, h)            // ImageLength LONG
    tag(258, 3, 3, bitsAt)       // BitsPerSample SHORT[3] -> offset
    tag(259, 3, 1, 1)            // Compression: none
    tag(262, 3, 1, 2)            // Photometric: RGB
    tag(273, 4, 1, dataAt)       // StripOffsets
    tag(277, 3, 1, 3)            // SamplesPerPixel
    tag(278, 4, 1, h)            // RowsPerStrip: one strip
    tag(279, 4, 1, rgb.length)   // StripByteCounts
    bb.putInt(0)                 // next IFD: none
    bb.putShort(8).putShort(8).putShort(8)
    bb.put(rgb)
    bb.array()
  }

  /** Write one baseline TIFF per row — same row shape as [[pngImages]]. */
  def tiffImages(
      df: DataFrame,
      url: String,
      nameCol: String = "name",
      widthCol: String = "width",
      heightCol: String = "height",
      pixelsCol: String = "pixels_rgb"
  ): DataRef = {
    val base = url.stripSuffix("/")
    val sconf = graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string"), col(widthCol).cast("int"), col(heightCol).cast("int"), col(pixelsCol))
      .rdd.foreachPartition { it =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        it.foreach { r =>
          val tif = encodeTiff(r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))
          val out = fs.create(new Path(s"$base/${r.getString(0)}.tiff"), true)
          try out.write(tif) finally out.close()
        }
      }
    DataRef("tiff", base)
  }

  /** Write one JPEG per row via the JDK's bundled ImageIO codec
    * (reference output.py:342 PILImageToJPEG). Same row shape as
    * [[pngImages]]; `quality` in (0, 1].
    */
  def jpegImages(
      df: DataFrame,
      url: String,
      quality: Float = 0.9f,
      nameCol: String = "name",
      widthCol: String = "width",
      heightCol: String = "height",
      pixelsCol: String = "pixels_rgb"
  ): DataRef = {
    val base = url.stripSuffix("/")
    val q = quality
    val sconf = graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string"), col(widthCol).cast("int"), col(heightCol).cast("int"), col(pixelsCol))
      .rdd.foreachPartition { it =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(q)
        it.foreach { r =>
          val (w, h, rgb) = (r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var i = 0
          while (i < w * h) {
            img.setRGB(i % w, i / w,
              ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff))
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
          ios.close()
          val out = fs.create(new Path(s"$base/${r.getString(0)}.jpg"), true)
          try out.write(bos.toByteArray) finally out.close()
        }
        writer.dispose()
      }
    DataRef("jpeg", base, Map("quality" -> quality.toString))
  }

  /** Write one PCM-16 WAV per row: (`nameCol`, `samplesCol` of doubles
    * in [-1, 1], interleaved when channels > 1).
    */
  def wavAudio(
      df: DataFrame,
      url: String,
      sampleRate: Int,
      channels: Int = 1,
      nameCol: String = "name",
      samplesCol: String = "samples"
  ): DataRef = {
    val base = url.stripSuffix("/")
    val sconf = graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string"), col(samplesCol))
      .rdd.foreachPartition { it =>
        val fs = FileSystem.get(new URI(base).resolve("/"), sconf.value)
        it.foreach { r =>
          val samples = r.getSeq[Double](1).toArray
          val wav = encodeWav(samples, sampleRate, channels)
          val out = fs.create(new Path(s"$base/${r.getString(0)}.wav"), true)
          try out.write(wav) finally out.close()
        }
      }
    DataRef("wav", base, Map("sample_rate" -> sampleRate.toString, "channels" -> channels.toString))
  }
}
