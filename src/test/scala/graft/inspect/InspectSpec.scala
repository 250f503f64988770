package graft.inspect

import graft.SparkSpec
import graft.ops.Multimodal
import java.nio.{ByteBuffer, ByteOrder}

class InspectSpec extends SparkSpec {

  test("inspectDataset summarises a parquet file without full read") {
    val r = Inspect.inspectDataset(spark, "file:///root/testdata/sf0.001/lineitem.parquet")
    assert(r.kind == "parquet")
    assert(r.reader == "spark_parquet")
    assert(r.columns.contains("l_orderkey"))
    assert(r.nFiles == 1 && r.totalBytes > 0)
    assert(r.sampleRows == 10)
  }

  test("repr renders schema tree and sample rows") {
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val r = Inspect.repr(df, 3)
    assert(r("schema").contains("r_regionkey"))
    assert(r("sample").contains("r_name"))
    assert(r("is_streaming") == "false")
  }

  test("GGUF header parser reads version, counts and metadata KVs") {
    // hand-built minimal GGUF: magic, v3, 0 tensors, 2 KVs
    val buf = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GGUF".getBytes("ISO-8859-1")).putInt(3).putLong(0L).putLong(2L)
    def putStr(s: String): Unit = { buf.putLong(s.length.toLong); buf.put(s.getBytes("UTF-8")) }
    putStr("general.name"); buf.putInt(8); putStr("tiny")
    putStr("general.layers"); buf.putInt(4); buf.putInt(12)
    val m = HeaderParsers.gguf(buf.array())
    assert(m("version") == 3)
    assert(m("tensor_count") == 0L)
    assert(m("general.name") == "tiny")
    assert(m("general.layers") == 12L)
  }

  test("PMTiles v3 header parser") {
    val b = new Array[Byte](127)
    System.arraycopy("PMTiles".getBytes("ISO-8859-1"), 0, b, 0, 7)
    b(7) = 3
    val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(8, 127L)  // root dir offset
    buf.putLong(72, 42L)  // n addressed tiles
    b(100) = 0; b(101) = 14
    val m = HeaderParsers.pmtiles(b)
    assert(m("version") == 3)
    assert(m("root_dir_offset") == 127L)
    assert(m("n_addressed_tiles") == 42L)
    assert(m("max_zoom") == 14)
  }

  test("SafeTensors header: tensor count, params, dtypes, metadata") {
    val json =
      """{"__metadata__":{"format":"pt"},
        |"embed.weight":{"dtype":"F32","shape":[4,8],"data_offsets":[0,128]},
        |"head.bias":{"dtype":"F16","shape":[8],"data_offsets":[128,144]}}""".stripMargin
    val jb = json.getBytes("UTF-8")
    val buf = ByteBuffer.allocate(8 + jb.length + 144).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(jb.length.toLong).put(jb)
    val m = HeaderParsers.safetensors(buf.array())
    assert(m("tensor_count") == 2)
    assert(m("total_params") == 40L) // 4*8 + 8
    assert(m("dtypes").asInstanceOf[Map[String, Int]] == Map("F32" -> 1, "F16" -> 1))
    assert(m("metadata").asInstanceOf[Map[String, String]] == Map("format" -> "pt"))
  }

  test("Torch archive listing: entries, pickle flag, storage bytes") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, payload: Array[Byte]): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name)); zos.write(payload); zos.closeEntry()
    }
    entry("archive/data.pkl", Array.fill(10)(0x1.toByte))
    entry("archive/data/0", Array.fill(64)(0x2.toByte))
    entry("archive/data/1", Array.fill(32)(0x3.toByte))
    entry("archive/version", "3\n".getBytes)
    zos.close()
    val m = HeaderParsers.torchZip(bos.toByteArray)
    assert(m("entry_count") == 4)
    assert(m("has_pickle") == true)
    assert(m("storage_bytes") == 96L)
  }

  test("OSM PBF: header features + data block count via native protobuf walk") {
    def varint(v: Long): Array[Byte] = {
      var x = v; val out = scala.collection.mutable.ArrayBuffer[Byte]()
      do { val b = (x & 0x7f).toInt; x >>>= 7; out += (if (x != 0) (b | 0x80) else b).toByte } while (x != 0)
      out.toArray
    }
    def bytesField(f: Int, b: Array[Byte]): Array[Byte] =
      varint((f << 3) | 2) ++ varint(b.length.toLong) ++ b
    def strField(f: Int, s: String): Array[Byte] = bytesField(f, s.getBytes("UTF-8"))
    // HeaderBlock { 4: required_features, 16: writingprogram }
    val headerBlock = strField(4, "OsmSchema-V0.6") ++ strField(4, "DenseNodes") ++ strField(16, "graft-test")
    // Blob { 1: raw }
    val blob = bytesField(1, headerBlock)
    // BlobHeader { 1: type, 3: datasize }
    val bh = strField(1, "OSMHeader") ++ varint((3 << 3) | 0) ++ varint(blob.length.toLong)
    val dataBlob = strField(1, "")
    val dataBh = strField(1, "OSMData") ++ varint((3 << 3) | 0) ++ varint(dataBlob.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(bh.length); dos.write(bh); dos.write(blob)
    dos.writeInt(dataBh.length); dos.write(dataBh); dos.write(dataBlob)
    val m = HeaderParsers.osmpbf(out.toByteArray)
    assert(m("header_seen") == true)
    assert(m("required_features") == Seq("OsmSchema-V0.6", "DenseNodes"))
    assert(m("writing_program") == "graft-test")
    assert(m("data_blocks") == 1)
  }

  test("PNG and JPEG dimension parsers") {
    val png = ByteBuffer.allocate(32)
    png.put(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0d, 0x0a, 0x1a, 0x0a))
    png.putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
    assert(HeaderParsers.pngDims(png.array()).contains((640, 480)))
    assert(HeaderParsers.pngDims("notapng".getBytes).isEmpty)

    // minimal JPEG: SOI + SOF0 frame (h=100, w=200)
    val jpeg = ByteBuffer.allocate(32)
    jpeg.put(Array(0xff.toByte, 0xd8.toByte))
    jpeg.put(Array(0xff.toByte, 0xc0.toByte)).putShort(11).put(8.toByte)
      .putShort(100).putShort(200).put(3.toByte)
    assert(HeaderParsers.jpegDims(jpeg.array()).contains((200, 100)))
  }

  test("WAV info parser computes rate, channels, duration") {
    val buf = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(2)        // PCM, stereo
    buf.putInt(44100); buf.putInt(44100 * 4) // rate, byte rate
    buf.putShort(4); buf.putShort(16)       // block align, bits
    buf.put("data".getBytes); buf.putInt(44100 * 4 * 2) // 2 seconds
    val m = HeaderParsers.wavInfo(buf.array()).get
    assert(m("channels") == 2)
    assert(m("sample_rate") == 44100)
    assert(math.abs(m("duration_sec").asInstanceOf[Double] - 2.0) < 1e-9)
  }

  test("multimodal: binary ingestion + header meta; undecodable bytes yield null, not noise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mm").toFile
    // Header-only PNG: parseable dims, but no IDAT → undecodable pixels.
    val png = ByteBuffer.allocate(32)
    png.put(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0d, 0x0a, 0x1a, 0x0a))
    png.putInt(13).put("IHDR".getBytes).putInt(64).putInt(32)
    java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath, png.array())

    val df = Multimodal.readBinary(spark, s"file://$dir", "*.png")
    val meta = Multimodal.withImageMeta(df)
    val row = meta.select("img_format", "width", "height").as[(String, Int, Int)].head()
    assert(row == ("png", 64, 32))

    // Production contract: no fabricated feature vectors — null features
    // (filterable) and zero frame rows for bytes no decoder handles.
    val feats = Multimodal.imageFeatures(meta, dim = 8)
    assert(feats.filter($"features".isNull).count() == 1)
    assert(Multimodal.sampleFrames(df, n = 3, dim = 4).count() == 0)

    // Test-only shape exerciser: explicit opt-in restores the
    // deterministic placeholder (schema + row multiplicity).
    val synth = Multimodal.imageFeatures(meta, dim = 8, syntheticFallback = true)
    val v1 = synth.select("features").as[Seq[Float]].head()
    val v2 = synth.select("features").as[Seq[Float]].head()
    assert(v1.length == 8)
    assert(v1 == v2) // deterministic stub
    val frames = Multimodal.sampleFrames(df, n = 3, dim = 4, syntheticFallback = true)
    assert(frames.count() == 3)
    assert(frames.select("frame_index").as[Int].collect().toSet == Set(0, 1, 2))
  }

  /** 24-bit BMP, 2x2: rows bottom-up, BGR, row stride padded to 4. */
  private def bmp2x2(): Array[Byte] = {
    val rowStride = 8 // 2 px * 3 B = 6, padded to 8
    val dataOff = 54
    val b = ByteBuffer.allocate(dataOff + rowStride * 2).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(dataOff + rowStride * 2)
    b.putShort(0).putShort(0).putInt(dataOff)
    b.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24).putInt(0).putInt(rowStride * 2)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    // bottom row first: (0,0)=red (0,1)=green; top... stored as BGR
    b.position(dataOff)
    b.put(Array[Byte](0, 0, 255.toByte, 0, 255.toByte, 0, 0, 0))        // file row 0 = image bottom: red, green
    b.put(Array[Byte](255.toByte, 0, 0, 255.toByte, 255.toByte, 255.toByte, 0, 0)) // image top: blue, white
    b.array()
  }

  test("BMP and PPM decode to real RGB pixels and pooled features") {
    val bmp = bmp2x2()
    val Some((fmt, w, h, px)) = Multimodal.decodeImage(bmp)
    assert((fmt, w, h) == ("bmp", 2, 2))
    // row-major from top: (0,0)=blue, (0,1)=white, (1,0)=red, (1,1)=green
    assert(px.take(3).toSeq == Seq[Byte](0, 0, 255.toByte))
    assert(px.slice(3, 6).toSeq == Seq[Byte](255.toByte, 255.toByte, 255.toByte))
    assert(px.slice(6, 9).toSeq == Seq[Byte](255.toByte, 0, 0))
    assert(px.slice(9, 12).toSeq == Seq[Byte](0, 255.toByte, 0))

    val ppm = ("P6\n# comment\n2 1\n255\n".getBytes("ISO-8859-1") ++
      Array[Byte](255.toByte, 255.toByte, 255.toByte, 0, 0, 0))
    val Some((pfmt, pw, ph, ppx)) = Multimodal.decodeImage(ppm)
    assert((pfmt, pw, ph) == ("ppm", 2, 1))
    assert(ppx.toSeq == Seq[Byte](255.toByte, 255.toByte, 255.toByte, 0, 0, 0))
    // pooled features: single strip = mean luminance of white+black = ~0.5
    val f = Multimodal.poolFeatures(pw, ph, ppx, 1)
    assert(math.abs(f(0) - 0.5f) < 0.01f)
  }

  test("imageFeatures runs the real decode path for BMP files end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mmbmp").toFile
    java.nio.file.Files.write(new java.io.File(dir, "img.bmp").toPath, bmp2x2())
    val df = Multimodal.readBinary(spark, s"file://$dir", "*.bmp")
    val meta = Multimodal.withImageMeta(df)
    assert(meta.select("img_format", "width", "height").as[(String, Int, Int)].head() == ("bmp", 2, 2))
    val feats = Multimodal.imageFeatures(df, dim = 2).select("features").as[Seq[Float]].head()
    // top strip: blue+white lum = (0.114 + 1.0)/2 ; bottom: red+green = (0.299+0.587)/2
    assert(math.abs(feats(0) - 0.557f) < 0.01f)
    assert(math.abs(feats(1) - 0.443f) < 0.01f)
    val px = Multimodal.withDecodedPixels(df).select("pixels_rgb").as[Array[Byte]].head()
    assert(px.length == 12)
  }
}
