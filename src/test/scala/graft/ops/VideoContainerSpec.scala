package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}


/** Synthesizes minimal-but-valid MP4 (ftyp+moov with a tiny stbl) and
  * AVI (RIFF+avih+movi+idx1) containers in memory and asserts the frame
  * index [[VideoContainer]] derives — offsets, sizes, durations — plus
  * tolerant-None behavior on truncated/corrupt input (the parse runs as
  * an executor-side UDF over binaryFile content, so it must never throw).
  */
class VideoContainerSpec extends graft.SparkSpec {

  // ------------------------------------------------------------- MP4 builder

  private def box(typ: String, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
    b.array()
  }

  private def fullBox(typ: String, body: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](0, 0, 0, 0) ++ body) // version 0 + flags

  private def be(ints: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * ints.length)
    ints.foreach(b.putInt)
    b.array()
  }

  /** ftyp + moov(trak(mdia(hdlr vide, mdhd ts, minf(stbl)))) + mdat with
    * `frames` laid out as one chunk each; stco points at absolute
    * offsets. Returns (fileBytes, expectedOffsets).
    */
  private def buildMp4(frames: Seq[Array[Byte]], timescale: Int, delta: Int): (Array[Byte], Seq[Long]) = {
    val ftyp = box("ftyp", "isom".getBytes ++ be(0x200) ++ "isomiso2".getBytes)

    val hdlr = fullBox("hdlr", be(0) ++ "vide".getBytes ++ be(0, 0, 0) ++ Array[Byte](0))
    val mdhd = fullBox("mdhd", be(0, 0, timescale, frames.map(_ => delta).sum))
    val stts = fullBox("stts", be(1, frames.length, delta))
    val stsz = fullBox("stsz", be(0, frames.length) ++ be(frames.map(_.length): _*))
    val stsc = fullBox("stsc", be(1, 1, 1, 1)) // one sample per chunk
    // stco offsets depend on the total header length; two-pass: build with
    // zeros, measure, rebuild.
    def assemble(offsets: Seq[Int]): Array[Byte] = {
      val stco = fullBox("stco", be(frames.length) ++ be(offsets: _*))
      val stbl = box("stbl", stsz ++ stts ++ stsc ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", mdia)
      val moov = box("moov", trak)
      val mdat = box("mdat", frames.toArray.flatten)
      ftyp ++ moov ++ mdat
    }
    val probe = assemble(frames.map(_ => 0))
    val mdatDataStart = probe.length - frames.map(_.length).sum
    val offsets = frames.scanLeft(mdatDataStart)(_ + _.length).init
    (assemble(offsets), offsets.map(_.toLong))
  }

  // ------------------------------------------------------------- AVI builder

  private def le(ints: Int*): Array[Byte] = {
    val b = ByteBuffer.allocate(4 * ints.length).order(ByteOrder.LITTLE_ENDIAN)
    ints.foreach(b.putInt)
    b.array()
  }

  /** RIFF AVI: LIST hdrl(avih) + LIST movi(00dc chunks) + idx1. idx1
    * offsets are movi-relative (pointing at each chunk's ckid), plus
    * optionally one bogus entry whose offset matches neither convention.
    */
  private def buildAvi(
      frames: Seq[Array[Byte]],
      usPerFrame: Int,
      w: Int,
      h: Int,
      addBogusEntry: Boolean = false): (Array[Byte], Seq[Long]) = {
    val avihBody = new Array[Byte](56)
    System.arraycopy(le(usPerFrame), 0, avihBody, 0, 4)
    System.arraycopy(le(w), 0, avihBody, 32, 4)
    System.arraycopy(le(h), 0, avihBody, 36, 4)
    val avih = "avih".getBytes ++ le(56) ++ avihBody
    val hdrl = "LIST".getBytes ++ le(4 + avih.length) ++ "hdrl".getBytes ++ avih

    val movi = new ByteArrayOutputStream()
    movi.write("movi".getBytes)
    val relOffsets = Seq.newBuilder[Int]
    frames.foreach { f =>
      relOffsets += movi.size() // ckid position relative to "movi" fourcc
      movi.write("00dc".getBytes)
      movi.write(le(f.length))
      movi.write(f)
      if ((f.length & 1) == 1) movi.write(0)
    }
    val moviBytes = movi.toByteArray
    val moviList = "LIST".getBytes ++ le(moviBytes.length) ++ moviBytes

    val idxEntries = new ByteArrayOutputStream()
    relOffsets.result().zip(frames).foreach { case (rel, f) =>
      idxEntries.write("00dc".getBytes)
      idxEntries.write(le(0x10, rel, f.length))
    }
    if (addBogusEntry) {
      idxEntries.write("00dc".getBytes)
      idxEntries.write(le(0x10, 0x7f000000, 10)) // lands nowhere valid
    }
    val idx1 = "idx1".getBytes ++ le(idxEntries.size()) ++ idxEntries.toByteArray

    val payload = "AVI ".getBytes ++ hdrl ++ moviList ++ idx1
    val file = "RIFF".getBytes ++ le(payload.length) ++ payload
    // expected absolute data offsets: moviPos + rel + 8 (past ckid+size)
    val moviPos = ("RIFF".length + 4 + "AVI ".length + hdrl.length + 8)
    (file, relOffsets.result().map(r => (moviPos + r + 8).toLong))
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  // ------------------------------------------------------------- MP4 tests

  test("MP4: stbl walk yields exact per-frame offsets, sizes, durations") {
    val frames = Seq(Array.fill[Byte](100)(1), Array.fill[Byte](200)(2), Array.fill[Byte](50)(3))
    val (bytes, offsets) = buildMp4(frames, timescale = 1000, delta = 40)
    val vi = VideoContainer.parse(bytes).getOrElse(fail("mp4 did not parse"))
    assert(vi.format == "mp4")
    assert(vi.nFrames == 3)
    assert(vi.frames.map(_.offset) == offsets.toVector)
    assert(vi.frames.map(_.size) == Vector(100L, 200L, 50L))
    vi.frames.foreach(f => assert(math.abs(f.dtSec - 0.04) < 1e-9))
    assert(math.abs(vi.durationSec - 0.12) < 1e-9)
  }

  test("MP4: truncated and table-corrupt files return None, never throw") {
    val (bytes, _) = buildMp4(Seq(Array.fill[Byte](64)(1)), 1000, 40)
    // every truncation point: tolerant walk must yield None or a valid index
    (0 until bytes.length by 7).foreach { cut =>
      VideoContainer.parse(bytes.take(cut)) // must not throw
    }
    // corrupt stts entry count to a huge value: bounds check → None
    val idx = indexOfSlice(bytes, "stts".getBytes)
    assert(idx > 0)
    val corrupt = bytes.clone()
    ByteBuffer.wrap(corrupt, idx + 8, 4).putInt(0x7fffffff)
    assert(VideoContainer.parse(corrupt).isEmpty)
    // corrupt stsz sample count similarly
    val szIdx = indexOfSlice(bytes, "stsz".getBytes)
    val corrupt2 = bytes.clone()
    ByteBuffer.wrap(corrupt2, szIdx + 12, 4).putInt(500000)
    assert(VideoContainer.parse(corrupt2).isEmpty)
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int =
    hay.indices.find(i => i + needle.length <= hay.length &&
      needle.indices.forall(j => hay(i + j) == needle(j))).getOrElse(-1)

  // ------------------------------------------------------------- AVI tests

  test("AVI: idx1 entries resolve to absolute frame extents with timing") {
    val frames = Seq(Array.fill[Byte](33)(7), Array.fill[Byte](44)(8))
    val (bytes, offsets) = buildAvi(frames, usPerFrame = 50000, w = 320, h = 240)
    val vi = VideoContainer.parse(bytes).getOrElse(fail("avi did not parse"))
    assert(vi.format == "avi")
    assert((vi.width, vi.height) == (320, 240))
    assert(vi.frames.map(_.offset) == offsets.toVector)
    assert(vi.frames.map(_.size) == Vector(33L, 44L))
    vi.frames.foreach(f => assert(math.abs(f.dtSec - 0.05) < 1e-9))
    // frame bytes at the reported extents are the chunk payloads
    assert(bytes(offsets.head.toInt) == 7)
    assert(bytes(offsets(1).toInt) == 8)
  }

  test("AVI: idx1 entry matching neither offset convention is skipped, not guessed") {
    val frames = Seq(Array.fill[Byte](16)(5))
    val (bytes, _) = buildAvi(frames, 40000, 64, 48, addBogusEntry = true)
    val vi = VideoContainer.parse(bytes).getOrElse(fail("avi did not parse"))
    assert(vi.nFrames == 1) // bogus entry dropped
    val (truncated, _) = buildAvi(frames, 40000, 64, 48)
    (0 until truncated.length by 5).foreach(cut => VideoContainer.parse(truncated.take(cut)))
    assert(VideoContainer.parse(Array[Byte](1, 2, 3)).isEmpty)
  }

  // ------------------------------------------------------- MJPEG decode E2E

  test("MJPEG-AVI frames decode to real pixel features via sampleFrames") {
    
    import spark.implicits._
    val white = jpegBytes(16, 16, 0xffffff)
    val black = jpegBytes(16, 16, 0x000000)
    val (avi, _) = buildAvi(Seq(white, black), usPerFrame = 100000, w = 16, h = 16)

    val dir = java.nio.file.Files.createTempDirectory("mjpeg").toFile
    java.nio.file.Files.write(new java.io.File(dir, "clip.avi").toPath, avi)
    val df = Multimodal.readBinary(spark, s"file://$dir", "*.avi")
    val rows = Multimodal.sampleFrames(df, n = 2, dim = 1)
      .select("frame_index", "frame_time_sec", "features")
      .as[(Int, Double, Seq[Float])].collect().sortBy(_._1)

    assert(rows.map(_._1).toSeq == Seq(0, 1))
    assert(math.abs(rows(0)._2 - 0.0) < 1e-9)
    assert(math.abs(rows(1)._2 - 0.1) < 1e-9)
    // real decoded luminance: white frame ~1.0, black frame ~0.0
    assert(rows(0)._3.length == 1)
    assert(math.abs(rows(0)._3.head - 1.0f) < 0.05f)
    assert(math.abs(rows(1)._3.head - 0.0f) < 0.05f)
  }

  test("withVideoMeta lifts container metadata to columns") {
    import spark.implicits._
    val (avi, _) = buildAvi(Seq(jpegBytes(16, 16, 0x336699)), usPerFrame = 40000, w = 16, h = 16)
    val df = Seq(("clip.avi", avi), ("not_video.bin", Array[Byte](1, 2, 3))).toDF("path", "content")
    val meta = Multimodal.withVideoMeta(df)
      .select("path", "video_format", "width", "height", "n_frames", "duration_sec")
      .collect().map(r => r.getString(0) -> r).toMap
    val clip = meta("clip.avi")
    assert(clip.getString(1) == "avi" && clip.getInt(2) == 16 && clip.getInt(3) == 16)
    assert(clip.getInt(4) == 1 && math.abs(clip.getDouble(5) - 0.04) < 1e-9)
    assert(meta("not_video.bin").isNullAt(1))
  }

  test("avi urls detect and route to the binary reader for the multimodal ops") {
    val (avi, _) = buildAvi(Seq(Array.fill[Byte](8)(1)), 40000, 8, 8)
    val kinds = graft.datatypes.Detect.recommend("s3://bucket/clips/a.avi", head = avi)
    assert(kinds.exists(_.kind.name == "avi"))
    val (ok, _) = graft.readers.SparkReaders.recommend(graft.datatypes.DataRef("avi", "s3://bucket/clips/a.avi"))
    assert(ok.exists(_.name == "spark_binary"))
  }

  test("MP4 with JPEG samples decodes its first frame in imageFeatures") {
    
    import spark.implicits._
    val gray = jpegBytes(8, 8, 0x808080)
    val (mp4, _) = buildMp4(Seq(gray), timescale = 600, delta = 20)
    val df = Seq(("f.mp4", mp4)).toDF("path", "content")
    val feats = Multimodal.imageFeatures(df, dim = 1).select("features").as[Seq[Float]].head()
    assert(feats.length == 1)
    assert(math.abs(feats.head - 0x80 / 255.0f) < 0.05f)
  }
}
