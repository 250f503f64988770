package graft.ops

/** Codec-free video *container* parsing: walks MP4 (ISO BMFF) sample
  * tables and AVI RIFF indexes to a real per-frame index — (frame index,
  * absolute byte offset, size, frame duration) — plus stream-level
  * width/height/frame-count/duration. This is the metadata layer of the
  * reference's video readers (`/root/reference/intake/readers/readers.py:2208`
  * DecordVideo, `:3644` ImageIOVideo): those decode pixels through
  * decord/ffmpeg, which have no JVM equivalent in this environment, so
  * pixel decode stays out of scope — but frame boundaries, timing and
  * the frame BYTES are real, from the container's own tables:
  *
  *  - MP4: `moov/trak[handler=vide]/mdia/minf/stbl` — `stts` (per-sample
  *    time deltas), `stsz` (sample sizes), `stsc` (samples per chunk),
  *    `stco`/`co64` (chunk offsets) combine into exact per-sample byte
  *    extents, the same walk every demuxer does.
  *  - AVI: `avih` (frame period, dimensions) + the `idx1` index chunk
  *    (one entry per `##dc`/`##db` video frame with offset+size relative
  *    to the `movi` list).
  *
  * The parse is bounded by the index tables (KBs for hours of video), so
  * it runs fine as an executor-side UDF over `binaryFile` content.
  */
object VideoContainer {

  /** One video frame's byte extent: `offset` is absolute in the file,
    * `dtSec` is the frame's display duration.
    */
  final case class Frame(index: Int, offset: Long, size: Long, dtSec: Double)

  final case class VideoIndex(
      format: String,
      width: Int,
      height: Int,
      nFrames: Int,
      durationSec: Double,
      frames: Vector[Frame])

  def parse(bytes: Array[Byte]): Option[VideoIndex] =
    parseMp4(bytes).orElse(parseAvi(bytes))

  // ------------------------------------------------------------- MP4

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) | ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def be64(b: Array[Byte], p: Int): Long =
    (be32(b, p) << 32) | be32(b, p + 4)

  private final case class Box(typ: String, bodyStart: Int, bodyEnd: Int)

  /** Children of [start, end): tolerant walk — stops at the first
    * malformed size instead of throwing (truncated uploads are normal).
    */
  private def boxes(b: Array[Byte], start: Int, end: Int): Vector[Box] = {
    val out = Vector.newBuilder[Box]
    var p = start
    var ok = true
    while (ok && p + 8 <= end) {
      val size32 = be32(b, p)
      val typ = new String(b, p + 4, 4, "ISO-8859-1")
      var header = 8L
      var size = size32
      if (size32 == 1 && p + 16 <= end) { size = be64(b, p + 8); header = 16 }
      else if (size32 == 0) size = (end - p).toLong
      if (size < header || p + size > end) ok = false
      else {
        out += Box(typ, (p + header).toInt, (p + size).toInt)
        p += size.toInt
      }
    }
    out.result()
  }

  private def child(b: Array[Byte], parent: Box, typ: String): Option[Box] =
    boxes(b, parent.bodyStart, parent.bodyEnd).find(_.typ == typ)

  /** True iff `[start, start+need)` lies inside the box body — every
    * table read below goes through this (or an equivalent long-arith
    * check) so a corrupt/truncated file yields None, never an
    * ArrayIndexOutOfBoundsException from an executor task.
    */
  private def fits(box: Box, start: Long, need: Long): Boolean =
    need >= 0 && start >= box.bodyStart && start + need <= box.bodyEnd

  def parseMp4(b: Array[Byte]): Option[VideoIndex] = {
    if (b.length < 16 || new String(b, 4, 4, "ISO-8859-1") != "ftyp") return None
    val top = boxes(b, 0, b.length)
    val moov = top.find(_.typ == "moov").getOrElse(return None)
    boxes(b, moov.bodyStart, moov.bodyEnd).iterator
      .filter(_.typ == "trak")
      .flatMap(parseVideoTrak(b, _))
      .nextOption()
  }

  /** One trak → Some(index) iff its handler is `vide` and the sample
    * tables are complete.
    */
  private def parseVideoTrak(b: Array[Byte], trak: Box): Option[VideoIndex] = {
    val mdia = child(b, trak, "mdia").getOrElse(return None)
    val hdlr = child(b, mdia, "hdlr").getOrElse(return None)
    if (hdlr.bodyStart + 12 > hdlr.bodyEnd ||
        new String(b, hdlr.bodyStart + 8, 4, "ISO-8859-1") != "vide") return None

    val mdhd = child(b, mdia, "mdhd").getOrElse(return None)
    if (!fits(mdhd, mdhd.bodyStart, 16)) return None
    val mdhdV1 = b(mdhd.bodyStart) == 1
    if (mdhdV1 && !fits(mdhd, mdhd.bodyStart, 24)) return None
    val timescale = if (mdhdV1) be32(b, mdhd.bodyStart + 20) else be32(b, mdhd.bodyStart + 12)
    if (timescale <= 0) return None

    // tkhd width/height are 16.16 fixed point after the 36-byte matrix
    val (width, height) = child(b, trak, "tkhd").map { tkhd =>
      if (!fits(tkhd, tkhd.bodyStart, 1)) (0, 0)
      else {
        val base = tkhd.bodyStart + (if (b(tkhd.bodyStart) == 1) 88 else 76)
        if (fits(tkhd, base, 8)) ((be32(b, base) >> 16).toInt, (be32(b, base + 4) >> 16).toInt)
        else (0, 0)
      }
    }.getOrElse((0, 0))

    val stbl = child(b, mdia, "minf").flatMap(child(b, _, "stbl")).getOrElse(return None)

    // stsz: per-sample sizes (or one constant size)
    val stsz = child(b, stbl, "stsz").getOrElse(return None)
    if (!fits(stsz, stsz.bodyStart, 12)) return None
    val constSize = be32(b, stsz.bodyStart + 4)
    val nSamples = be32(b, stsz.bodyStart + 8).toInt
    if (nSamples <= 0 || nSamples > 100000000) return None
    def sizeOf(i: Int): Long =
      if (constSize != 0) constSize else be32(b, stsz.bodyStart + 12 + i * 4)
    if (constSize == 0 && !fits(stsz, stsz.bodyStart + 12L, nSamples * 4L)) return None

    // stts: (count, delta) runs → per-sample dt
    val stts = child(b, stbl, "stts").getOrElse(return None)
    if (!fits(stts, stts.bodyStart, 8)) return None
    val nStts = be32(b, stts.bodyStart + 4).toInt
    if (nStts < 0 || !fits(stts, stts.bodyStart + 8L, nStts * 8L)) return None
    val dts = new Array[Double](nSamples)
    var si = 0
    var e = 0
    while (e < nStts && si < nSamples) {
      val cnt = be32(b, stts.bodyStart + 8 + e * 8).toInt
      val delta = be32(b, stts.bodyStart + 12 + e * 8)
      var c = 0
      while (c < cnt && si < nSamples) { dts(si) = delta.toDouble / timescale; si += 1; c += 1 }
      e += 1
    }

    // stsc runs + stco/co64 chunk offsets → absolute sample offsets
    val stsc = child(b, stbl, "stsc").getOrElse(return None)
    if (!fits(stsc, stsc.bodyStart, 8)) return None
    val nStsc = be32(b, stsc.bodyStart + 4).toInt
    if (nStsc < 0 || !fits(stsc, stsc.bodyStart + 8L, nStsc * 12L)) return None
    val stscRuns = (0 until nStsc).map { i =>
      (be32(b, stsc.bodyStart + 8 + i * 12).toInt, // first_chunk, 1-based
        be32(b, stsc.bodyStart + 12 + i * 12).toInt) // samples_per_chunk
    }
    val chunkOffsets: IndexedSeq[Long] =
      child(b, stbl, "stco").map { stco =>
        if (!fits(stco, stco.bodyStart, 8)) return None
        val n = be32(b, stco.bodyStart + 4).toInt
        if (n < 0 || !fits(stco, stco.bodyStart + 8L, n * 4L)) return None
        (0 until n).map(i => be32(b, stco.bodyStart + 8 + i * 4))
      }.orElse(child(b, stbl, "co64").map { co64 =>
        if (!fits(co64, co64.bodyStart, 8)) return None
        val n = be32(b, co64.bodyStart + 4).toInt
        if (n < 0 || !fits(co64, co64.bodyStart + 8L, n * 8L)) return None
        (0 until n).map(i => be64(b, co64.bodyStart + 8 + i * 8))
      }).getOrElse(return None)
    if (stscRuns.isEmpty || chunkOffsets.isEmpty) return None

    def samplesInChunk(chunk1: Int): Int = {
      var spc = stscRuns.head._2
      stscRuns.foreach { case (first, n) => if (first <= chunk1) spc = n }
      spc
    }

    val frames = Vector.newBuilder[Frame]
    var idx = 0
    var ci = 0
    while (ci < chunkOffsets.length && idx < nSamples) {
      var off = chunkOffsets(ci)
      var j = 0
      val spc = samplesInChunk(ci + 1)
      while (j < spc && idx < nSamples) {
        val sz = sizeOf(idx)
        frames += Frame(idx, off, sz, dts(idx))
        off += sz
        idx += 1
        j += 1
      }
      ci += 1
    }
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some(VideoIndex("mp4", width, height, fs.length, fs.map(_.dtSec).sum, fs))
  }

  // ------------------------------------------------------------- AVI

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) | ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String = new String(b, p, 4, "ISO-8859-1")

  def parseAvi(b: Array[Byte]): Option[VideoIndex] = {
    if (b.length < 24 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None

    var microSecPerFrame = 0L
    var width = 0
    var height = 0
    var moviPos = -1 // position of the "movi" fourcc (idx1 offsets are relative to it)
    var idx1: Option[(Int, Int)] = None // (dataStart, dataLen)

    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fourcc(b, p)
        val len = le32(b, p + 4).toInt
        if (len < 0 || p + 8 + len > end) return
        if (id == "LIST" && len >= 4) {
          val listType = fourcc(b, p + 8)
          if (listType == "movi") moviPos = p + 8
          // recurse into hdrl (for avih) and strl; movi's frame chunks
          // come from idx1, no need to walk them
          if (listType != "movi") walk(p + 12, p + 8 + len)
        } else if (id == "avih" && len >= 40) {
          microSecPerFrame = le32(b, p + 8)
          width = le32(b, p + 8 + 32).toInt
          height = le32(b, p + 8 + 36).toInt
        } else if (id == "idx1") {
          idx1 = Some((p + 8, len))
        }
        p += 8 + len + (len & 1) // chunks are word-aligned
      }
    }
    walk(12, math.min(b.length, 12 + le32(b, 4).toInt - 4))

    val (ixOff, ixLen) = idx1.getOrElse(return None)
    if (moviPos < 0) return None
    val dt = if (microSecPerFrame > 0) microSecPerFrame / 1e6 else 0.0

    val frames = Vector.newBuilder[Frame]
    var i = 0
    var n = 0
    while (i + 16 <= ixLen) {
      val p = ixOff + i
      val ckid = fourcc(b, p)
      // ##dc/##db = compressed/uncompressed video frame of stream ##
      if (ckid.length == 4 && ckid(2) == 'd' && (ckid(3) == 'c' || ckid(3) == 'b')) {
        val rel = le32(b, p + 8)
        val size = le32(b, p + 12)
        // dwOffset normally points at the chunk's ckid relative to the
        // "movi" fourcc; some writers store absolute file offsets — pick
        // whichever lands on the right ckid. When NEITHER convention
        // validates, the entry is skipped (not guessed): a fabricated
        // offset would hand downstream consumers garbage bytes as a
        // frame, which is worse than a missing frame.
        val relPos = moviPos + rel
        val dataOff =
          if (relPos + 8 <= b.length && fourcc(b, relPos.toInt) == ckid) relPos + 8
          else if (rel + 8 <= b.length && fourcc(b, rel.toInt) == ckid) rel + 8
          else -1L
        if (dataOff >= 0) {
          frames += Frame(n, dataOff, size, dt)
          n += 1
        }
      }
      i += 16
    }
    val fs = frames.result()
    if (fs.isEmpty) None
    else Some(VideoIndex("avi", width, height, fs.length, fs.length * dt, fs))
  }
}
