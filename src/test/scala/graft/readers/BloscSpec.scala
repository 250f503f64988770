package graft.readers

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM blosc/LZ4 decoders two ways: hand-written LZ4
  * block-format vectors worked straight from `lz4_Block_format.md` (so
  * the decoder is not merely the inverse of our own test encoder), and
  * full blosc containers built by the minimal spec-faithful encoder
  * below (header/bstarts/split-streams/shuffle per c-blosc
  * `README_HEADER.rst`).
  */
class BloscSpec extends AnyFunSuite {

  private def lz4(src: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    Lz4Block.decompress(src, 0, src.length, out, 0, outLen)
    out
  }

  test("lz4 worked example: literal run, back-reference, final literals") {
    // "0123456789" + 10-byte match at offset 10 + final literals "01234"
    val s = "0123456789".getBytes("US-ASCII")
    val stream = Array[Byte](0xA6.toByte) ++ s ++ Array[Byte](0x0A, 0x00, 0x50) ++
      "01234".getBytes("US-ASCII")
    assert(new String(lz4(stream, 25), "US-ASCII") == "0123456789012345678901234")
  }

  test("lz4 worked example: overlapping RLE match (offset 1)") {
    // 1 literal 'x', match offset=1 len=8 (token 0x14), final literals "abcde"
    val stream = Array[Byte](0x14, 'x'.toByte, 0x01, 0x00, 0x50) ++ "abcde".getBytes("US-ASCII")
    assert(new String(lz4(stream, 14), "US-ASCII") == "xxxxxxxxxabcde")
  }

  test("lz4 worked example: length continuation bytes (15 + 255 + 0)") {
    val lits = Array.tabulate[Byte](270)(i => (i % 7).toByte)
    val stream = Array[Byte](0xF0.toByte, 0xFF.toByte, 0x00) ++ lits
    assert(lz4(stream, 270).toSeq == lits.toSeq)
    // match-length continuation: 4 literals, then 4+15+255+3 = 277 match bytes
    val src2 = Array[Byte](0x4F, 1, 2, 3, 4, 0x04, 0x00, 0xFF.toByte, 0x03, 0x50) ++
      "fghij".getBytes("US-ASCII")
    val got = lz4(src2, 4 + 277 + 5)
    assert(got.take(4).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(got.slice(4, 281).toSeq == Array.tabulate[Byte](277)(i => (i % 4 + 1).toByte).toSeq)
    assert(new String(got.takeRight(5), "US-ASCII") == "fghij")
  }

  test("lz4 rejects matches reaching before the window") {
    val bad = Array[Byte](0x14, 'x'.toByte, 0x05, 0x00, 0x50) ++ "abcde".getBytes("US-ASCII")
    intercept[IllegalArgumentException](lz4(bad, 14))
  }

  test("lz4 reports truncation at the point of corruption, not downstream") {
    // literal-length continuation cut off mid-stream
    val litTrunc = Array[Byte](0xF0.toByte, 0xFF.toByte)
    assert(intercept[IllegalArgumentException](lz4(litTrunc, 300))
      .getMessage.contains("truncated literal-length"))
    // match offset cut off after one of its two bytes
    val offTrunc = Array[Byte](0x10, 'x'.toByte, 0x01)
    assert(intercept[IllegalArgumentException](lz4(offTrunc, 10))
      .getMessage.contains("truncated match offset"))
    // match-length continuation cut off mid-stream
    val matchTrunc = Array[Byte](0x1F, 'x'.toByte, 0x01, 0x00, 0xFF.toByte)
    assert(intercept[IllegalArgumentException](lz4(matchTrunc, 600))
      .getMessage.contains("truncated match-length"))
  }

  test("blosc empty container (nbytes=0, blocksize=0) decodes to empty") {
    // c-blosc emits this shape for zero-length input
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).put(1.toByte).put((1 << 5).toByte).put(8.toByte)
    bb.putInt(0).putInt(0).putInt(16)
    assert(Blosc.decompress(bb.array()).isEmpty)
  }

  // ---- minimal spec-faithful blosc-lz4 encoder (test-side only) ------

  /** Greedy LZ4 block encoder: longest match (offset ≤ 65535, len ≥ 4)
    * against all prior output, literals otherwise; final sequence is
    * literals-only per the block-format end rules. */
  private def lz4Compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeLen(base: Int, len: Int): Unit =
      if (len >= 15) {
        var rest = len - 15
        while (rest >= 255) { out.write(255); rest -= 255 }
        out.write(rest)
      }
    var pos = 0
    var litStart = 0
    while (pos < data.length) {
      // end rules: last 5 bytes are literals; matches end ≥ 12 before end
      var bestLen = 0; var bestOff = 0
      if (pos + 12 <= data.length) {
        var off = math.max(1, pos - 65535)
        var cand = pos - 1
        while (cand >= math.max(0, pos - 4096)) { // bounded search window
          var l = 0
          val maxL = data.length - 5 - pos
          while (l < maxL && data(cand + (l % (pos - cand))) == data(pos + l)) l += 1
          if (l >= 4 && l > bestLen) { bestLen = l; bestOff = pos - cand }
          cand -= 1
        }
      }
      if (bestLen >= 4) {
        val litLen = pos - litStart
        val token = (math.min(litLen, 15) << 4) | math.min(bestLen - 4, 15)
        out.write(token)
        writeLen(15, litLen)
        out.write(data, litStart, litLen)
        out.write(bestOff & 0xff); out.write((bestOff >> 8) & 0xff)
        writeLen(15, bestLen - 4)
        pos += bestLen
        litStart = pos
      } else pos += 1
    }
    val litLen = data.length - litStart
    out.write(math.min(litLen, 15) << 4)
    writeLen(15, litLen)
    out.write(data, litStart, litLen)
    out.toByteArray
  }

  /** Blosc byte-shuffle (transpose to byte planes; tail copied through). */
  private def shuffleBytes(block: Array[Byte], typesize: Int): Array[Byte] = {
    val n = block.length / typesize
    val out = new Array[Byte](block.length)
    for (b <- 0 until typesize; i <- 0 until n) out(b * n + i) = block(i * typesize + b)
    System.arraycopy(block, n * typesize, out, n * typesize, block.length - n * typesize)
    out
  }

  /** Assemble a blosc v1 container: 16-byte header, u32 bstarts, then
    * per-block split streams (i32 size + payload; raw when not smaller). */
  private def bloscLz4(data: Array[Byte], typesize: Int, blocksize: Int,
      shuffle: Boolean = true, split: Boolean = true): Array[Byte] = {
    val nblocks = (data.length + blocksize - 1) / blocksize
    val streams = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    val headerLen = 16 + 4 * nblocks
    for (i <- 0 until nblocks) {
      bstarts(i) = headerLen + streams.size()
      val bsize = math.min(blocksize, data.length - i * blocksize)
      val raw0 = java.util.Arrays.copyOfRange(data, i * blocksize, i * blocksize + bsize)
      val block = if (shuffle && typesize > 1) shuffleBytes(raw0, typesize) else raw0
      val leftover = bsize < blocksize
      val nstreams = if (split && !leftover) typesize else 1
      val neblock = bsize / nstreams
      for (j <- 0 until nstreams) {
        val part = java.util.Arrays.copyOfRange(block, j * neblock, (j + 1) * neblock)
        val comp = lz4Compress(part)
        val payload = if (comp.length < neblock) comp else part
        val sz = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
        streams.write(sz); streams.write(payload)
      }
    }
    val total = headerLen + streams.size()
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    val flags = (if (shuffle && typesize > 1) 0x01 else 0) | (if (split) 0 else 0x10) | (1 << 5)
    bb.put(1.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    bb.putInt(data.length).putInt(blocksize).putInt(total)
    bstarts.foreach(bb.putInt)
    bb.put(streams.toByteArray)
    bb.array()
  }

  private def doubles(vals: Seq[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vals.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putDouble)
    bb.array()
  }

  test("blosc container round-trips: shuffle + split + leftover block") {
    val data = doubles((0 until 100).map(i => (i % 9).toDouble)) // 800 bytes, compressible
    val c = bloscLz4(data, typesize = 8, blocksize = 256) // 3 full blocks + 32-byte leftover
    assert(Blosc.looksLikeBlosc(c))
    assert(c.length < data.length) // actually compressed
    assert(Blosc.decompress(c).toSeq == data.toSeq)
  }

  test("blosc container round-trips: no shuffle, no split, raw fallback streams") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill[Byte](500)(rnd.nextInt().toByte) // incompressible → raw streams
    val c = bloscLz4(data, typesize = 1, blocksize = 200, shuffle = false, split = false)
    assert(Blosc.decompress(c).toSeq == data.toSeq)
  }

  test("blosc memcpy flag returns the stored payload") {
    val data = Array.tabulate[Byte](40)(_.toByte)
    val bb = ByteBuffer.allocate(16 + 40).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).put(1.toByte).put(0x02.toByte).put(8.toByte)
    bb.putInt(40).putInt(40).putInt(56)
    bb.put(data)
    assert(Blosc.decompress(bb.array()).toSeq == data.toSeq)
  }

  test("blosc refuses blosclz and bit-shuffle loudly") {
    def container(flags: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + 4 + 8).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte).put(1.toByte).put(flags.toByte).put(4.toByte)
      bb.putInt(4).putInt(4).putInt(28)
      bb.putInt(20) // bstart
      bb.putInt(4).put(Array[Byte](1, 2, 3, 4))
      bb.array()
    }
    // stream size == neblock would short-circuit to raw, so shrink it
    def compressedStream(flags: Int): Array[Byte] = {
      val c = container(flags)
      val bb = ByteBuffer.wrap(c).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(20, 3) // 3-byte "compressed" stream forces the codec path
      c
    }
    val blosclz = intercept[UnsupportedOperationException](Blosc.decompress(compressedStream(0)))
    assert(blosclz.getMessage.contains("blosclz"))
    val bitshuf = intercept[IllegalArgumentException](Blosc.decompress(container((1 << 5) | 0x04)))
    assert(bitshuf.getMessage.contains("bit-shuffle"))
  }

  /** Generic container assembly around pre-compressed streams. */
  private def bloscContainer(data: Array[Byte], typesize: Int, blocksize: Int,
      compcode: Int, shuffle: Boolean, compress: Array[Byte] => Array[Byte]): Array[Byte] = {
    val nblocks = (data.length + blocksize - 1) / blocksize
    val streams = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](nblocks)
    val headerLen = 16 + 4 * nblocks
    for (i <- 0 until nblocks) {
      bstarts(i) = headerLen + streams.size()
      val bsize = math.min(blocksize, data.length - i * blocksize)
      val raw0 = java.util.Arrays.copyOfRange(data, i * blocksize, i * blocksize + bsize)
      val block = if (shuffle && typesize > 1) shuffleBytes(raw0, typesize) else raw0
      val comp = compress(block)
      val payload = if (comp.length < bsize) comp else block
      val sz = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(payload.length).array()
      streams.write(sz); streams.write(payload)
    }
    val total = headerLen + streams.size()
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    val flags = (if (shuffle && typesize > 1) 0x01 else 0) | 0x10 | (compcode << 5) // dont-split
    bb.put(1.toByte).put(1.toByte).put(flags.toByte).put(typesize.toByte)
    bb.putInt(data.length).putInt(blocksize).putInt(total)
    bstarts.foreach(bb.putInt)
    bb.put(streams.toByteArray)
    bb.array()
  }

  test("blosc-zstd and blosc-snappy decode through the bundled codecs") {
    val data = doubles((0 until 200).map(i => (i % 11).toDouble)) // 1600 bytes
    val zc = bloscContainer(data, 8, 512, compcode = 4, shuffle = true,
      b => com.github.luben.zstd.Zstd.compress(b, 3))
    assert(zc.length < data.length)
    assert(Blosc.decompress(zc).toSeq == data.toSeq)
    val sc = bloscContainer(data, 8, 512, compcode = 2, shuffle = false,
      b => org.xerial.snappy.Snappy.compress(b))
    assert(Blosc.decompress(sc).toSeq == data.toSeq)
  }

  test("native lz4 decoder agrees with lz4-java's independent encoder") {
    val factory = net.jpountz.lz4.LZ4Factory.fastestJavaInstance()
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      Array.fill[Byte](4096)(rnd.nextInt(4).toByte),                 // compressible noise
      doubles((0 until 512).map(i => (i % 13).toDouble)),            // shuffled-plane-like runs
      "the quick brown fox ".* (200).getBytes("US-ASCII"),           // periodic text
      Array.fill[Byte](333)(rnd.nextInt().toByte)                    // incompressible
    )
    cases.foreach { data =>
      for (comp <- Seq(factory.fastCompressor(), factory.highCompressor())) {
        val enc = comp.compress(data)
        val out = new Array[Byte](data.length)
        Lz4Block.decompress(enc, 0, enc.length, out, 0, data.length)
        assert(out.toSeq == data.toSeq)
      }
    }
  }
}
