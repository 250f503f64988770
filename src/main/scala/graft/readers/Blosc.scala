package graft.readers

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM Blosc v1 container decoder (c-blosc `README_HEADER.rst` /
  * `blosc/blosc.c`), covering the codecs zarr-python emits by default:
  * numcodecs `Blosc(cname="lz4", clevel=5, shuffle=SHUFFLE)` is the v2
  * default compressor (reference reads these stores through xarray/zarr,
  * intake/readers/readers.py:1363-1393), so most real-world Zarr v2
  * chunks are blosc-lz4 + byte-shuffle containers.
  *
  * Layout (all integers little-endian):
  *
  * {{{
  *   0  u8  version          (1 or 2)
  *   1  u8  versionlz        (codec format version — informational)
  *   2  u8  flags            bit0 byte-shuffle, bit1 memcpy (stored
  *                           uncompressed), bit2 bit-shuffle, bit4
  *                           dont-split, bits5-7 compressor code
  *                           (0 blosclz, 1 lz4/lz4hc, 3 zlib, 4 zstd)
  *   3  u8  typesize
  *   4  u32 nbytes           uncompressed payload size
  *   8  u32 blocksize
  *  12  u32 cbytes           total container size
  *  16  u32 × nblocks        bstarts: offset of each block's streams
  * }}}
  *
  * Each block covers `min(blocksize, nbytes - i*blocksize)` bytes and is
  * stored as `nstreams` independent streams, where `nstreams = typesize`
  * when splitting is on (dont-split flag clear) and the block is not the
  * short leftover block, else 1 (`blosc.c` `blosc_d`). Every stream is
  * `i32 cbytes` followed by that many bytes; `cbytes == neblock` marks a
  * stream stored raw. After the streams are concatenated, byte-shuffle
  * is undone per block: the shuffled form holds byte-plane `b` of all
  * `bsize/typesize` elements contiguously, with any `bsize % typesize`
  * tail bytes copied through unshuffled (`shuffle.c shuffle_generic`).
  *
  * Supported codecs: lz4/lz4hc (block format decoded natively below,
  * cross-checked against lz4-java's independent encoder in spec), zlib
  * (`Inflater`), zstd and snappy (through the zstd-jni / snappy-java
  * libraries every Spark distribution bundles), and memcpy
  * passthrough. blosclz and bit-shuffle refuse loudly (no independent
  * implementation available here to verify a from-scratch blosclz
  * decoder against).
  */
object Blosc {

  /** Does `bytes` start with a plausible blosc v1/v2 container header? */
  def looksLikeBlosc(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 && (bytes(0) == 1 || bytes(0) == 2) && {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.getInt(12) == bytes.length && bb.getInt(4) >= 0
    }

  def decompress(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 16, "blosc: truncated header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val flags = bytes(2) & 0xff
    val typesize = bytes(3) & 0xff
    val nbytes = bb.getInt(4)
    val blocksize = bb.getInt(8)
    val cbytes = bb.getInt(12)
    require(cbytes == bytes.length, s"blosc: container says $cbytes bytes, got ${bytes.length}")
    require((flags & 0x04) == 0, "blosc: bit-shuffle unsupported (byte-shuffle and none only)")

    if ((flags & 0x02) != 0) // memcpy: payload stored verbatim after the header
      return java.util.Arrays.copyOfRange(bytes, 16, 16 + nbytes)

    val compcode = (flags >> 5) & 0x07
    val doShuffle = (flags & 0x01) != 0
    val dontSplit = (flags & 0x10) != 0
    // c-blosc emits nbytes=0, blocksize=0 containers for empty input;
    // short-circuit before the block loop would divide by blocksize.
    if (nbytes == 0) return Array.emptyByteArray
    require(blocksize > 0, s"blosc: non-empty container with blocksize $blocksize")
    val out = new Array[Byte](nbytes)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    var i = 0
    while (i < nblocks) {
      val bsize = math.min(blocksize, nbytes - i * blocksize)
      val leftover = bsize < blocksize
      val nstreams = if (!dontSplit && !leftover) typesize else 1
      require(nstreams > 0 && bsize % nstreams == 0,
        s"blosc: block $i size $bsize not divisible into $nstreams streams")
      val neblock = bsize / nstreams
      var pos = bb.getInt(16 + i * 4) // bstarts entry
      val block = new Array[Byte](bsize)
      var j = 0
      while (j < nstreams) {
        val sc = bb.getInt(pos); pos += 4
        require(sc > 0 && pos + sc <= bytes.length, s"blosc: bad stream size $sc in block $i")
        if (sc == neblock) System.arraycopy(bytes, pos, block, j * neblock, neblock)
        else compcode match {
          case 1 => Lz4Block.decompress(bytes, pos, sc, block, j * neblock, neblock)
          case 3 =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(bytes, pos, sc)
            var done = 0
            while (done < neblock && !inf.finished()) {
              val n = inf.inflate(block, j * neblock + done, neblock - done)
              if (n == 0 && inf.needsInput()) throw new IllegalStateException("blosc: truncated zlib stream")
              done += n
            }
            inf.end()
            require(done == neblock, s"blosc: zlib stream yielded $done of $neblock bytes")
          case 2 =>
            val stream = java.util.Arrays.copyOfRange(bytes, pos, pos + sc)
            val got = org.xerial.snappy.Snappy.uncompress(stream)
            require(got.length == neblock, s"blosc: snappy stream yielded ${got.length} of $neblock bytes")
            System.arraycopy(got, 0, block, j * neblock, neblock)
          case 4 =>
            val dst = new Array[Byte](neblock)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(dst, 0, neblock, bytes, pos, sc)
            require(n == neblock, s"blosc: zstd stream yielded $n of $neblock bytes")
            System.arraycopy(dst, 0, block, j * neblock, neblock)
          case 0 => throw new UnsupportedOperationException("blosc: blosclz codec unsupported (lz4/zlib/zstd/snappy only)")
          case c => throw new UnsupportedOperationException(s"blosc: unknown compressor code $c")
        }
        pos += sc
        j += 1
      }
      val dst = i * blocksize
      if (doShuffle && typesize > 1) unshuffle(block, typesize, out, dst)
      else System.arraycopy(block, 0, out, dst, bsize)
      i += 1
    }
    out
  }

  /** Undo blosc's byte transpose over one block: shuffled byte-plane
    * layout back to element order; the `bsize % typesize` tail passes
    * through untransposed (shuffle.c `shuffle_generic`). */
  private def unshuffle(block: Array[Byte], typesize: Int, out: Array[Byte], dst: Int): Unit = {
    val bsize = block.length
    val n = bsize / typesize
    var b = 0
    while (b < typesize) {
      var i = 0
      while (i < n) {
        out(dst + i * typesize + b) = block(b * n + i)
        i += 1
      }
      b += 1
    }
    System.arraycopy(block, n * typesize, out, dst + n * typesize, bsize - n * typesize)
  }
}

/** LZ4 *block* format decoder (lz4 `doc/lz4_Block_format.md`): a
  * sequence stream of `token | literals… | matchOffset u16le |
  * matchLenExt…`, where token holds 4-bit literal/match lengths with
  * 255-valued continuation bytes, matches are length ≥ 4 and may
  * overlap their own output, and the final sequence carries literals
  * only. This is the codec inside blosc-lz4 streams (and lance/zstd-free
  * arrow buffers use the same block format).
  */
object Lz4Block {

  /** Decode `len` bytes at `src[srcOff)` into exactly `outLen` bytes at
    * `out[outOff)`. */
  def decompress(src: Array[Byte], srcOff: Int, len: Int, out: Array[Byte], outOff: Int, outLen: Int): Unit = {
    var ip = srcOff
    val ipEnd = srcOff + len
    var op = outOff
    val opEnd = outOff + outLen
    while (ip < ipEnd) {
      val token = src(ip) & 0xff; ip += 1
      // literals
      var litLen = token >>> 4
      if (litLen == 15) {
        var c = 255
        while (c == 255) {
          require(ip < ipEnd, "lz4: truncated literal-length continuation")
          c = src(ip) & 0xff; ip += 1; litLen += c
        }
      }
      require(ip + litLen <= ipEnd && op + litLen <= opEnd, "lz4: literal run out of bounds")
      System.arraycopy(src, ip, out, op, litLen)
      ip += litLen; op += litLen
      if (ip < ipEnd) { // last sequence stops after its literals
        require(ip + 2 <= ipEnd, "lz4: truncated match offset")
        val offset = ((src(ip) & 0xff) | ((src(ip + 1) & 0xff) << 8)); ip += 2
        require(offset > 0 && op - offset >= outOff, s"lz4: match offset $offset before window start")
        var matchLen = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var c = 255
          while (c == 255) {
            require(ip < ipEnd, "lz4: truncated match-length continuation")
            c = src(ip) & 0xff; ip += 1; matchLen += c
          }
        }
        require(op + matchLen <= opEnd, "lz4: match run past output")
        var k = 0 // byte-wise: matches may overlap their own output
        while (k < matchLen) { out(op + k) = out(op + k - offset); k += 1 }
        op += matchLen
      }
    }
    require(op == opEnd, s"lz4: decoded ${op - outOff} of $outLen bytes")
  }
}
