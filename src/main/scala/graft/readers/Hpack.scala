package graft.readers

import java.nio.charset.StandardCharsets

/** HPACK header-block decoder (RFC 7541) — the receive side the
  * [[ArrowFlightReader]] needs to read gRPC trailers reliably: real
  * servers encode `grpc-status` with incremental indexing and/or
  * Huffman strings, which a literal-only scan cannot see, so a
  * mid-stream error could pass as silently truncated success. This
  * decoder covers the full wire grammar: indexed fields, all three
  * literal forms, dynamic-table inserts/eviction, table-size updates,
  * and Huffman-coded strings (Appendix B code table, decoded through a
  * binary trie).
  *
  * One decoder instance per HTTP/2 connection: the dynamic table is
  * connection state shared by every header block on it (RFC 7541 §2.2),
  * so initial headers AND trailers must flow through the same instance.
  *
  * Encoding stays literal-only ([[ArrowFlightReader.hpackLiteral]]) —
  * a client may always send never-indexed literals; it may not refuse
  * to decode what the peer legally sends.
  */
object Hpack {

  // RFC 7541 Appendix B Huffman codes: (code, bit length) per symbol
  // 0..255 plus EOS(256). Verified against the netty-codec-http2 copy
  // of the same constants in HpackSpec.
  private[readers] val HuffCodes: Array[Int] = Array(
    0x1ff8, 0x7fffd8, 0xfffffe2, 0xfffffe3, 0xfffffe4, 0xfffffe5, 0xfffffe6, 0xfffffe7,
    0xfffffe8, 0xffffea, 0x3ffffffc, 0xfffffe9, 0xfffffea, 0x3ffffffd, 0xfffffeb, 0xfffffec,
    0xfffffed, 0xfffffee, 0xfffffef, 0xffffff0, 0xffffff1, 0xffffff2, 0x3ffffffe, 0xffffff3,
    0xffffff4, 0xffffff5, 0xffffff6, 0xffffff7, 0xffffff8, 0xffffff9, 0xffffffa, 0xffffffb,
    0x14, 0x3f8, 0x3f9, 0xffa, 0x1ff9, 0x15, 0xf8, 0x7fa,
    0x3fa, 0x3fb, 0xf9, 0x7fb, 0xfa, 0x16, 0x17, 0x18,
    0x0, 0x1, 0x2, 0x19, 0x1a, 0x1b, 0x1c, 0x1d,
    0x1e, 0x1f, 0x5c, 0xfb, 0x7ffc, 0x20, 0xffb, 0x3fc,
    0x1ffa, 0x21, 0x5d, 0x5e, 0x5f, 0x60, 0x61, 0x62,
    0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a,
    0x6b, 0x6c, 0x6d, 0x6e, 0x6f, 0x70, 0x71, 0x72,
    0xfc, 0x73, 0xfd, 0x1ffb, 0x7fff0, 0x1ffc, 0x3ffc, 0x22,
    0x7ffd, 0x3, 0x23, 0x4, 0x24, 0x5, 0x25, 0x26,
    0x27, 0x6, 0x74, 0x75, 0x28, 0x29, 0x2a, 0x7,
    0x2b, 0x76, 0x2c, 0x8, 0x9, 0x2d, 0x77, 0x78,
    0x79, 0x7a, 0x7b, 0x7ffe, 0x7fc, 0x3ffd, 0x1ffd, 0xffffffc,
    0xfffe6, 0x3fffd2, 0xfffe7, 0xfffe8, 0x3fffd3, 0x3fffd4, 0x3fffd5, 0x7fffd9,
    0x3fffd6, 0x7fffda, 0x7fffdb, 0x7fffdc, 0x7fffdd, 0x7fffde, 0xffffeb, 0x7fffdf,
    0xffffec, 0xffffed, 0x3fffd7, 0x7fffe0, 0xffffee, 0x7fffe1, 0x7fffe2, 0x7fffe3,
    0x7fffe4, 0x1fffdc, 0x3fffd8, 0x7fffe5, 0x3fffd9, 0x7fffe6, 0x7fffe7, 0xffffef,
    0x3fffda, 0x1fffdd, 0xfffe9, 0x3fffdb, 0x3fffdc, 0x7fffe8, 0x7fffe9, 0x1fffde,
    0x7fffea, 0x3fffdd, 0x3fffde, 0xfffff0, 0x1fffdf, 0x3fffdf, 0x7fffeb, 0x7fffec,
    0x1fffe0, 0x1fffe1, 0x3fffe0, 0x1fffe2, 0x7fffed, 0x3fffe1, 0x7fffee, 0x7fffef,
    0xfffea, 0x3fffe2, 0x3fffe3, 0x3fffe4, 0x7ffff0, 0x3fffe5, 0x3fffe6, 0x7ffff1,
    0x3ffffe0, 0x3ffffe1, 0xfffeb, 0x7fff1, 0x3fffe7, 0x7ffff2, 0x3fffe8, 0x1ffffec,
    0x3ffffe2, 0x3ffffe3, 0x3ffffe4, 0x7ffffde, 0x7ffffdf, 0x3ffffe5, 0xfffff1, 0x1ffffed,
    0x7fff2, 0x1fffe3, 0x3ffffe6, 0x7ffffe0, 0x7ffffe1, 0x3ffffe7, 0x7ffffe2, 0xfffff2,
    0x1fffe4, 0x1fffe5, 0x3ffffe8, 0x3ffffe9, 0xffffffd, 0x7ffffe3, 0x7ffffe4, 0x7ffffe5,
    0xfffec, 0xfffff3, 0xfffed, 0x1fffe6, 0x3fffe9, 0x1fffe7, 0x1fffe8, 0x7ffff3,
    0x3fffea, 0x3fffeb, 0x1ffffee, 0x1ffffef, 0xfffff4, 0xfffff5, 0x3ffffea, 0x7ffff4,
    0x3ffffeb, 0x7ffffe6, 0x3ffffec, 0x3ffffed, 0x7ffffe7, 0x7ffffe8, 0x7ffffe9, 0x7ffffea,
    0x7ffffeb, 0xffffffe, 0x7ffffec, 0x7ffffed, 0x7ffffee, 0x7ffffef, 0x7fffff0, 0x3ffffee,
    0x3fffffff)
  private[readers] val HuffLens: Array[Int] = Array(
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
    28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
    6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
    5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
    13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
    6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
    20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
    24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
    21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
    26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
    19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
    20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
    30)

  // Binary decode trie: flat int array, node i holds [left, right] at
  // 2i/2i+1; negative entries are -(symbol+1) leaves.
  private val trie: Array[Int] = {
    val nodes = scala.collection.mutable.ArrayBuffer(0, 0) // root
    def addNode(): Int = { nodes += 0; nodes += 0; nodes.length / 2 - 1 }
    var sym = 0
    while (sym <= 256) {
      val (code, len) = (HuffCodes(sym), HuffLens(sym))
      var node = 0
      var bit = len - 1
      while (bit >= 0) {
        val side = (code >>> bit) & 1
        val slot = node * 2 + side
        if (bit == 0) nodes(slot) = -(sym + 1)
        else {
          if (nodes(slot) == 0) nodes(slot) = addNode()
          node = nodes(slot)
        }
        bit -= 1
      }
      sym += 1
    }
    nodes.toArray
  }

  /** Decode a Huffman-coded string (RFC 7541 §5.2). The final
    * incomplete code must be a prefix of EOS (all 1-bits) and at most
    * 7 bits; a complete EOS code is a decoding error.
    */
  private[readers] def huffmanDecode(bytes: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len * 2)
    var node = 0
    var bitsSinceSym = 0
    var allOnes = true
    var i = from
    while (i < from + len) {
      val b = bytes(i) & 0xff
      var bit = 7
      while (bit >= 0) {
        val side = (b >>> bit) & 1
        val next = trie(node * 2 + side)
        require(next != 0, "hpack: invalid Huffman code")
        if (next < 0) {
          val sym = -next - 1
          if (sym == 256) throw new IllegalArgumentException("hpack: EOS symbol in Huffman string")
          out.write(sym)
          node = 0
          bitsSinceSym = 0
          allOnes = true
        } else {
          node = next
          bitsSinceSym += 1
          if (side == 0) allOnes = false
        }
        bit -= 1
      }
      i += 1
    }
    require(node == 0 || (allOnes && bitsSinceSym <= 7), "hpack: invalid Huffman padding")
    out.toByteArray
  }

  /** RFC 7541 Appendix A static table. */
  private[readers] val StaticTable: Vector[(String, String)] = Vector(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST", ":path" -> "/",
    ":path" -> "/index.html", ":scheme" -> "http", ":scheme" -> "https", ":status" -> "200",
    ":status" -> "204", ":status" -> "206", ":status" -> "304", ":status" -> "400",
    ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate", "accept-language" -> "", "accept-ranges" -> "",
    "accept" -> "", "access-control-allow-origin" -> "", "age" -> "", "allow" -> "",
    "authorization" -> "", "cache-control" -> "", "content-disposition" -> "",
    "content-encoding" -> "", "content-language" -> "", "content-length" -> "",
    "content-location" -> "", "content-range" -> "", "content-type" -> "", "cookie" -> "",
    "date" -> "", "etag" -> "", "expect" -> "", "expires" -> "", "from" -> "", "host" -> "",
    "if-match" -> "", "if-modified-since" -> "", "if-none-match" -> "", "if-range" -> "",
    "if-unmodified-since" -> "", "last-modified" -> "", "link" -> "", "location" -> "",
    "max-forwards" -> "", "proxy-authenticate" -> "", "proxy-authorization" -> "",
    "range" -> "", "referer" -> "", "refresh" -> "", "retry-after" -> "", "server" -> "",
    "set-cookie" -> "", "strict-transport-security" -> "", "transfer-encoding" -> "",
    "user-agent" -> "", "vary" -> "", "via" -> "", "www-authenticate" -> "")
}

/** Stateful per-connection HPACK decoder (dynamic table + size limit). */
final class HpackDecoder(maxTableSize: Int = 4096) {
  import Hpack._

  private var capacity = maxTableSize
  private var dynSize = 0
  private val dyn = scala.collection.mutable.ArrayDeque.empty[(String, String)]

  private def entrySize(e: (String, String)): Int = e._1.length + e._2.length + 32

  private def insert(e: (String, String)): Unit = {
    dyn.prepend(e)
    dynSize += entrySize(e)
    while (dynSize > capacity && dyn.nonEmpty) dynSize -= entrySize(dyn.removeLast())
    if (dynSize > capacity) dynSize = 0 // entry larger than table: empty table (RFC §4.4)
  }

  private def lookup(idx: Int): (String, String) = {
    require(idx >= 1, s"hpack: index 0 is invalid")
    if (idx <= StaticTable.length) StaticTable(idx - 1)
    else {
      val d = idx - StaticTable.length - 1
      require(d < dyn.length, s"hpack: index $idx beyond table (${dyn.length} dynamic entries)")
      dyn(d)
    }
  }

  /** Decode one header block into (name, value) pairs in order. Throws
    * IllegalArgumentException on any malformed construct — the caller
    * treats that as a stream error, never as absence of headers.
    */
  def decode(block: Array[Byte]): Seq[(String, String)] = {
    var pos = 0
    def readInt(prefixBits: Int): Int = {
      val max = (1 << prefixBits) - 1
      var v = block(pos) & max
      pos += 1
      if (v == max) {
        var shift = 0
        var cont = true
        while (cont) {
          require(pos < block.length, "hpack: truncated integer")
          val b = block(pos) & 0xff; pos += 1
          v += (b & 0x7f) << shift
          shift += 7
          cont = (b & 0x80) != 0
          require(shift <= 28, "hpack: integer overflow")
        }
      }
      v
    }
    def readString(): String = {
      require(pos < block.length, "hpack: truncated string")
      val huff = (block(pos) & 0x80) != 0
      val len = readInt(7)
      require(pos + len <= block.length, "hpack: string length beyond block")
      val s =
        if (huff) new String(huffmanDecode(block, pos, len), StandardCharsets.ISO_8859_1)
        else new String(block, pos, len, StandardCharsets.ISO_8859_1)
      pos += len
      s
    }
    val out = Seq.newBuilder[(String, String)]
    while (pos < block.length) {
      val b = block(pos) & 0xff
      if ((b & 0x80) != 0) { // indexed field
        out += lookup(readInt(7))
      } else if ((b & 0x40) != 0) { // literal with incremental indexing
        val idx = readInt(6)
        val name = if (idx == 0) readString() else lookup(idx)._1
        val value = readString()
        insert(name -> value)
        out += (name -> value)
      } else if ((b & 0x20) != 0) { // dynamic table size update
        val sz = readInt(5)
        require(sz <= maxTableSize, s"hpack: size update $sz above the declared max $maxTableSize")
        capacity = sz
        while (dynSize > capacity && dyn.nonEmpty) dynSize -= entrySize(dyn.removeLast())
      } else { // literal without indexing / never indexed (0x00 / 0x10)
        val idx = readInt(4)
        val name = if (idx == 0) readString() else lookup(idx)._1
        out += (name -> readString())
      }
    }
    out.result()
  }
}
