package graft.readers

import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** HPACK decoder spec. The Huffman constants are cross-checked against
  * the independent netty-codec-http2 copy of the same RFC 7541
  * Appendix B table (present on the Spark classpath), and the decode
  * grammar against the RFC's own worked examples (§C.4, §C.6).
  */
class HpackSpec extends AnyFunSuite {

  test("Huffman table matches the RFC constants shipped in netty-codec-http2") {
    val cls = Class.forName("io.netty.handler.codec.http2.HpackUtil")
    val fc = cls.getDeclaredField("HUFFMAN_CODES"); fc.setAccessible(true)
    val fl = cls.getDeclaredField("HUFFMAN_CODE_LENGTHS"); fl.setAccessible(true)
    val codes = fc.get(null).asInstanceOf[Array[Int]]
    val lens = fl.get(null).asInstanceOf[Array[Byte]]
    assert(codes.length == 257 && Hpack.HuffCodes.length == 257)
    (0 until 257).foreach { i =>
      assert(Hpack.HuffCodes(i) == codes(i), s"code mismatch at symbol $i")
      assert(Hpack.HuffLens(i) == lens(i).toInt, s"length mismatch at symbol $i")
    }
  }

  // Huffman-encode with the same table (test-side encoder: the decoder
  // under test must invert it for arbitrary bytes).
  private def huffEncode(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var acc = 0L
    var nbits = 0
    s.getBytes(StandardCharsets.ISO_8859_1).foreach { b =>
      val sym = b & 0xff
      acc = (acc << Hpack.HuffLens(sym)) | (Hpack.HuffCodes(sym).toLong & 0xffffffffL)
      nbits += Hpack.HuffLens(sym)
      while (nbits >= 8) { out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    if (nbits > 0) out.write((((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
    out.toByteArray
  }

  private def int(prefixBits: Int, firstByteFlags: Int, v: Int): Array[Byte] = {
    val max = (1 << prefixBits) - 1
    if (v < max) Array((firstByteFlags | v).toByte)
    else {
      val out = new ByteArrayOutputStream()
      out.write(firstByteFlags | max)
      var x = v - max
      while (x >= 128) { out.write((x % 128) + 128); x /= 128 }
      out.write(x)
      out.toByteArray
    }
  }
  private def plainStr(s: String): Array[Byte] =
    int(7, 0x00, s.length) ++ s.getBytes(StandardCharsets.ISO_8859_1)
  private def huffStr(s: String): Array[Byte] = {
    val h = huffEncode(s)
    int(7, 0x80, h.length) ++ h
  }

  test("RFC 7541 §C.4.1 worked example: Huffman-coded www.example.com") {
    // First request header block, fully Huffman: 8286 8441 8cf1e3 c2e5 f23a 6ba0 ab90 f4ff
    val block = Array[Int](
      0x82, 0x86, 0x84, 0x41, 0x8c, 0xf1, 0xe3, 0xc2, 0xe5, 0xf2, 0x3a, 0x6b, 0xa0, 0xab, 0x90, 0xf4, 0xff
    ).map(_.toByte)
    val headers = new HpackDecoder().decode(block)
    assert(headers == Seq(
      ":method" -> "GET", ":scheme" -> "http", ":path" -> "/",
      ":authority" -> "www.example.com"))
  }

  test("RFC 7541 §C.6.1 worked example: Huffman response with dynamic inserts") {
    val block = Array[Int](
      0x48, 0x82, 0x64, 0x02, 0x58, 0x85, 0xae, 0xc3, 0x77, 0x1a, 0x4b, 0x61, 0x96, 0xd0, 0x7a, 0xbe,
      0x94, 0x10, 0x54, 0xd4, 0x44, 0xa8, 0x20, 0x05, 0x95, 0x04, 0x0b, 0x81, 0x66, 0xe0, 0x82, 0xa6,
      0x2d, 0x1b, 0xff, 0x6e, 0x91, 0x9d, 0x29, 0xad, 0x17, 0x18, 0x63, 0xc7, 0x8f, 0x0b, 0x97, 0xc8,
      0xe9, 0xae, 0x82, 0xae, 0x43, 0xd3
    ).map(_.toByte)
    val d = new HpackDecoder(256)
    assert(d.decode(block) == Seq(
      ":status" -> "302",
      "cache-control" -> "private",
      "date" -> "Mon, 21 Oct 2013 20:13:21 GMT",
      "location" -> "https://www.example.com"))
  }

  test("indexed grpc trailers: incremental insert then back-reference") {
    val d = new HpackDecoder()
    // Block 1: literal with incremental indexing, new name grpc-status: 0
    val b1 = Array(0x40.toByte) ++ plainStr("grpc-status") ++ plainStr("0")
    assert(d.decode(b1) == Seq("grpc-status" -> "0"))
    // Block 2 (same connection): pure indexed reference to the insert (62)
    assert(d.decode(Array(0xbe.toByte)) == Seq("grpc-status" -> "0"))
  }

  test("Huffman-coded grpc-status name and value decode") {
    val block = Array(0x10.toByte) ++ huffStr("grpc-status") ++ huffStr("13") ++
      Array(0x10.toByte) ++ huffStr("grpc-message") ++ huffStr("internal error: shard 7 unavailable")
    val d = new HpackDecoder()
    assert(d.decode(block) == Seq(
      "grpc-status" -> "13", "grpc-message" -> "internal error: shard 7 unavailable"))
  }

  test("round-trips all byte values through Huffman") {
    val s = new String((0 until 256).map(_.toByte).toArray, StandardCharsets.ISO_8859_1)
    val enc = huffEncode(s)
    val dec = Hpack.huffmanDecode(enc, 0, enc.length)
    assert(dec.toSeq == s.getBytes(StandardCharsets.ISO_8859_1).toSeq)
  }

  test("dynamic table eviction under a size update keeps decoding sound") {
    val d = new HpackDecoder(4096)
    // insert two entries, shrink the table to zero, then the index must die
    d.decode(Array(0x40.toByte) ++ plainStr("a") ++ plainStr("1") ++
      Array(0x40.toByte) ++ plainStr("b") ++ plainStr("2"))
    assert(d.decode(Array(0xbe.toByte)) == Seq("b" -> "2"))
    d.decode(Array(0x20.toByte)) // size update to 0 → evict all
    intercept[IllegalArgumentException] { d.decode(Array(0xbe.toByte)) }
  }

  test("malformed blocks throw rather than decode to nothing") {
    intercept[IllegalArgumentException] { new HpackDecoder().decode(Array(0xff.toByte)) } // truncated int
    intercept[IllegalArgumentException] {
      new HpackDecoder().decode(Array(0x00.toByte, 0x85.toByte, 0xff.toByte)) // truncated string
    }
    // EOS inside a Huffman string is an explicit error
    val eos = Array(0x84.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    intercept[IllegalArgumentException] { new HpackDecoder().decode(Array(0x00.toByte, 0x01.toByte, 'x'.toByte) ++ eos) }
  }
}
