package graft.readers

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** Drives the native RFC 6455 client against an in-process fake server
  * (ServerSocket performing the real Upgrade handshake and framing),
  * the same loopback pattern as the MQTT / Redis specs.
  */
class WebSocketReaderSpec extends SparkSpec {

  /** Unmasked server frame (servers MUST NOT mask). */
  private def serverFrame(opcode: Int, payload: Array[Byte], fin: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((if (fin) 0x80 else 0x00) | opcode)
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < 65536) { out.write(126); out.write(n >> 8); out.write(n & 0xff) }
    else fail("test frames stay under 64k")
    out.write(payload)
    out.toByteArray
  }

  /** Read one masked client frame: (opcode, unmasked payload). */
  private def readClientFrame(in: InputStream): (Int, Array[Byte]) = {
    val b0 = in.read()
    val opcode = b0 & 0x0f
    val b1 = in.read()
    require((b1 & 0x80) != 0, "client frames must be masked")
    val len7 = b1 & 0x7f
    val len =
      if (len7 < 126) len7
      else if (len7 == 126) { val e = in.readNBytes(2); ((e(0) & 0xff) << 8) | (e(1) & 0xff) }
      else fail("unexpected 64-bit length from client")
    val key = in.readNBytes(4)
    val payload = in.readNBytes(len)
    payload.indices.foreach(i => payload(i) = (payload(i) ^ key(i % 4)).toByte)
    (opcode, payload)
  }

  private val binaryPayload: Array[Byte] = Array.tabulate(300)(i => (i % 251).toByte)

  /** Handshake, then: text, long binary (16-bit length path), ping
    * (expects pong back), fragmented text, close handshake.
    */
  private def serve(sock: java.net.Socket, sawPong: java.util.concurrent.atomic.AtomicBoolean): Unit = {
    val in: InputStream = sock.getInputStream
    val out: OutputStream = sock.getOutputStream
    try {
      // real handshake: parse the request, compute the accept token
      val reqBuf = new StringBuilder
      var headersDone = false
      while (!headersDone) {
        val b = in.read()
        require(b >= 0, "client closed before finishing the request")
        reqBuf.append(b.toChar)
        headersDone = reqBuf.endsWith("\r\n\r\n")
      }
      val key = reqBuf.toString.split("\r\n")
        .find(_.toLowerCase.startsWith("sec-websocket-key:"))
        .map(_.split(":", 2)(1).trim)
        .getOrElse(fail("client sent no Sec-WebSocket-Key"))
      out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${WebSocketReader.acceptFor(key)}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1))
      out.flush()

      out.write(serverFrame(1, "hello".getBytes(StandardCharsets.UTF_8)))
      out.write(serverFrame(2, binaryPayload))
      out.write(serverFrame(9, "pi".getBytes(StandardCharsets.UTF_8))) // ping
      out.flush()
      val (pongOp, pongPayload) = readClientFrame(in)
      if (pongOp == 10 && new String(pongPayload, StandardCharsets.UTF_8) == "pi") sawPong.set(true)
      out.write(serverFrame(1, "fra".getBytes(StandardCharsets.UTF_8), fin = false))
      out.write(serverFrame(0, "gment".getBytes(StandardCharsets.UTF_8)))
      out.write(serverFrame(8, Array[Byte](0x03, 0xe8.toByte))) // close 1000
      out.flush()
      readClientFrame(in) // close echo (or client-initiated close)
      ()
    } catch { case _: Throwable => () } finally sock.close()
  }

  test("websocket reader collects text, binary, and fragmented messages") {
    val server = new ServerSocket(0)
    val sawPong = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      try while (true) { val s = server.accept(); new Thread(() => serve(s, sawPong)).start() }
      catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val df = WebSocketReader.read(spark, s"ws://127.0.0.1:${server.getLocalPort}/feed?room=1",
        maxMessages = 3, timeoutMs = 10000)
      val rows = df.collect()
      assert(rows.length == 3)
      assert(rows(0).getString(0) == "text" && rows(0).getString(2) == "hello")
      assert(rows(1).getString(0) == "binary" &&
        rows(1).getAs[Array[Byte]](1).toSeq == binaryPayload.toSeq)
      assert(rows(2).getString(0) == "text" && rows(2).getString(2) == "fragment")
      assert(sawPong.get(), "server never received the pong reply")
    } finally server.close()
  }

  test("frame codec round-trips all three length encodings") {
    val mask = Array[Byte](1, 2, 3, 4)
    for (n <- Seq(0, 1, 125, 126, 65535, 65536)) {
      val payload = Array.tabulate(n)(i => (i % 256).toByte)
      val enc = WebSocketReader.clientFrame(2, payload, mask)
      val Some((fin, op, dec)) =
        WebSocketReader.readFrame(new java.io.ByteArrayInputStream(enc))
      assert(fin && op == 2)
      assert(dec.toSeq == payload.toSeq, s"length $n")
    }
  }

  test("accept token matches the RFC 6455 worked example") {
    // RFC 6455 §1.3: key "dGhlIHNhbXBsZSBub25jZQ==" → this accept value
    assert(WebSocketReader.acceptFor("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("websocket reader is registered and ws:// urls are detected") {
    val (ok, _) = SparkReaders.recommend(graft.datatypes.DataRef("websocket", "ws://h:80/feed"))
    assert(ok.exists(_.name == "websocket_reader"))
    val kinds = graft.datatypes.Detect.recommend("wss://stream.example.org/v1/ticker")
    assert(kinds.exists(_.kind.name == "websocket"))
  }
}
