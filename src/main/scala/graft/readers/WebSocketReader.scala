package graft.readers

import graft.datatypes.DataRef
import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import java.util.Base64
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native WebSocket reader (reference `datatypes.py:1659` WebSocketStream,
  * whose reader collects a bounded message batch from a `ws://`/`wss://`
  * endpoint): speaks RFC 6455 directly — HTTP/1.1 Upgrade handshake with
  * `Sec-WebSocket-Accept` verification, client-masked frames, text /
  * binary / continuation reassembly, ping→pong, and the close handshake —
  * then collects messages until `maxMessages` arrive or `timeoutMs`
  * elapses, the same bounded-subscribe semantics as [[MqttReader]].
  *
  * Rows are `(kind, payload, payload_str)`: `kind` is `text` or `binary`,
  * `payload` the raw message bytes, `payload_str` the UTF-8 decode (the
  * overwhelmingly common JSON-stream case — `spark.read.json` lifts it).
  *
  * Scale shape: a bounded batch collects driver-side like the other
  * service readers — a websocket is a control/telemetry endpoint, not
  * the 100 TB fact path; an unbounded subscription belongs in Structured
  * Streaming via a broker bridge.
  *
  * The transport is injectable (the [[MqttReader.Transport]] contract):
  * production opens a (TLS) socket, specs run a loopback fake server.
  */
object WebSocketReader {

  type Transport = Net.Transport

  /** (host, port, tls) → transport. */
  type TransportFactory = (String, Int, Boolean) => Transport

  def socketTransport(soTimeoutMs: Int): TransportFactory =
    (host, port, tls) => Net.socket(host, port, tls, soTimeoutMs)

  // ------------------------------------------------------------- framing

  private val AcceptGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** base64(sha1(key + GUID)) — what the server must echo back. */
  private[readers] def acceptFor(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
    Base64.getEncoder.encodeToString(sha.digest((key + AcceptGuid).getBytes(StandardCharsets.UTF_8)))
  }

  /** One client frame: FIN set, payload masked (mandatory for clients). */
  private[readers] def clientFrame(opcode: Int, payload: Array[Byte], maskKey: Array[Byte]): Array[Byte] = {
    require(maskKey.length == 4, "mask key must be 4 bytes")
    val out = new ByteArrayOutputStream(payload.length + 14)
    out.write(0x80 | (opcode & 0x0f))
    val n = payload.length
    if (n < 126) out.write(0x80 | n)
    else if (n < 65536) { out.write(0x80 | 126); out.write(n >> 8); out.write(n & 0xff) }
    else {
      out.write(0x80 | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    out.write(maskKey)
    var i = 0
    while (i < n) { out.write(payload(i) ^ maskKey(i % 4)); i += 1 }
    out.toByteArray
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = in.readNBytes(n)
    require(buf.length == n, s"truncated WebSocket frame ($n expected, ${buf.length} read)")
    buf
  }

  /** One server frame: (fin, opcode, payload). Servers MUST NOT mask,
    * but a masked frame is tolerated and unmasked.
    */
  private[readers] def readFrame(in: InputStream): Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val b1 = in.read()
    require(b1 >= 0, "truncated WebSocket frame header")
    val masked = (b1 & 0x80) != 0
    val len7 = b1 & 0x7f
    val len: Long =
      if (len7 < 126) len7
      else if (len7 == 126) {
        val e = readFully(in, 2)
        ((e(0) & 0xffL) << 8) | (e(1) & 0xffL)
      } else {
        val e = readFully(in, 8)
        var v = 0L
        var i = 0
        while (i < 8) { v = (v << 8) | (e(i) & 0xffL); i += 1 }
        v
      }
    require(len <= 64 * 1024 * 1024, s"WebSocket frame too large ($len)")
    val key = if (masked) readFully(in, 4) else null
    val payload = readFully(in, len.toInt)
    if (masked) {
      var i = 0
      while (i < payload.length) { payload(i) = (payload(i) ^ key(i % 4)).toByte; i += 1 }
    }
    Some((fin, opcode, payload))
  }

  // ------------------------------------------------------------- read

  /** Read `wss?://host[:port]/path` into (kind, payload, payload_str)
    * rows, one per complete (possibly fragmented) text/binary message.
    */
  def read(
      spark: SparkSession,
      url: String,
      maxMessages: Int = 100,
      timeoutMs: Int = 10000,
      transport: TransportFactory = null
  ): DataFrame = {
    import spark.implicits._
    val uri = new URI(url)
    val tls = uri.getScheme == "wss"
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else if (tls) 443 else 80
    val path = {
      val p = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
      p + Option(uri.getRawQuery).map("?" + _).getOrElse("")
    }
    val factory = Option(transport).getOrElse(socketTransport(timeoutMs))
    val t = factory(host, port, tls)
    val messages = Seq.newBuilder[(String, Array[Byte])]
    var n = 0
    try {
      // -- handshake
      val keyBytes = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(keyBytes)
      val key = Base64.getEncoder.encodeToString(keyBytes)
      val request =
        s"GET $path HTTP/1.1\r\n" +
          s"Host: $host:$port\r\n" +
          "Upgrade: websocket\r\n" +
          "Connection: Upgrade\r\n" +
          s"Sec-WebSocket-Key: $key\r\n" +
          "Sec-WebSocket-Version: 13\r\n\r\n"
      t.out.write(request.getBytes(StandardCharsets.ISO_8859_1))
      t.out.flush()
      val headers = readHttpHeaders(t.in)
      require(headers.headOption.exists(_.contains(" 101 ")),
        s"WebSocket upgrade refused: ${headers.headOption.getOrElse("(no response)")}")
      val accept = headers.collectFirst {
        case h if h.toLowerCase.startsWith("sec-websocket-accept:") => h.substring(h.indexOf(':') + 1).trim
      }
      require(accept.contains(acceptFor(key)), "Sec-WebSocket-Accept mismatch")

      // -- bounded collect
      val mask = Array[Byte](0x21, 0x43, 0x65, 0x7a) // any value is valid; fixed = reproducible frames
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var done = false
      var fragOpcode = 0
      val frag = new ByteArrayOutputStream()
      while (!done && n < maxMessages && System.nanoTime() < deadline) {
        // a timeout anywhere in a frame ends the bounded collect — the
        // partial frame is unusable and already-collected messages must
        // survive (same contract as MqttReader)
        val frameOpt =
          try readFrame(t.in)
          catch { case _: java.net.SocketTimeoutException => None }
        frameOpt match {
          case None => done = true
          case Some((fin, opcode, payload)) =>
            opcode match {
              case 1 | 2 => // text | binary
                if (fin) {
                  messages += ((if (opcode == 1) "text" else "binary", payload))
                  n += 1
                } else { fragOpcode = opcode; frag.reset(); frag.write(payload) }
              case 0 => // continuation
                frag.write(payload)
                if (fin && fragOpcode != 0) {
                  messages += ((if (fragOpcode == 1) "text" else "binary", frag.toByteArray))
                  n += 1
                  fragOpcode = 0
                }
              case 8 => // close: echo the status code back, then stop
                t.out.write(clientFrame(8, payload.take(2), mask))
                t.out.flush()
                done = true
              case 9 => // ping → pong with the same payload
                t.out.write(clientFrame(10, payload, mask))
                t.out.flush()
              case 10 => // pong — ignore
              case _ => // unknown control frame — ignore
            }
        }
      }
      if (!done) {
        // client-initiated close handshake: status 1000 (normal). The
        // drain honors the overall deadline and a frame cap — against a
        // firehose endpoint the server keeps streaming data frames after
        // our close, and an unbounded drain would hold read() open far
        // past timeoutMs (the bounded-collect contract).
        t.out.write(clientFrame(8, Array[Byte](0x03, 0xe8.toByte), mask))
        t.out.flush()
        try {
          // non-blocking drain: consume only frames ALREADY buffered
          // (available() never blocks), looking for the close echo. A
          // quiet server that never echoes must not hold a logically-
          // finished read open for another socket timeout, and RFC 6455
          // permits closing the transport when the echo doesn't arrive
          // timely. Brief grace sleep lets an in-flight echo land.
          Thread.sleep(50)
          var closed = false
          var drained = 0
          while (!closed && drained < 1000 && t.in.available() > 0) {
            closed = readFrame(t.in).forall(_._2 == 8)
            drained += 1
          }
        } catch { case _: Throwable => () }
      }
    } finally t.close()
    messages.result().toDF("kind", "payload").withColumn("payload_str",
      org.apache.spark.sql.functions.col("payload").cast("string"))
  }

  private def readHttpHeaders(in: InputStream): Seq[String] = {
    val buf = new ByteArrayOutputStream()
    var prev3 = 0; var prev2 = 0; var prev1 = 0
    var b = in.read()
    while (b >= 0) {
      buf.write(b)
      if (prev3 == '\r' && prev2 == '\n' && prev1 == '\r' && b == '\n') b = -2
      else { prev3 = prev2; prev2 = prev1; prev1 = b; b = in.read() }
    }
    require(b == -2, "connection closed before HTTP upgrade response completed")
    new String(buf.toByteArray, StandardCharsets.ISO_8859_1).split("\r\n").toSeq
  }
}

class WebSocketReaderImpl extends Reader {
  val name = "websocket_reader"
  val implementsKinds = Set("websocket")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    WebSocketReader.read(spark, ref.url,
      maxMessages = ref.options.getOrElse("max_messages", "100").toInt,
      timeoutMs = ref.options.getOrElse("timeout_ms", "10000").toInt)
}
