package graft.readers

import graft.datatypes.DataRef
import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Native Arrow Flight `DoGet` client (reference `readers.py:3288`
  * ArrowFlightReader, which delegates to pyarrow.flight): speaks the
  * wire stack directly — h2c HTTP/2 framing (preface, SETTINGS,
  * HEADERS with hand-encoded HPACK literals, DATA, WINDOW_UPDATE flow
  * control), gRPC length-prefixed messages over the DATA stream, and
  * the Flight protobufs (`Ticket` out, `FlightData` back). The
  * `FlightData` header/body pairs are re-framed into a standard Arrow
  * IPC stream and decoded by [[ArrowIPC.decode]], so the payload path
  * is shared with the file reader.
  *
  * Protocol subset, from the public specs (RFC 7540/7541, gRPC
  * PROTOCOL-HTTP2, Flight.proto):
  *  - HPACK: every header is SENT "literal, never indexed" (0x10
  *    prefix, plain octets) — always legal, no dynamic table for the
  *    peer to track. Response header blocks are fully DECODED through
  *    [[HpackDecoder]] (static+dynamic tables, Huffman) — real gRPC
  *    servers index and Huffman-code `grpc-status`, and a mid-stream
  *    error must never pass as silently truncated success; an
  *    undecodable header block is a stream error, not an absence of
  *    trailers.
  *  - Flow control: WINDOW_UPDATE for the connection and the stream
  *    after every DATA frame, so responses larger than the 64 KiB
  *    initial window stream through.
  *  - `FlightData` fields: 2 = data_header (encapsulated IPC message
  *    metadata), 1000 = data_body; 1/3 skipped. The rebuilt stream is
  *    `[0xFFFFFFFF][len][metadata pad8][body]*` + end-of-stream marker.
  *
  * Scale shape: one bounded stream collects driver-side like the other
  * service readers. A sharded Flight dataset (one endpoint per
  * partition from `GetFlightInfo`) would map endpoints to executor
  * tasks; single-ticket DoGet is the reference reader's semantics.
  *
  * The transport is injectable; specs run a loopback fake server.
  */
object ArrowFlightReader {

  type Transport = Net.Transport

  /** (host, port, tls) → transport. */
  type TransportFactory = (String, Int, Boolean) => Transport

  def socketTransport(soTimeoutMs: Int): TransportFactory =
    (host, port, tls) => Net.socket(host, port, tls, soTimeoutMs, alpn = Seq("h2"))

  // --------------------------------------------------------- HTTP/2 frames

  private val Preface = "PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)

  private[readers] def h2Frame(typ: Int, flags: Int, streamId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(9 + payload.length)
    out.write((payload.length >> 16) & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write(payload.length & 0xff)
    out.write(typ)
    out.write(flags)
    out.write((streamId >> 24) & 0x7f)
    out.write((streamId >> 16) & 0xff)
    out.write((streamId >> 8) & 0xff)
    out.write(streamId & 0xff)
    out.write(payload)
    out.toByteArray
  }

  /** (type, flags, streamId, payload); None on EOF at a frame boundary. */
  private[readers] def readH2Frame(in: InputStream): Option[(Int, Int, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val hdr = in.readNBytes(8)
    require(hdr.length == 8, "truncated HTTP/2 frame header")
    val len = (b0 << 16) | ((hdr(0) & 0xff) << 8) | (hdr(1) & 0xff)
    require(len <= 16 * 1024 * 1024, s"HTTP/2 frame too large ($len)")
    val typ = hdr(2) & 0xff
    val flags = hdr(3) & 0xff
    val streamId = ((hdr(4) & 0x7f) << 24) | ((hdr(5) & 0xff) << 16) | ((hdr(6) & 0xff) << 8) | (hdr(7) & 0xff)
    val payload = in.readNBytes(len)
    require(payload.length == len, "truncated HTTP/2 frame payload")
    Some((typ, flags, streamId, payload))
  }

  /** HPACK "literal header field never indexed, new name": no dynamic
    * table, no Huffman — always-valid plain octets (RFC 7541 §6.2.3).
    */
  private[readers] def hpackLiteral(name: String, value: String): Array[Byte] = {
    def str(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.ISO_8859_1)
      require(b.length < 127, s"header too long: $name")
      Array(b.length.toByte) ++ b
    }
    Array(0x10.toByte) ++ str(name) ++ str(value)
  }

  // --------------------------------------------------------- protobuf codec

  private[readers] def varint(n: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream(10)
    var x = n
    do {
      val digit = (x & 0x7f).toInt
      x >>>= 7
      out.write(if (x != 0) digit | 0x80 else digit)
    } while (x != 0)
    out.toByteArray
  }

  /** Length-delimited fields of a protobuf message, keyed by field
    * number (repeated fields keep every occurrence, in order).
    */
  private[readers] def protoFields(bytes: Array[Byte]): Map[Int, Seq[Array[Byte]]] = {
    var p = 0
    def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var cont = true
      while (cont) {
        require(p < bytes.length, "truncated protobuf varint")
        val b = bytes(p); p += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        cont = (b & 0x80) != 0
      }
      v
    }
    val out = scala.collection.mutable.Map.empty[Int, Vector[Array[Byte]]]
    while (p < bytes.length) {
      val tag = readVarint()
      val field = (tag >>> 3).toInt
      (tag & 7) match {
        case 2 =>
          val len = readVarint().toInt
          require(len >= 0 && p + len <= bytes.length, "truncated protobuf bytes field")
          out(field) = out.getOrElse(field, Vector.empty) :+ java.util.Arrays.copyOfRange(bytes, p, p + len)
          p += len
        case 0 => readVarint(); ()
        case 5 => p += 4
        case 1 => p += 8
        case w => throw new IllegalArgumentException(s"unsupported protobuf wire type $w")
      }
    }
    out.toMap
  }

  // --------------------------------------------------------- read

  private val DoGetPath = "/arrow.flight.protocol.FlightService/DoGet"

  /** DoGet `grpc://host:port?ticket=...` (or options("ticket")) into a
    * DataFrame via the shared Arrow IPC decode.
    */
  def read(
      spark: SparkSession,
      url: String,
      ticketOpt: Option[String] = None,
      timeoutMs: Int = 15000,
      transport: TransportFactory = null
  ): DataFrame = {
    val uri = new URI(url)
    val tls = uri.getScheme == "grpc+tls"
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 8815
    // RAW query, decoded exactly once: getQuery pre-decodes, so a second
    // URLDecoder pass corrupted '+'/'%'-bearing tickets, and an encoded
    // '&' (%26) split the ticket early
    val ticket = ticketOpt
      .orElse(Option(uri.getRawQuery).flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith("ticket=") => java.net.URLDecoder.decode(kv.substring(7), "UTF-8")
      }))
      .orElse(Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(s"no flight ticket in $url (use ?ticket=...)"))

    val factory = Option(transport).getOrElse(socketTransport(timeoutMs))
    val t = factory(host, port, tls)
    val grpcPayload = new ByteArrayOutputStream()
    try {
      // -- connection setup + request (one write burst; servers read lazily)
      t.out.write(Preface)
      t.out.write(h2Frame(0x4, 0, 0, Array.empty)) // SETTINGS
      val headers = Array(
        hpackLiteral(":method", "POST"),
        hpackLiteral(":scheme", if (tls) "https" else "http"),
        hpackLiteral(":path", DoGetPath),
        hpackLiteral(":authority", s"$host:$port"),
        hpackLiteral("content-type", "application/grpc"),
        hpackLiteral("te", "trailers")
      ).reduce(_ ++ _)
      t.out.write(h2Frame(0x1, 0x4, 1, headers)) // HEADERS, END_HEADERS
      val ticketProto = {
        val tb = ticket.getBytes(StandardCharsets.UTF_8)
        Array(0x0a.toByte) ++ varint(tb.length) ++ tb // Ticket.ticket = 1
      }
      val grpcMsg = Array(0.toByte) ++ // uncompressed
        Array(((ticketProto.length >> 24) & 0xff).toByte, ((ticketProto.length >> 16) & 0xff).toByte,
          ((ticketProto.length >> 8) & 0xff).toByte, (ticketProto.length & 0xff).toByte) ++ ticketProto
      t.out.write(h2Frame(0x0, 0x1, 1, grpcMsg)) // DATA, END_STREAM
      t.out.flush()

      // -- response: accumulate our stream's DATA bytes until END_STREAM.
      // Errors must not pass as truncated success: RST_STREAM throws,
      // GOAWAY before the stream completed throws, EOF before END_STREAM
      // throws, and a non-zero grpc-status in any decoded header block
      // (initial trailers-only response or trailers proper) throws.
      val hpack = new HpackDecoder()
      val headerBlock = new ByteArrayOutputStream()
      var headerEndStream = false
      var done = false
      var endStream = false
      var trailerStatus: Option[Int] = None
      var trailerMessage: Option[String] = None
      def decodeHeaderBlock(): Unit = {
        val headers =
          try hpack.decode(headerBlock.toByteArray)
          catch {
            case e: IllegalArgumentException =>
              throw new java.io.IOException(s"flight: undecodable header block (${e.getMessage})")
          }
        headerBlock.reset()
        headers.collectFirst { case ("grpc-status", v) =>
          scala.util.Try(v.trim.toInt).getOrElse(
            throw new java.io.IOException(s"flight: non-numeric grpc-status '$v'"))
        }.foreach(s => trailerStatus = Some(s))
        headers.collectFirst { case ("grpc-message", v) => v }.foreach(m => trailerMessage = Some(m))
        if (headerEndStream) { endStream = true; done = true }
      }
      while (!done) {
        readH2Frame(t.in) match {
          case None =>
            if (!endStream) throw new java.io.IOException("connection closed before flight stream completed")
            done = true
          case Some((typ, flags, streamId, payload)) =>
            typ match {
              case 0x0 if streamId == 1 => // DATA
                // PADDED (0x8): payload leads with a pad-length byte and
                // trails with that many padding bytes — both must be
                // stripped or the gRPC length-prefix framing desyncs
                val data =
                  if ((flags & 0x8) != 0 && payload.nonEmpty) {
                    val padLen = payload(0) & 0xff
                    require(padLen < payload.length, "HTTP/2 DATA padding exceeds frame")
                    java.util.Arrays.copyOfRange(payload, 1, payload.length - padLen)
                  } else payload
                grpcPayload.write(data)
                if ((flags & 0x1) != 0) { endStream = true; done = true } // END_STREAM
                else if (payload.nonEmpty) {
                  // replenish both flow-control windows
                  val inc = h2Frame(0x8, 0, 0, intBE(payload.length)) ++
                    h2Frame(0x8, 0, 1, intBE(payload.length))
                  t.out.write(inc)
                  t.out.flush()
                }
              case 0x1 if streamId == 1 => // HEADERS
                // strip PADDED (0x8: leading pad-length byte + trailing
                // padding) and PRIORITY (0x20: 4-byte dependency + weight)
                var off = 0
                var end = payload.length
                if ((flags & 0x8) != 0 && payload.nonEmpty) {
                  val pad = payload(0) & 0xff
                  off = 1; end = payload.length - pad
                  require(end >= off, "HTTP/2 HEADERS padding exceeds frame")
                }
                if ((flags & 0x20) != 0) off += 5
                require(end >= off, "HTTP/2 HEADERS priority fields exceed frame")
                headerBlock.write(payload, off, end - off)
                if ((flags & 0x1) != 0) headerEndStream = true // END_STREAM
                if ((flags & 0x4) != 0) decodeHeaderBlock()    // END_HEADERS
              case 0x9 if streamId == 1 => // CONTINUATION of the open block
                headerBlock.write(payload, 0, payload.length)
                if ((flags & 0x4) != 0) decodeHeaderBlock()
              case 0x1 | 0x9 => // other stream's headers — not ours
              case 0x4 => // SETTINGS: ack non-acks
                if ((flags & 0x1) == 0) { t.out.write(h2Frame(0x4, 0x1, 0, Array.empty)); t.out.flush() }
              case 0x6 => // PING: echo with ack flag
                if ((flags & 0x1) == 0) { t.out.write(h2Frame(0x6, 0x1, 0, payload)); t.out.flush() }
              case 0x3 => // RST_STREAM
                throw new java.io.IOException(s"flight stream reset (code ${intFromBE(payload)})")
              case 0x7 => // GOAWAY: error code is bytes 4-8 of the payload
                if (!endStream) {
                  val code = if (payload.length >= 8) intFromBE(java.util.Arrays.copyOfRange(payload, 4, 8)) else -1
                  throw new java.io.IOException(s"flight server sent GOAWAY (code $code) before stream completed")
                }
                done = true
              case _ => // WINDOW_UPDATE / PRIORITY / unknown — ignore
            }
        }
      }
      trailerStatus.filter(_ != 0).foreach { st =>
        val msg = trailerMessage.map(m => s" (${m})").getOrElse("")
        throw new java.io.IOException(s"flight DoGet failed: grpc-status $st$msg")
      }
    } finally t.close()

    // -- gRPC messages → FlightData protos → one Arrow IPC stream
    val bytes = grpcPayload.toByteArray
    val ipc = new ByteArrayOutputStream()
    var p = 0
    var nMessages = 0
    while (p + 5 <= bytes.length) {
      require(bytes(p) == 0, "compressed gRPC messages not supported")
      val len = ((bytes(p + 1) & 0xff) << 24) | ((bytes(p + 2) & 0xff) << 16) |
        ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
      require(p + 5 + len <= bytes.length, "truncated gRPC message")
      val fields = protoFields(java.util.Arrays.copyOfRange(bytes, p + 5, p + 5 + len))
      p += 5 + len
      fields.get(2).flatMap(_.headOption).foreach { header =>
        val body = fields.get(1000).flatMap(_.headOption).getOrElse(Array.empty[Byte])
        val pad = (8 - ((8 + header.length) % 8)) % 8
        ipc.write(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))
        ipc.write(intLE(header.length + pad)) // IPC length prefixes are little-endian
        ipc.write(header)
        ipc.write(new Array[Byte](pad))
        ipc.write(body)
        nMessages += 1
      }
    }
    require(nMessages > 0, s"flight DoGet returned no data messages for ticket '$ticket'")
    ipc.write(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))
    ipc.write(intLE(0)) // end-of-stream

    val (fieldsArrow, rows) = ArrowIPC.decode(ipc.toByteArray)
    val schema = StructType(fieldsArrow.map(f =>
      StructField(f.getName, ArrowIPC.arrowToSparkType(f), nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), math.max(1, math.min(rows.size, 8))),
      schema)
  }

  private def intBE(n: Int): Array[Byte] =
    Array(((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte, ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
  private def intLE(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
  private def intFromBE(b: Array[Byte]): Int =
    if (b.length < 4) -1 else ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)
}

class ArrowFlightReaderImpl extends Reader {
  val name = "arrow_flight_reader"
  val implementsKinds = Set("arrow_flight")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    ArrowFlightReader.read(spark, ref.url,
      ticketOpt = ref.options.get("ticket"),
      timeoutMs = ref.options.getOrElse("timeout_ms", "15000").toInt)
}
