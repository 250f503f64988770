package graft.readers

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.ServerSocket
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

/** Drives the hand-rolled h2c gRPC Flight client against an in-process
  * fake Flight server: real HTTP/2 frames, real gRPC message framing,
  * real FlightData protos whose header/body pairs come from splitting a
  * genuine Arrow IPC stream (flatbuffer bodyLength walk). The gRPC
  * response is deliberately split across DATA frames at a mid-message
  * boundary to exercise reassembly.
  */
class ArrowFlightReaderSpec extends SparkSpec {

  // ---------------------------------------------------------- arrow fixture

  /** A 3-row (id: int64, name: utf8) table as Arrow IPC stream bytes. */
  private def arrowStream(): Array[Byte] = {
    val alloc = new RootAllocator()
    try {
      val schema = new Schema(java.util.List.of(
        new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
        new Field("name", FieldType.nullable(new ArrowType.Utf8()), null)))
      val root = VectorSchemaRoot.create(schema, alloc)
      try {
        root.allocateNew()
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val names = root.getVector("name").asInstanceOf[VarCharVector]
        Seq(1L, 2L, 3L).zipWithIndex.foreach { case (v, i) => ids.setSafe(i, v) }
        Seq("alpha", "beta", "gamma").zipWithIndex.foreach { case (s, i) =>
          names.setSafe(i, s.getBytes(StandardCharsets.UTF_8))
        }
        root.setRowCount(3)
        val bos = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(bos))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        bos.toByteArray
      } finally root.close()
    } finally alloc.close()
  }

  /** Split an IPC stream into (metadata, body) encapsulated messages —
    * body length read from the Message flatbuffer, the same walk a real
    * Flight server performs to fill FlightData.
    */
  private def splitIpcMessages(stream: Array[Byte]): Seq[(Array[Byte], Array[Byte])] = {
    // encapsulated-message length prefixes are little-endian (IPC spec)
    def le32(i: Int) = (stream(i) & 0xff) | ((stream(i + 1) & 0xff) << 8) |
      ((stream(i + 2) & 0xff) << 16) | ((stream(i + 3) & 0xff) << 24)
    val out = Seq.newBuilder[(Array[Byte], Array[Byte])]
    var p = 0
    var done = false
    while (!done && p + 4 <= stream.length) {
      var len = le32(p); p += 4
      if (len == -1) { len = le32(p); p += 4 } // continuation marker
      if (len == 0) done = true
      else {
        val meta = java.util.Arrays.copyOfRange(stream, p, p + len); p += len
        val msg = org.apache.arrow.flatbuf.Message.getRootAsMessage(java.nio.ByteBuffer.wrap(meta))
        val padded = ((msg.bodyLength().toInt + 7) / 8) * 8
        val body = java.util.Arrays.copyOfRange(stream, p, p + padded); p += padded
        out += ((meta, body))
      }
    }
    out.result()
  }

  private def flightDataProto(meta: Array[Byte], body: Array[Byte]): Array[Byte] = {
    val f2 = Array(0x12.toByte) ++ ArrowFlightReader.varint(meta.length) ++ meta
    val f1000 =
      if (body.isEmpty) Array.empty[Byte]
      else ArrowFlightReader.varint((1000L << 3) | 2) ++ ArrowFlightReader.varint(body.length) ++ body
    f2 ++ f1000
  }

  private def grpcMessage(proto: Array[Byte]): Array[Byte] =
    Array(0.toByte,
      ((proto.length >> 24) & 0xff).toByte, ((proto.length >> 16) & 0xff).toByte,
      ((proto.length >> 8) & 0xff).toByte, (proto.length & 0xff).toByte) ++ proto

  // ---------------------------------------------------------- fake server

  /** Reads preface + request frames until END_STREAM, verifies the
    * ticket, then streams the response with the gRPC bytes split across
    * two DATA frames mid-message.
    */
  private def serve(sock: java.net.Socket, expectTicket: String,
      gotTicket: java.util.concurrent.atomic.AtomicReference[String]): Unit = {
    val in: InputStream = sock.getInputStream
    val out: OutputStream = sock.getOutputStream
    try {
      require(in.readNBytes(24).length == 24, "no h2c preface")
      var requestData: Array[Byte] = Array.empty
      var streamDone = false
      while (!streamDone) {
        ArrowFlightReader.readH2Frame(in) match {
          case None => streamDone = true
          case Some((typ, flags, streamId, payload)) =>
            if (typ == 0x4 && (flags & 1) == 0) out.write(ArrowFlightReader.h2Frame(0x4, 0x1, 0, Array.empty))
            if (typ == 0x0 && streamId == 1) {
              requestData ++= payload
              if ((flags & 0x1) != 0) streamDone = true
            }
        }
      }
      // gRPC prefix (5) then Ticket proto, field 1
      val ticketProto = java.util.Arrays.copyOfRange(requestData, 5, requestData.length)
      val ticket = ArrowFlightReader.protoFields(ticketProto)(1).head
      gotTicket.set(new String(ticket, StandardCharsets.UTF_8))
      require(gotTicket.get == expectTicket)

      val respHeaders = ArrowFlightReader.hpackLiteral(":status", "200") ++
        ArrowFlightReader.hpackLiteral("content-type", "application/grpc")
      val messages = splitIpcMessages(arrowStream()).map { case (m, b) => grpcMessage(flightDataProto(m, b)) }
      val blob = messages.reduce(_ ++ _)
      val cut = blob.length / 2 // mid-message: exercises client reassembly
      val trailers = ArrowFlightReader.hpackLiteral("grpc-status", "0")

      out.write(ArrowFlightReader.h2Frame(0x4, 0, 0, Array.empty)) // server SETTINGS
      out.write(ArrowFlightReader.h2Frame(0x1, 0x4, 1, respHeaders)) // HEADERS END_HEADERS
      out.write(ArrowFlightReader.h2Frame(0x0, 0, 1, blob.take(cut)))
      out.write(ArrowFlightReader.h2Frame(0x0, 0, 1, blob.drop(cut)))
      out.write(ArrowFlightReader.h2Frame(0x1, 0x4 | 0x1, 1, trailers)) // trailers END_STREAM
      out.flush()
      // drain the client's WINDOW_UPDATEs / acks until it closes
      try while (ArrowFlightReader.readH2Frame(in).isDefined) () catch { case _: Throwable => () }
    } catch { case e: Throwable => System.err.println(s"[fake-flight] ${e}"); e.printStackTrace() } finally sock.close()
  }

  // ---------------------------------------------------------- tests

  test("flight DoGet streams FlightData back into a DataFrame") {
    val server = new ServerSocket(0)
    val gotTicket = new java.util.concurrent.atomic.AtomicReference[String]("")
    val t = new Thread(() => {
      try while (true) { val s = server.accept(); new Thread(() => serve(s, "sales_2026", gotTicket)).start() }
      catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val df = ArrowFlightReader.read(spark,
        s"grpc://127.0.0.1:${server.getLocalPort}?ticket=sales_2026", timeoutMs = 10000)
      assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
      val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows.toSeq == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
      assert(gotTicket.get == "sales_2026")
    } finally server.close()
  }

  test("h2 frame codec round-trips header fields and payload") {
    for ((typ, flags, stream, n) <- Seq((0, 1, 1, 0), (1, 5, 1, 100), (4, 0, 0, 6), (8, 0, 3, 4))) {
      val payload = Array.tabulate(n)(i => (i * 7).toByte)
      val enc = ArrowFlightReader.h2Frame(typ, flags, stream, payload)
      val Some((t2, f2, s2, p2)) =
        ArrowFlightReader.readH2Frame(new java.io.ByteArrayInputStream(enc))
      assert((t2, f2, s2) == (typ, flags, stream))
      assert(p2.toSeq == payload.toSeq)
    }
  }

  test("protobuf varint + length-delimited field walk") {
    for (n <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L, (1000L << 3) | 2)) {
      val enc = ArrowFlightReader.varint(n)
      // decode by hand
      var v = 0L; var shift = 0
      enc.foreach { b => v |= (b & 0x7fL) << shift; shift += 7 }
      assert(v == n, s"varint $n")
    }
    val msg = Array[Byte](0x0a, 3) ++ "abc".getBytes("UTF-8") ++
      ArrowFlightReader.varint((1000L << 3) | 2) ++ Array[Byte](2, 9, 8)
    val fields = ArrowFlightReader.protoFields(msg)
    assert(new String(fields(1).head, "UTF-8") == "abc")
    assert(fields(1000).head.toSeq == Seq[Byte](9, 8))
  }

  test("a Huffman+indexed error trailer after FlightData fails the read (no silent truncation)") {
    // Server streams one valid message, then trailers encoded the way
    // real gRPC servers do: incremental-indexing literals with
    // Huffman-coded strings — invisible to a literal-only scan, which is
    // exactly the silent-truncation hole the HPACK decoder closes.
    def huffStr(s: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      s.getBytes(StandardCharsets.ISO_8859_1).foreach { ch =>
        val sym = ch & 0xff
        acc = (acc << Hpack.HuffLens(sym)) | (Hpack.HuffCodes(sym).toLong & 0xffffffffL)
        nbits += Hpack.HuffLens(sym)
        while (nbits >= 8) { out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
      }
      if (nbits > 0) out.write((((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xff).toInt)
      val h = out.toByteArray
      Array((0x80 | h.length).toByte) ++ h
    }
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = sock.getInputStream; val out = sock.getOutputStream
        in.readNBytes(24)
        var streamDone = false
        while (!streamDone) ArrowFlightReader.readH2Frame(in) match {
          case None => streamDone = true
          case Some((typ, flags, sid, _)) =>
            if (typ == 0x4 && (flags & 1) == 0) out.write(ArrowFlightReader.h2Frame(0x4, 0x1, 0, Array.empty))
            if (typ == 0x0 && sid == 1 && (flags & 0x1) != 0) streamDone = true
        }
        val respHeaders = ArrowFlightReader.hpackLiteral(":status", "200")
        val msg = splitIpcMessages(arrowStream()).map { case (m, b) => grpcMessage(flightDataProto(m, b)) }.head
        val trailers =
          Array(0x40.toByte) ++ huffStr("grpc-status") ++ huffStr("13") ++
          Array(0x40.toByte) ++ huffStr("grpc-message") ++ huffStr("shard 7 unavailable")
        out.write(ArrowFlightReader.h2Frame(0x4, 0, 0, Array.empty))
        out.write(ArrowFlightReader.h2Frame(0x1, 0x4, 1, respHeaders))
        out.write(ArrowFlightReader.h2Frame(0x0, 0, 1, msg))
        out.write(ArrowFlightReader.h2Frame(0x1, 0x4 | 0x1, 1, trailers))
        out.flush()
        try while (ArrowFlightReader.readH2Frame(in).isDefined) () catch { case _: Throwable => () }
        sock.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try {
      val e = intercept[java.io.IOException] {
        ArrowFlightReader.read(spark,
          s"grpc://127.0.0.1:${server.getLocalPort}?ticket=x", timeoutMs = 10000).collect()
      }
      assert(e.getMessage.contains("grpc-status 13"))
      assert(e.getMessage.contains("shard 7 unavailable"))
    } finally server.close()
  }

  test("flight reader is registered and grpc:// urls are detected") {
    val (ok, _) = SparkReaders.recommend(graft.datatypes.DataRef("arrow_flight", "grpc://h:8815?ticket=t"))
    assert(ok.exists(_.name == "arrow_flight_reader"))
    val kinds = graft.datatypes.Detect.recommend("grpc://flight.example.org:8815/datasets")
    assert(kinds.exists(_.kind.name == "arrow_flight"))
  }
}
