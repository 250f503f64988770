package graft.readers

import java.io.ByteArrayOutputStream
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Shared Kafka test fixtures: the record-batch v2 ENCODER (implemented
  * independently from the published format) and the loopback
  * [[KafkaFake.FakeBroker]] speaking the real wire protocol over real
  * sockets — used by both the batch-reader spec and the micro-batch
  * streaming-source spec. The broker's logs are APPENDABLE so streaming
  * tests can land new batches between triggers.
  */
object KafkaFake {

  // ------------------------------------------ record batch v2 ENCODER

  def writeVarint(out: ByteArrayOutputStream, v: Int): Unit = {
    var x = (v << 1) ^ (v >> 31) // zigzag
    while ((x & ~0x7f) != 0) { out.write((x & 0x7f) | 0x80); x >>>= 7 }
    out.write(x)
  }
  def writeVarlong(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = (v << 1) ^ (v >> 63)
    while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  def writeBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit =
    if (b == null) writeVarint(out, -1)
    else { writeVarint(out, b.length); out.write(b) }

  def compress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case 0 => data
    case 1 =>
      val bos = new ByteArrayOutputStream()
      val z = new java.util.zip.GZIPOutputStream(bos); z.write(data); z.close(); bos.toByteArray
    case 2 =>
      val bos = new ByteArrayOutputStream()
      val z = new org.xerial.snappy.SnappyOutputStream(bos); z.write(data); z.close(); bos.toByteArray
    case 3 =>
      val bos = new ByteArrayOutputStream()
      val z = new net.jpountz.lz4.LZ4FrameOutputStream(bos); z.write(data); z.close(); bos.toByteArray
    case 4 =>
      val bos = new ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(bos); z.write(data); z.close(); bos.toByteArray
  }

  /** (key, value, headers) records → one v2 batch. */
  def encodeBatch(baseOffset: Long, baseTs: Long,
      records: Seq[(Array[Byte], Array[Byte], Seq[(String, Array[Byte])])],
      codec: Int = 0, control: Boolean = false, magic: Byte = 2,
      corruptCrc: Boolean = false): Array[Byte] = {
    val recBytes = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((k, v, hs), i) =>
      val one = new ByteArrayOutputStream()
      one.write(0) // record attributes
      writeVarlong(one, i.toLong) // timestampDelta
      writeVarint(one, i)         // offsetDelta
      writeBytes(one, k)
      writeBytes(one, v)
      writeVarint(one, hs.size)
      hs.foreach { case (hk, hv) =>
        writeBytes(one, hk.getBytes(StandardCharsets.UTF_8)); writeBytes(one, hv)
      }
      val b = one.toByteArray
      writeVarint(recBytes, b.length)
      recBytes.write(b)
    }
    val payload = compress(codec, recBytes.toByteArray)
    val attributes = (codec | (if (control) 0x20 else 0)).toShort
    val afterCrc = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + payload.length)
    afterCrc.putShort(attributes).putInt(records.size - 1)
      .putLong(baseTs).putLong(baseTs + records.size - 1)
      .putLong(-1L).putShort(-1).putInt(-1).putInt(records.size).put(payload)
    val crc = new java.util.zip.CRC32C()
    crc.update(afterCrc.array(), 0, afterCrc.position())
    val batchLength = 4 + 1 + 4 + afterCrc.position()
    val bb = ByteBuffer.allocate(8 + 4 + batchLength)
    bb.putLong(baseOffset).putInt(batchLength).putInt(0).put(magic)
      .putInt(if (corruptCrc) crc.getValue.toInt + 1 else crc.getValue.toInt)
      .put(afterCrc.array(), 0, afterCrc.position())
    bb.array()
  }

  // ------------------------------------ record batch v2 DECODER (server
  // side, written from the published format independently of BOTH the
  // reader's decoder and the writer's encoder — what the produce spec
  // asserts against)

  def readVarintI(bb: ByteBuffer): Int = {
    var value = 0; var shift = 0
    var b = bb.get().toInt
    while ((b & 0x80) != 0) { value |= (b & 0x7f) << shift; shift += 7; b = bb.get().toInt }
    value |= b << shift
    (value >>> 1) ^ -(value & 1)
  }
  def readVarlongI(bb: ByteBuffer): Long = {
    var value = 0L; var shift = 0
    var b = bb.get().toLong
    while ((b & 0x80L) != 0L) { value |= (b & 0x7fL) << shift; shift += 7; b = bb.get().toLong }
    value |= b << shift
    (value >>> 1) ^ -(value & 1L)
  }
  def decompressI(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case 0 => data
    case 1 =>
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 2 =>
      val in = new org.xerial.snappy.SnappyInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 3 =>
      val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 4 =>
      val in = new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
  }

  case class DecodedRecord(offset: Long, tsMs: Long, key: Array[Byte],
      value: Array[Byte], headers: Seq[(String, Array[Byte])])

  /** Decode ONE v2 batch, CRC-verified. */
  def decodeBatchIndependent(batch: Array[Byte]): Seq[DecodedRecord] = {
    val bb = ByteBuffer.wrap(batch)
    val baseOffset = bb.getLong
    val batchLength = bb.getInt
    require(bb.remaining() == batchLength, s"batch length mismatch: $batchLength vs ${bb.remaining()}")
    bb.getInt // leader epoch
    require(bb.get() == 2, "not a v2 batch")
    val crc = bb.getInt
    val check = new java.util.zip.CRC32C()
    check.update(batch, 8 + 4 + 4 + 1 + 4, batch.length - (8 + 4 + 4 + 1 + 4))
    require(check.getValue.toInt == crc, "server-side CRC32C mismatch")
    val attributes = bb.getShort
    bb.getInt // lastOffsetDelta
    val baseTs = bb.getLong
    bb.getLong // maxTs
    bb.getLong; bb.getShort; bb.getInt // producer id/epoch/sequence
    val count = bb.getInt
    val payload = { val b = new Array[Byte](bb.remaining()); bb.get(b); b }
    val records = ByteBuffer.wrap(decompressI(attributes & 0x07, payload))
    (0 until count).map { _ =>
      readVarintI(records) // length
      records.get()        // record attributes
      val tsDelta = readVarlongI(records)
      val offDelta = readVarintI(records)
      def bytes(): Array[Byte] = {
        val n = readVarintI(records)
        if (n < 0) null else { val b = new Array[Byte](n); records.get(b); b }
      }
      val k = bytes(); val v = bytes()
      val nH = readVarintI(records)
      val hs = (0 until nH).map { _ =>
        val klen = readVarintI(records)
        val kb = new Array[Byte](klen); records.get(kb)
        new String(kb, StandardCharsets.UTF_8) -> bytes()
      }
      DecodedRecord(baseOffset + offDelta, baseTs + tsDelta, k, v, hs)
    }
  }

  // ------------------------------------------------------- fake broker

  /** Loopback broker: leader for every partition of one topic, logs =
    * pre-encoded batches per partition. Each connection gets a thread. */
  class FakeBroker(topic: String, logs0: Map[Int, Seq[(Long, Long, Array[Byte])]],
      metadataMax: Short = 4, truncateTail: Boolean = false,
      oneBatchPerFetch: Boolean = false,
      // (leaderId -> (host, port)) rows advertised besides this broker
      // (id 1); partitionLeaders overrides the default all-on-1 layout
      extraBrokers: Seq[(Int, String, Int)] = Nil,
      partitionLeaders: Map[Int, Int] = Map.empty,
      // SASL: nonEmpty = handshake required before data APIs; the
      // server side of PLAIN and SCRAM is implemented HERE from the
      // RFCs, independently of the reader's client side
      saslMechanisms: Seq[String] = Nil,
      users: Map[String, String] = Map.empty,
      // OAUTHBEARER: tokens the server accepts; anything else gets the
      // RFC 7628 JSON error challenge then a SASL failure
      validTokens: Set[String] = Set.empty,
      // per-partition (offset, timestamp) index for ListOffsets ts >= 0
      tsIndex: Map[Int, Seq[(Long, Long)]] = Map.empty,
      // serve an err==0 EMPTY fetch at this offset (broker bug /
      // transient hole): the client must retry then refuse loudly
      emptyFetchAtOffset: Long = -1L) {
    // appendable for the streaming spec: new batches arrive between triggers
    @volatile private var logsNow: Map[Int, Seq[(Long, Long, Array[Byte])]] = logs0
    def append(partition: Int, entry: (Long, Long, Array[Byte])): Unit = synchronized {
      logsNow = logsNow.updated(partition, logsNow.getOrElse(partition, Nil) :+ entry)
    }
    // retention simulation: drop batches wholly below `newStart`; a
    // subsequent fetch below the new log start gets OFFSET_OUT_OF_RANGE
    // like a real broker
    def trim(partition: Int, newStart: Long): Unit = synchronized {
      logsNow = logsNow.updated(partition,
        logsNow.getOrElse(partition, Nil).filter(_._2 >= newStart))
    }
    // every batch landed via Produce, in arrival order, with its
    // broker-patched base offset — what the produce spec decodes
    // independently
    @volatile private var producedNow: Seq[(Int, Array[Byte])] = Nil
    def producedBatches: Seq[(Int, Array[Byte])] = producedNow
    private val server = new ServerSocket(0, 50, java.net.InetAddress.getByName("127.0.0.1"))
    val port: Int = server.getLocalPort
    @volatile private var running = true

    private def str(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      ByteBuffer.allocate(2 + b.length).putShort(b.length.toShort).put(b).array()
    }
    private def readStr(bb: ByteBuffer): String = {
      val n = bb.getShort.toInt
      if (n < 0) null else { val b = new Array[Byte](n); bb.get(b); new String(b, StandardCharsets.UTF_8) }
    }

    // ---- server-side SCRAM (RFC 5802, implemented independently) ----
    private def hmac(bits: Int, key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance(s"HmacSHA$bits")
      m.init(new javax.crypto.spec.SecretKeySpec(key, s"HmacSHA$bits")); m.doFinal(data)
    }
    private def salted(bits: Int, password: String, salt: Array[Byte], iter: Int): Array[Byte] =
      javax.crypto.SecretKeyFactory.getInstance(s"PBKDF2WithHmacSHA$bits")
        .generateSecret(new javax.crypto.spec.PBEKeySpec(
          password.toCharArray, salt, iter, bits)).getEncoded

    private class ScramState(val bits: Int) {
      var clientFirstBare: String = _
      var serverFirst: String = _
      var saltBytes: Array[Byte] = Array.range(0, 16).map(_.toByte)
      var user: String = _
    }

    private def handle(sock: Socket): Unit = {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      // per-connection SASL state
      var authed = saslMechanisms.isEmpty
      var chosenMech: String = null
      var scram: ScramState = null
      var oauthChallenged = false
      try {
        var open = true
        while (open) {
          val lenB = in.readNBytes(4)
          if (lenB.length < 4) open = false
          else {
            val req = ByteBuffer.wrap(in.readNBytes(ByteBuffer.wrap(lenB).getInt))
            val apiKey = req.getShort
            val apiVersion = req.getShort
            val corr = req.getInt
            readStr(req) // client id
            if (!authed && apiKey != 18 && apiKey != 17 && apiKey != 36) {
              sock.close(); return // broker drops unauthenticated data requests
            }
            val body = new ByteArrayOutputStream()
            val w = new java.io.DataOutputStream(body)
            apiKey match {
              case 18 => // ApiVersions v0
                w.writeShort(0); w.writeInt(7)
                for ((k, lo, hi) <- Seq((18, 0, 3), (3, 1, metadataMax.toInt), (2, 1, 7),
                    (1, 4, 13), (17, 0, 1), (36, 0, 2), (0, 2, 8)))
                  { w.writeShort(k); w.writeShort(lo); w.writeShort(hi) }
              case 17 => // SaslHandshake v1
                val mech = readStr(req)
                if (saslMechanisms.contains(mech)) { chosenMech = mech; w.writeShort(0) }
                else w.writeShort(33) // UNSUPPORTED_SASL_MECHANISM
                w.writeInt(saslMechanisms.size)
                saslMechanisms.foreach(m => w.write(str(m)))
              case 36 => // SaslAuthenticate v0
                val n = req.getInt
                val auth = { val b = new Array[Byte](n); req.get(b); b }
                def fail(msg: String): Unit = {
                  w.writeShort(58); w.write(str(msg)); w.writeInt(0) // SASL_AUTHENTICATION_FAILED
                }
                def ok(bytes: Array[Byte]): Unit = {
                  w.writeShort(0); w.writeShort(-1); w.writeInt(bytes.length); w.write(bytes)
                }
                chosenMech match {
                  case "PLAIN" =>
                    new String(auth, StandardCharsets.UTF_8).split("\u0000", -1) match {
                      case Array(_, u, p) if users.get(u).contains(p) =>
                        authed = true; ok(Array.empty)
                      case _ => fail("Authentication failed: invalid credentials")
                    }
                  case m if m.startsWith("SCRAM-SHA-") =>
                    val bits = m.stripPrefix("SCRAM-SHA-").toInt
                    if (scram == null) {
                      val st = new ScramState(bits)
                      val msg = new String(auth, StandardCharsets.UTF_8)
                      st.clientFirstBare = msg.stripPrefix("n,,")
                      val attrs = st.clientFirstBare.split(",").map(s =>
                        s.take(1) -> s.drop(2)).toMap
                      st.user = attrs("n").replace("=2C", ",").replace("=3D", "=")
                      val snonce = attrs("r") + "srv" + port // server extends the nonce
                      st.serverFirst = s"r=$snonce,s=${java.util.Base64.getEncoder
                        .encodeToString(st.saltBytes)},i=4096"
                      scram = st
                      ok(st.serverFirst.getBytes(StandardCharsets.UTF_8))
                    } else {
                      val st = scram
                      val msg = new String(auth, StandardCharsets.UTF_8)
                      val withoutProof = msg.substring(0, msg.indexOf(",p="))
                      val proof = java.util.Base64.getDecoder
                        .decode(msg.substring(msg.indexOf(",p=") + 3))
                      users.get(st.user) match {
                        case None => fail(s"unknown user ${st.user}")
                        case Some(pw) =>
                          val sp = salted(st.bits, pw, st.saltBytes, 4096)
                          val clientKey = hmac(st.bits, sp,
                            "Client Key".getBytes(StandardCharsets.UTF_8))
                          val storedKey = java.security.MessageDigest
                            .getInstance(s"SHA-${st.bits}").digest(clientKey)
                          val authMessage = (st.clientFirstBare + "," + st.serverFirst +
                            "," + withoutProof).getBytes(StandardCharsets.UTF_8)
                          val clientSig = hmac(st.bits, storedKey, authMessage)
                          val recovered = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
                          val recoveredStored = java.security.MessageDigest
                            .getInstance(s"SHA-${st.bits}").digest(recovered)
                          if (java.util.Arrays.equals(recoveredStored, storedKey)) {
                            authed = true
                            val serverSig = hmac(st.bits,
                              hmac(st.bits, sp, "Server Key".getBytes(StandardCharsets.UTF_8)),
                              authMessage)
                            ok(("v=" + java.util.Base64.getEncoder.encodeToString(serverSig))
                              .getBytes(StandardCharsets.UTF_8))
                          } else fail("Authentication failed: proof mismatch")
                      }
                    }
                  case "OAUTHBEARER" =>
                    // server side of RFC 7628: parse the kvpairs out of
                    // the client-first, accept a known token with an
                    // EMPTY success; otherwise send the JSON error
                    // challenge and fail the (protocol-required) dummy
                    // follow-up round
                    if (oauthChallenged) fail("Authentication failed: token rejected")
                    else {
                      val msg = new String(auth, StandardCharsets.UTF_8)
                      val token = msg.split("\u0001")
                        .find(_.startsWith("auth=Bearer "))
                        .map(_.stripPrefix("auth=Bearer ")).getOrElse("")
                      if (validTokens.contains(token)) { authed = true; ok(Array.empty) }
                      else {
                        oauthChallenged = true
                        ok("""{"status":"invalid_token","scope":"kafka-cluster"}"""
                          .getBytes(StandardCharsets.UTF_8))
                      }
                    }
                  case _ => fail("no mechanism handshaken")
                }
              case 3 => // Metadata v1 or v4
                if (apiVersion >= 3) w.writeInt(0) // throttle
                w.writeInt(1 + extraBrokers.size) // brokers
                w.writeInt(1); w.write(str("127.0.0.1")); w.writeInt(port); w.writeShort(-1) // rack null
                extraBrokers.foreach { case (id, h, pt) =>
                  w.writeInt(id); w.write(str(h)); w.writeInt(pt); w.writeShort(-1)
                }
                if (apiVersion >= 2) w.write(str("fake-cluster"))
                w.writeInt(1) // controller id
                w.writeInt(1) // topics
                w.writeShort(0); w.write(str(topic)); w.writeByte(0)
                val parts =
                  if (partitionLeaders.nonEmpty) partitionLeaders.keys.toSeq.sorted
                  else logsNow.keys.toSeq.sorted
                w.writeInt(parts.size)
                parts.foreach { p =>
                  val leader = partitionLeaders.getOrElse(p, 1)
                  w.writeShort(0); w.writeInt(p); w.writeInt(leader)
                  w.writeInt(1); w.writeInt(leader) // replicas
                  w.writeInt(1); w.writeInt(leader) // isr
                }
              case 2 => // ListOffsets v1
                req.getInt // replica
                req.getInt; readStr(req); req.getInt // 1 topic, 1 partition
                val part = req.getInt
                val ts = req.getLong
                val log = logsNow(part)
                val (first, end) = if (log.isEmpty) (0L, 0L) else (log.head._1, log.last._2 + 1)
                w.writeInt(1); w.write(str(topic)); w.writeInt(1)
                w.writeInt(part); w.writeShort(0); w.writeLong(-1L)
                // ts >= 0: earliest offset whose record timestamp >= ts,
                // or -1 when none (Kafka's answer for a too-late bound)
                w.writeLong(
                  if (ts == -2L) first
                  else if (ts == -1L) end
                  else tsIndex(part).collectFirst { case (o, t) if t >= ts => o }.getOrElse(-1L))
              case 0 => // Produce v3
                readStr(req) // transactional_id (nullable)
                req.getShort // acks
                req.getInt   // timeout_ms
                val nT = req.getInt
                require(nT == 1, s"fake broker: produce with $nT topics")
                val tName = readStr(req)
                val nP = req.getInt
                val results = (0 until nP).map { _ =>
                  val pIdx = req.getInt
                  val setLen = req.getInt
                  val set = new Array[Byte](setLen); req.get(set)
                  // server-side validation, independent of the client:
                  // magic + CRC32C over everything after the crc field
                  val hdr = ByteBuffer.wrap(set)
                  hdr.getLong; hdr.getInt; hdr.getInt
                  val magic = hdr.get()
                  val crc = hdr.getInt
                  val check = new java.util.zip.CRC32C()
                  check.update(set, 8 + 4 + 4 + 1 + 4, setLen - (8 + 4 + 4 + 1 + 4))
                  if (tName != topic) (pIdx, 3.toShort, -1L) // UNKNOWN_TOPIC_OR_PARTITION
                  else if (magic != 2 || check.getValue.toInt != crc)
                    (pIdx, 2.toShort, -1L) // CORRUPT_MESSAGE
                  else FakeBroker.this.synchronized {
                    val log = logsNow.getOrElse(pIdx, Nil)
                    val base = if (log.isEmpty) 0L else log.last._2 + 1
                    // the real broker assigns offsets by PATCHING
                    // baseOffset in place — it precedes the crc field,
                    // so no re-checksum (the format's own design)
                    val patched = set.clone()
                    ByteBuffer.wrap(patched).putLong(0, base)
                    val lastOffsetDelta = ByteBuffer.wrap(set).getInt(8 + 4 + 4 + 1 + 4 + 2)
                    logsNow = logsNow.updated(pIdx, log :+ ((base, base + lastOffsetDelta, patched)))
                    producedNow = producedNow :+ ((pIdx, patched))
                    (pIdx, 0.toShort, base)
                  }
                }
                w.writeInt(1); w.write(str(topic))
                w.writeInt(results.size)
                results.foreach { case (pIdx, err, base) =>
                  w.writeInt(pIdx); w.writeShort(err); w.writeLong(base); w.writeLong(-1L)
                }
                w.writeInt(0) // throttle_time_ms (tail position in Produce)
              case 1 => // Fetch v4
                req.getInt; req.getInt; req.getInt; req.getInt; req.get() // replica..isolation
                req.getInt; readStr(req); req.getInt // 1 topic, 1 partition
                val part = req.getInt
                val offset = req.getLong
                req.getInt // partition_max_bytes
                val log = logsNow(part)
                val hw = if (log.isEmpty) 0L else log.last._2 + 1
                val logStart = if (log.isEmpty) 0L else log.head._1
                if (offset < logStart) {
                  // a real broker refuses a fetch below the log start
                  // (retention passed it): OFFSET_OUT_OF_RANGE, err 1
                  w.writeInt(0) // throttle
                  w.writeInt(1); w.write(str(topic)); w.writeInt(1)
                  w.writeInt(part); w.writeShort(1); w.writeLong(hw); w.writeLong(hw)
                  w.writeInt(0); w.writeInt(0)
                } else {
                  // oneBatchPerFetch exercises the client's multi-roundtrip
                  // loop (a real broker bounds responses at max_bytes)
                  val eligible =
                    if (offset == emptyFetchAtOffset) Nil // err==0 empty stall
                    else log.filter(_._2 >= offset)
                  val serve = (if (oneBatchPerFetch) eligible.take(1) else eligible).map(_._3)
                  var set = serve.foldLeft(Array.empty[Byte])(_ ++ _)
                  // a broker may cut the LAST batch at max_bytes — clients
                  // must treat the partial tail as end-of-response
                  if (truncateTail && serve.nonEmpty)
                    set = set ++ serve.last.take(17)
                  w.writeInt(0) // throttle
                  w.writeInt(1); w.write(str(topic)); w.writeInt(1)
                  w.writeInt(part); w.writeShort(0); w.writeLong(hw); w.writeLong(hw)
                  w.writeInt(0) // aborted txns
                  w.writeInt(set.length); w.write(set)
                }
            }
            val b = body.toByteArray
            val frame = ByteBuffer.allocate(4 + 4 + b.length)
            frame.putInt(4 + b.length).putInt(corr).put(b)
            out.write(frame.array()); out.flush()
          }
        }
      } catch { case _: Throwable => () } finally sock.close()
    }

    private val acceptor = new Thread(() => {
      while (running)
        try { val s = server.accept(); new Thread(() => handle(s)).start() }
        catch { case _: Throwable => () }
    })
    acceptor.setDaemon(true)
    acceptor.start()

    def close(): Unit = { running = false; server.close() }
  }

}
