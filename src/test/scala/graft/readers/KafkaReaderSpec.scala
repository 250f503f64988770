package graft.readers

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** E2E spec for the native Kafka batch reader against an in-process
  * fake broker speaking the real wire protocol over real sockets
  * (ApiVersions v0, Metadata v1/v4, ListOffsets v1, Fetch v4), with
  * record batches encoded here INDEPENDENTLY from the published format
  * (CRC32C, zigzag varints, all four compression codecs) — the
  * loopback mold the other native service readers use (MQTT, Mongo,
  * Redis). Executor tasks connect to the loopback broker concurrently
  * in local[*], exercising the distributed fetch path for real.
  */
class KafkaReaderSpec extends SparkSpec {

  // ------------------------------------------ record batch v2 ENCODER

  private def writeVarint(out: ByteArrayOutputStream, v: Int): Unit = {
    var x = (v << 1) ^ (v >> 31) // zigzag
    while ((x & ~0x7f) != 0) { out.write((x & 0x7f) | 0x80); x >>>= 7 }
    out.write(x)
  }
  private def writeVarlong(out: ByteArrayOutputStream, v: Long): Unit = {
    var x = (v << 1) ^ (v >> 63)
    while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
    out.write(x.toInt)
  }
  private def writeBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit =
    if (b == null) writeVarint(out, -1)
    else { writeVarint(out, b.length); out.write(b) }

  private def compress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
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
  private def encodeBatch(baseOffset: Long, baseTs: Long,
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

  // ------------------------------------------------------- fake broker

  /** Loopback broker: leader for every partition of one topic, logs =
    * pre-encoded batches per partition. Each connection gets a thread. */
  private class FakeBroker(topic: String, logs: Map[Int, Seq[(Long, Long, Array[Byte])]],
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
                w.writeShort(0); w.writeInt(6)
                for ((k, lo, hi) <- Seq((18, 0, 3), (3, 1, metadataMax.toInt), (2, 1, 7),
                    (1, 4, 13), (17, 0, 1), (36, 0, 2)))
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
                  else logs.keys.toSeq.sorted
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
                val log = logs(part)
                val (first, end) = if (log.isEmpty) (0L, 0L) else (log.head._1, log.last._2 + 1)
                w.writeInt(1); w.write(str(topic)); w.writeInt(1)
                w.writeInt(part); w.writeShort(0); w.writeLong(-1L)
                // ts >= 0: earliest offset whose record timestamp >= ts,
                // or -1 when none (Kafka's answer for a too-late bound)
                w.writeLong(
                  if (ts == -2L) first
                  else if (ts == -1L) end
                  else tsIndex(part).collectFirst { case (o, t) if t >= ts => o }.getOrElse(-1L))
              case 1 => // Fetch v4
                req.getInt; req.getInt; req.getInt; req.getInt; req.get() // replica..isolation
                req.getInt; readStr(req); req.getInt // 1 topic, 1 partition
                val part = req.getInt
                val offset = req.getLong
                req.getInt // partition_max_bytes
                val log = logs(part)
                val hw = if (log.isEmpty) 0L else log.last._2 + 1
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

  private def k(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** two-partition topic: p0 = plain batch + gzip batch (with headers,
    * null key); p1 = lz4 + control (skipped) + zstd + snappy batches. */
  private def standardLogs: Map[Int, Seq[(Long, Long, Array[Byte])]] = Map(
    0 -> Seq(
      (0L, 2L, encodeBatch(0L, 1000L, Seq(
        (k("k0"), k("v0"), Nil), (k("k1"), k("v1"), Nil), (k("k2"), k("v2"), Nil)))),
      (3L, 4L, encodeBatch(3L, 2000L, Seq(
        (null, k("v3"), Seq("h1" -> k("hv1"), "h2" -> null)),
        (k("k4"), k("v4"), Nil)), codec = 1))),
    1 -> Seq(
      (0L, 1L, encodeBatch(0L, 3000L, Seq(
        (k("a0"), k("b0"), Nil), (k("a1"), k("b1"), Nil)), codec = 3)),
      (2L, 2L, encodeBatch(2L, 3500L, Seq(
        (k("ctrl"), k("ctrl"), Nil)), control = true)),
      (3L, 3L, encodeBatch(3L, 4000L, Seq((k("a3"), k("b3"), Nil)), codec = 4)),
      (4L, 4L, encodeBatch(4L, 4500L, Seq((k("a4"), k("b4"), Nil)), codec = 2))))

  test("reads a two-partition topic E2E: offsets, keys, headers, all codecs, control skipped") {
    val broker = new FakeBroker("events", standardLogs)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events")
      val rows = df.collect().map(r => (r.getInt(3), r.getLong(4),
        Option(r.getAs[Array[Byte]](0)).map(new String(_)).orNull,
        new String(r.getAs[Array[Byte]](1)))).sortBy(t => (t._1, t._2))
      assert(rows.toSeq == Seq(
        (0, 0L, "k0", "v0"), (0, 1L, "k1", "v1"), (0, 2L, "k2", "v2"),
        (0, 3L, null, "v3"), (0, 4L, "k4", "v4"),
        (1, 0L, "a0", "b0"), (1, 1L, "a1", "b1"),
        (1, 3L, "a3", "b3"), (1, 4L, "a4", "b4"))) // offset 2 = control, skipped
      // headers survive, including a null header value
      val hdrs = df.where("partition = 0 AND offset = 3")
        .selectExpr("explode(headers) as h").selectExpr("h.key", "h.value").collect()
        .map(r => r.getString(0) -> Option(r.getAs[Array[Byte]](1)).map(new String(_)))
      assert(hdrs.toSeq.sortBy(_._1) == Seq("h1" -> Some("hv1"), "h2" -> None))
      // timestamps come from baseTimestamp + delta
      val ts = df.where("partition = 0 AND offset = 1").collect().head.getTimestamp(5)
      assert(ts.getTime == 1001L)
    } finally broker.close()
  }

  test("numeric start/end offsets slice each partition; metadata v1 fallback works") {
    val broker = new FakeBroker("events", standardLogs, metadataMax = 1)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        startOffset = "1", endOffset = "4")
      val got = df.collect().map(r => (r.getInt(3), r.getLong(4))).sortBy(identity)
      assert(got.toSeq == Seq((0, 1L), (0, 2L), (0, 3L), (1, 1L), (1, 3L)))
    } finally broker.close()
  }

  test("a truncated final batch ends the decode instead of failing the read") {
    val broker = new FakeBroker("events", standardLogs, truncateTail = true)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events")
      assert(df.count() == 9L)
    } finally broker.close()
  }

  test("decode refuses corrupt CRC and pre-v2 magic loudly") {
    val bad = encodeBatch(0L, 0L, Seq((k("a"), k("b"), Nil)), corruptCrc = true)
    val e1 = intercept[IllegalArgumentException](KafkaReader.decodeRecordSet(bad))
    assert(e1.getMessage.contains("CRC"))
    val old = encodeBatch(0L, 0L, Seq((k("a"), k("b"), Nil)), magic = 1)
    val e2 = intercept[IllegalArgumentException](KafkaReader.decodeRecordSet(old))
    assert(e2.getMessage.contains("v1"))
  }

  test("multi-roundtrip fetch: one batch per response still drains the partition") {
    val broker = new FakeBroker("events", standardLogs, oneBatchPerFetch = true)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events")
      assert(df.count() == 9L) // 4 fetches on p1, 2 on p0 — loop, not luck
    } finally broker.close()
  }

  test("partitions led by different brokers fetch from their own leaders") {
    // broker B owns partition 1; broker A (bootstrap) owns partition 0
    // and advertises B in metadata. Each slice must fetch from ITS
    // leader — B serves only p1's log, so fetching p1 from A would fail.
    val brokerB = new FakeBroker("events", Map(1 -> standardLogs(1)))
    val brokerA = new FakeBroker("events", Map(0 -> standardLogs(0)),
      extraBrokers = Seq((2, "127.0.0.1", brokerB.port)),
      partitionLeaders = Map(0 -> 1, 1 -> 2))
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${brokerA.port}/events")
      val byPart = df.collect().groupBy(_.getInt(3)).view.mapValues(_.length).toMap
      assert(byPart == Map(0 -> 5, 1 -> 4))
    } finally { brokerA.close(); brokerB.close() }
  }

  test("registry: kafka_topic routes to the native reader without the connector jar") {
    val ref = graft.datatypes.DataRef("kafka_topic", "kafka://example.invalid:9092/t")
    val (importable, _) = SparkReaders.recommend(ref)
    assert(importable.exists(_.name == "kafka_native"))
    // the gated connector reader stays declared (first in preference
    // when its jar is present) but is not importable here
    assert(!importable.exists(_.name == "spark_kafka"))
  }

  // ------------------------------------------------------ SASL + TLS

  private val creds = Map("alice" -> "s3cr=t,pw") // exercises saslname escaping

  test("SASL PLAIN authenticates every connection, driver and executors alike") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("PLAIN"), users = creds)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security("SASL_PLAINTEXT", "PLAIN", "alice", "s3cr=t,pw"))
      assert(df.count() == 9L)
    } finally broker.close()
  }

  test("SCRAM-SHA-256 full RFC 5802 exchange against the independent server side") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("SCRAM-SHA-256"), users = creds)
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security(
          "SASL_PLAINTEXT", "SCRAM-SHA-256", "alice", "s3cr=t,pw"))
      assert(df.count() == 9L)
    } finally broker.close()
  }

  test("SCRAM-SHA-512 via the registry reader's sasl_* options") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("SCRAM-SHA-512"), users = creds)
    try {
      val ref = graft.datatypes.DataRef("kafka_topic",
        s"kafka://127.0.0.1:${broker.port}/events",
        Map("security_protocol" -> "SASL_PLAINTEXT", "sasl_mechanism" -> "SCRAM-SHA-512",
          "sasl_username" -> "alice", "sasl_password" -> "s3cr=t,pw"))
      assert(new KafkaReaderImpl().read(spark, ref).count() == 9L)
    } finally broker.close()
  }

  test("refusals: mechanism the broker does not enable (named), bad credentials, missing config") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("SCRAM-SHA-256"), users = creds)
    try {
      // PLAIN against a SCRAM-only broker: error names what the broker enables
      val e1 = intercept[Exception](KafkaReader.read(spark,
        s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security("SASL_PLAINTEXT", "PLAIN", "alice", "s3cr=t,pw")))
      assert(e1.getMessage.contains("SCRAM-SHA-256"))
      // wrong password dies in the authenticate exchange, not a decode error
      val e2 = intercept[Exception](KafkaReader.read(spark,
        s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security("SASL_PLAINTEXT", "SCRAM-SHA-256", "alice", "wrong")))
      assert(e2.getMessage.toLowerCase.contains("authentication failed"))
      // SASL protocol without credentials refuses at construction
      val e3 = intercept[IllegalArgumentException](
        KafkaReader.Security("SASL_SSL", "PLAIN", null, null))
      assert(e3.getMessage.contains("sasl_username"))
      // unknown mechanism names the connector jar
      val e4 = intercept[IllegalArgumentException](
        KafkaReader.Security("SASL_SSL", "GSSAPI", "a", "b"))
      assert(e4.getMessage.contains("connector jar"))
    } finally broker.close()
  }

  test("SASL OAUTHBEARER (RFC 7628) static token; registry sasl_token option") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("OAUTHBEARER"), validTokens = Set("tok-abc123"))
    try {
      val df = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security("SASL_PLAINTEXT", "OAUTHBEARER", token = "tok-abc123"))
      assert(df.count() == 9L) // driver and executor connections both authenticate
      val ref = graft.datatypes.DataRef("kafka_topic",
        s"kafka://127.0.0.1:${broker.port}/events",
        Map("security_protocol" -> "SASL_PLAINTEXT", "sasl_mechanism" -> "OAUTHBEARER",
          "sasl_token" -> "tok-abc123"))
      assert(new KafkaReaderImpl().read(spark, ref).count() == 9L)
    } finally broker.close()
  }

  test("OAUTHBEARER refusals: rejected token surfaces the broker's JSON cause; missing token named") {
    val broker = new FakeBroker("events", standardLogs,
      saslMechanisms = Seq("OAUTHBEARER"), validTokens = Set("good"))
    try {
      // expired/invalid token: the RFC error challenge's JSON reaches
      // the error message — the CAUSE the broker gave, not a bare code
      val e1 = intercept[Exception](KafkaReader.read(spark,
        s"kafka://127.0.0.1:${broker.port}/events",
        security = KafkaReader.Security("SASL_PLAINTEXT", "OAUTHBEARER", token = "expired-tok")))
      assert(e1.getMessage.contains("invalid_token"))
      // OAUTHBEARER without a token refuses at construction, naming the option
      val e2 = intercept[IllegalArgumentException](
        KafkaReader.Security("SASL_SSL", "OAUTHBEARER"))
      assert(e2.getMessage.contains("sasl_token"))
      // the credential never rides toString (plan text / debug dumps)
      val s = KafkaReader.Security("SASL_PLAINTEXT", "OAUTHBEARER", token = "sekrit").toString
      assert(!s.contains("sekrit") &&
        !KafkaReader.Security("SASL_PLAINTEXT", "PLAIN", "u", "hunter2").toString.contains("hunter2"))
    } finally broker.close()
  }

  test("SCRAM server-first hardening: missing s=/i= name the attribute; m= refuses per RFC") {
    // the client nonce is random, so server-first must echo whatever
    // arrives — use a capturing roundTrip that extends the real nonce
    def attempt(mkServerFirst: String => String): Exception = {
      var captured: String = null
      val f: Array[Byte] => Array[Byte] = { bytes =>
        val msg = new String(bytes, StandardCharsets.UTF_8)
        require(captured == null, "should fail before round 2")
        captured = msg.split(",").find(_.startsWith("r=")).get.drop(2)
        mkServerFirst(captured).getBytes(StandardCharsets.UTF_8)
      }
      intercept[Exception](KafkaReader.scramAuth(f, "SCRAM-SHA-256", "u", "p"))
    }
    assert(attempt(cn => s"r=${cn}ext,i=4096").getMessage.contains("missing 's='"))
    assert(attempt(cn => s"r=${cn}ext,s=${java.util.Base64.getEncoder.encodeToString("salt".getBytes)}")
      .getMessage.contains("missing 'i='"))
    assert(attempt(cn => s"m=ext,r=${cn}ext,s=c2FsdA==,i=4096")
      .getMessage.contains("mandatory extension"))
  }

  test("ts:<millis> bounds resolve per partition via ListOffsets timestamp lookup") {
    val tsIdx = Map(
      0 -> Seq((0L, 1000L), (1L, 1001L), (2L, 1002L), (3L, 2000L), (4L, 2001L)),
      1 -> Seq((0L, 3000L), (1L, 3001L), (2L, 3500L), (3L, 4000L), (4L, 4500L)))
    val broker = new FakeBroker("events", standardLogs, tsIndex = tsIdx)
    try {
      // start bound past p0's last record: p0 resolves to log end (empty),
      // p1 starts mid-log — per-partition resolution, not a global offset
      val late = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        startOffset = "ts:3800")
      assert(late.collect().map(r => (r.getInt(3), r.getLong(4))).sorted.toSeq ==
        Seq((1, 3L), (1, 4L)))
      // end bound: rows strictly before the first record at/after the ts
      val early = KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events",
        endOffset = "ts:2000")
      assert(early.collect().map(r => (r.getInt(3), r.getLong(4))).sorted.toSeq ==
        Seq((0, 0L), (0, 1L), (0, 2L)))
    } finally broker.close()
  }

  test("empty no-error fetches below the planned end retry bounded then refuse loudly") {
    val broker = new FakeBroker("events", standardLogs,
      oneBatchPerFetch = true, emptyFetchAtOffset = 3L)
    try {
      val e = intercept[Exception](
        KafkaReader.read(spark, s"kafka://127.0.0.1:${broker.port}/events")
          .where("partition = 0").count())
      assert(e.getMessage.contains("stalled at offset 3") ||
        Option(e.getCause).exists(_.getMessage.contains("stalled at offset 3")))
    } finally broker.close()
  }

  test("max_records option bounds the registry read like the reference consumer") {
    val broker = new FakeBroker("events", standardLogs)
    try {
      val ref = graft.datatypes.DataRef("kafka_topic",
        s"kafka://127.0.0.1:${broker.port}/events", Map("max_records" -> "4"))
      val df = new KafkaReaderImpl().read(spark, ref)
      assert(df.count() == 4L)
      // max_offsets_per_partition caps each planned range in OFFSETS
      val ref2 = graft.datatypes.DataRef("kafka_topic",
        s"kafka://127.0.0.1:${broker.port}/events",
        Map("max_offsets_per_partition" -> "2"))
      val got = new KafkaReaderImpl().read(spark, ref2)
        .collect().map(r => (r.getInt(3), r.getLong(4))).sorted.toSeq
      assert(got == Seq((0, 0L), (0, 1L), (1, 0L), (1, 1L)))
    } finally broker.close()
  }
}
