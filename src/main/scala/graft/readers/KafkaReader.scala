package graft.readers

import graft.datatypes.DataRef
import java.io.ByteArrayOutputStream
import java.net.URI
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Kafka BATCH reader (reference `readers.py:3192-3235`
  * KafkaReader — a bounded `confluent_kafka` consume; datatype
  * `datatypes.py:1639` `kafka://broker:port/topic`): speaks the Kafka
  * wire protocol directly — ApiVersions, Metadata, ListOffsets, Fetch —
  * so a topic is readable as a DataFrame with NO connector jar, closing
  * the last delegated service family (VERDICT r8 #2). The
  * classpath-gated `spark_kafka` streaming source still outranks this
  * reader when the spark-sql-kafka jar is present.
  *
  * Protocol profile (all fixed, NON-flexible versions — no compact
  * strings/tagged fields): ApiVersions v0 for the handshake, Metadata
  * v4 when the broker offers it (v1 otherwise), ListOffsets v1 (with
  * timestamp lookup for `ts:<millis>` bounds), Fetch v4 (the first
  * version carrying record-batch format v2, still served by every
  * broker generation that also serves format-v2 topics), and for
  * secured clusters SaslHandshake v1 + SaslAuthenticate v0 over
  * PLAINTEXT or TLS (see [[KafkaReader.Security]]). A
  * broker whose advertised ranges exclude these refuses loudly naming
  * the connector jar. Record batches decode per the published format:
  * v2 batch header (CRC32C verified), zigzag-varint record framing,
  * gzip/snappy/lz4-frame/zstd batch compression through the codecs
  * Spark already bundles. Magic 0/1 (pre-0.11 message sets) refuse.
  *
  * Scale shape: the driver touches only metadata (one bootstrap
  * connection: ApiVersions + Metadata + per-leader ListOffsets);
  * fetching runs ON EXECUTORS, one task per partition, each consuming
  * ONLY its own [start, end) offset range from its partition leader —
  * the same partition-parallel layout the real connector plans, so a
  * 1000-partition topic fans out across the cluster instead of
  * serializing through the driver. End offsets resolve at plan time,
  * making the frame a bounded, deterministic batch (the reference's
  * bounded-consume semantics; streaming belongs to the gated source).
  *
  * Fetch SESSIONS (KIP-227, Fetch v7+) are deliberately not spoken:
  * their incremental saving is omitting UNCHANGED partitions from
  * follow-up requests, which pays off for consumers multiplexing many
  * mostly-idle partitions over one connection. This reader fetches
  * exactly one partition per connection and every request advances
  * that partition's position, so an incremental request would always
  * carry the one changed partition anyway — the saving collapses to
  * the topic-name bytes (~30 B) against multi-MB responses. Full
  * Fetch v4 requests keep the wire format simpler and every broker
  * generation serves them.
  *
  * Columns mirror spark-sql-kafka: key/value binary, topic, partition,
  * offset, timestamp, timestampType, headers array<struct<key,value>>.
  */
object KafkaReader {

  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType)))))))

  /** Connection security (reference consumer conf `readers.py:3205` —
    * confluent_kafka passes `security.protocol` / `sasl.mechanism` /
    * `sasl.username` / `sasl.password` straight through; real brokers
    * — MSK, Confluent Cloud — are overwhelmingly SASL_SSL). TLS rides
    * the shared [[Net.socket]] layer (SNI + endpoint identification,
    * the same transport the other service readers use); SASL speaks
    * SaslHandshake v1 + SaslAuthenticate v0 framed in the ordinary
    * Kafka protocol. Mechanisms: PLAIN (RFC 4616), SCRAM-SHA-256/512
    * (RFC 5802, with server-signature verification — a broker that
    * cannot prove knowledge of the credential fails the read), and
    * OAUTHBEARER (RFC 7628, static `token` — MSK-IAM/Confluent-OAuth
    * brokers; refresh callbacks stay with the connector jar).
    * Serializable: executors authenticate their own per-partition
    * connections with the same config; `toString` redacts the
    * password/token so plan text and logs never carry them. */
  case class Security(
      protocol: String = "PLAINTEXT",
      mechanism: String = "PLAIN",
      username: String = null,
      password: String = null,
      token: String = null) {
    require(Set("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL").contains(protocol),
      s"kafka: unknown security_protocol '$protocol' " +
        "(PLAINTEXT | SSL | SASL_PLAINTEXT | SASL_SSL)")
    def tls: Boolean = protocol == "SSL" || protocol == "SASL_SSL"
    def sasl: Boolean = protocol.startsWith("SASL_")
    if (sasl) {
      require(Set("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512", "OAUTHBEARER").contains(mechanism),
        s"kafka: unsupported sasl_mechanism '$mechanism' " +
          "(PLAIN | SCRAM-SHA-256 | SCRAM-SHA-512 | OAUTHBEARER); GSSAPI needs the " +
          "spark-sql-kafka connector jar")
      if (mechanism == "OAUTHBEARER")
        require(token != null,
          "kafka: sasl_mechanism=OAUTHBEARER requires sasl_token (a static bearer token; " +
            "broker-side token refresh callbacks need the spark-sql-kafka connector jar)")
      else require(username != null && password != null,
        s"kafka: security_protocol=$protocol requires sasl_username and sasl_password")
    }
    // the credential rides the executor closure by necessity (each task
    // authenticates its own partition connection) — but it must never
    // ride a LOG LINE: case-class toString would print it via plan
    // descriptions, task failure messages and debug dumps
    override def toString: String =
      s"Security($protocol,$mechanism,$username," +
        s"${if (password == null) "null" else "***"},${if (token == null) "null" else "***"})"
  }

  // ------------------------------------------------------------ wire IO

  private[readers] final class Conn(t: Net.Transport, clientId: String) {
    private var corr = 0
    def call(apiKey: Short, version: Short, body: Array[Byte]): ByteBuffer = {
      corr += 1
      val cid = clientId.getBytes(StandardCharsets.UTF_8)
      val header = ByteBuffer.allocate(10 + cid.length)
      header.putShort(apiKey).putShort(version).putInt(corr).putShort(cid.length.toShort).put(cid)
      val size = header.position() + body.length
      val frame = ByteBuffer.allocate(4 + size)
      frame.putInt(size).put(header.array(), 0, header.position()).put(body)
      t.out.write(frame.array(), 0, frame.position())
      t.out.flush()
      val lenBytes = t.in.readNBytes(4)
      require(lenBytes.length == 4, "kafka: connection closed before response")
      val len = ByteBuffer.wrap(lenBytes).getInt
      require(len >= 4 && len <= 128 * 1024 * 1024,
        s"kafka: implausible response size $len — if the broker expects TLS or SASL " +
          "(MSK/Confluent default SASL_SSL), set security_protocol/sasl_* options")
      val bodyBytes = t.in.readNBytes(len)
      require(bodyBytes.length == len, s"kafka: truncated response ($len expected, ${bodyBytes.length} read)")
      val bb = ByteBuffer.wrap(bodyBytes)
      val gotCorr = bb.getInt
      require(gotCorr == corr, s"kafka: correlation id mismatch ($gotCorr != $corr)")
      bb
    }
    def close(): Unit = t.close()
  }

  private[readers] def connect(host: String, port: Int, timeoutMs: Int, clientId: String,
      sec: Security): Conn = {
    val c = new Conn(Net.socket(host, port, tls = sec.tls, soTimeoutMs = timeoutMs), clientId)
    if (sec.sasl) {
      try authenticate(c, sec)
      catch { case e: Throwable => scala.util.Try(c.close()); throw e }
    }
    c
  }

  // ------------------------------------------------------ SASL (17/36)

  /** SaslHandshake v1 + SaslAuthenticate v0 exchange, run on every
    * connection BEFORE any other request (the broker requires it; only
    * ApiVersions may precede). Handshake v1 is what frames the auth
    * bytes as ordinary SaslAuthenticate requests — a v0-only broker
    * (pre-1.0, raw auth bytes on the wire) refuses loudly. */
  private def authenticate(c: Conn, sec: Security): Unit = {
    val versions = apiVersions(c) // allowed pre-auth; cheap
    def supported(key: Short, v: Short): Boolean =
      versions.get(key).exists { case (lo, hi) => lo <= v && v <= hi }
    require(supported(17, 1) && supported(36, 0),
      "kafka: broker does not serve SaslHandshake v1 + SaslAuthenticate v0 " +
        "(pre-1.0 raw-byte SASL framing) — outside this native reader's profile; " +
        "use the spark-sql-kafka connector jar")
    val hs = c.call(17, 1, str(sec.mechanism))
    val hsErr = hs.getShort
    val nMechs = hs.getInt
    val enabled = (0 until nMechs).map(_ => readStr(hs))
    require(hsErr == 0,
      s"kafka: broker rejected SASL mechanism ${sec.mechanism} (error $hsErr); " +
        s"broker enables [${enabled.mkString(", ")}]")
    def roundTrip(authBytes: Array[Byte]): Array[Byte] = {
      val bb = c.call(36, 0, cat(i32(authBytes.length), authBytes))
      val err = bb.getShort
      val msg = readStr(bb)
      require(err == 0, s"kafka: SASL authentication failed (error $err" +
        Option(msg).filter(_.nonEmpty).map(m => s": $m").getOrElse("") + ")")
      val n = bb.getInt
      if (n <= 0) Array.empty[Byte] else { val b = new Array[Byte](n); bb.get(b); b }
    }
    sec.mechanism match {
      case "PLAIN" => // RFC 4616: NUL authzid NUL authcid NUL passwd, one round
        roundTrip(cat(Array[Byte](0),
          sec.username.getBytes(StandardCharsets.UTF_8), Array[Byte](0),
          sec.password.getBytes(StandardCharsets.UTF_8)))
      case "OAUTHBEARER" => oauthAuth(roundTrip, sec.token)
      case m => scramAuth(roundTrip, m, sec.username, sec.password)
    }
  }

  /** RFC 7628 OAUTHBEARER with a static token (the MSK-IAM/Confluent-
    * OAuth broker surface). Initial response: GS2 header + the
    * `auth=Bearer <token>` kvpair framed by 0x01 separators. Success is
    * an EMPTY server response; a non-empty response is the RFC's JSON
    * error challenge (`{"status":"invalid_token",...}`) — the client
    * must answer one dummy 0x01 (after which the server fails the
    * exchange) and we surface the JSON loudly, naming the cause the
    * broker gave (expired/invalid token) instead of a bare error code.
    * A broker that instead short-circuits with a SaslAuthenticate
    * error code fails inside roundTrip with its error_message. */
  private[readers] def oauthAuth(roundTrip: Array[Byte] => Array[Byte], token: String): Unit = {
    require(!token.exists(c => c == '\u0001' || c == '\r' || c == '\n'),
      "kafka: OAUTHBEARER token contains kvpair framing characters — not a valid token")
    val challenge = roundTrip(
      s"n,,\u0001auth=Bearer $token\u0001\u0001".getBytes(StandardCharsets.UTF_8))
    if (challenge.nonEmpty) {
      // the dummy response is protocol-required; the server's failure
      // answer to it carries no new information, so best-effort
      scala.util.Try(roundTrip(Array[Byte](0x01)))
      throw new IllegalArgumentException(
        s"kafka: OAUTHBEARER authentication rejected by the broker: " +
          new String(challenge, StandardCharsets.UTF_8))
    }
  }

  /** RFC 5802 SCRAM client, parameterized by hash width. Verifies the
    * server signature: success requires the broker to prove knowledge
    * of the salted credential, not merely say "ok". */
  private[readers] def scramAuth(roundTrip: Array[Byte] => Array[Byte],
      mechanism: String, username: String, password: String): Unit = {
    val bits = if (mechanism == "SCRAM-SHA-256") 256 else 512
    val hmacAlgo = s"HmacSHA$bits"
    def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance(hmacAlgo)
      m.init(new javax.crypto.spec.SecretKeySpec(key, hmacAlgo)); m.doFinal(data)
    }
    val b64e = java.util.Base64.getEncoder
    val b64d = java.util.Base64.getDecoder
    val cnonceBytes = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(cnonceBytes)
    val cnonce = b64e.encodeToString(cnonceBytes)
    // RFC 5802 saslname escaping for the attribute-value grammar
    val user = username.replace("=", "=3D").replace(",", "=2C")
    val clientFirstBare = s"n=$user,r=$cnonce"
    val serverFirst = new String(
      roundTrip(("n,," + clientFirstBare).getBytes(StandardCharsets.UTF_8)),
      StandardCharsets.UTF_8)
    val attrs = serverFirst.split(",").map(_.splitAt(2)).collect {
      case (k, v) if k.endsWith("=") => k.stripSuffix("=") -> v
    }.toMap
    def attr(k: String): String = attrs.getOrElse(k, throw new IllegalArgumentException(
      s"kafka: malformed SCRAM server-first message (missing '$k='): $serverFirst"))
    // RFC 5802: m= is a MANDATORY extension marker — a client that does
    // not understand it MUST fail the exchange, not silently ignore it
    require(!attrs.contains("m"),
      s"kafka: SCRAM server-first message carries the mandatory extension attribute " +
        s"'m=${attrs("m")}' this client does not implement — refusing per RFC 5802")
    val nonce = attr("r")
    require(nonce.startsWith(cnonce) && nonce.length > cnonce.length,
      "kafka: SCRAM server nonce does not extend the client nonce — possible replay")
    val salt = b64d.decode(attr("s"))
    val iterations = attr("i").toInt
    val skf = javax.crypto.SecretKeyFactory.getInstance(s"PBKDF2WithHmacSHA$bits")
    val salted = skf.generateSecret(new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, bits)).getEncoded
    val clientKey = hmac(salted, "Client Key".getBytes(StandardCharsets.UTF_8))
    val storedKey = java.security.MessageDigest.getInstance(s"SHA-$bits").digest(clientKey)
    val withoutProof = s"c=biws,r=$nonce" // biws = b64("n,,")
    val authMessage = (clientFirstBare + "," + serverFirst + "," + withoutProof)
      .getBytes(StandardCharsets.UTF_8)
    val clientSig = hmac(storedKey, authMessage)
    val proof = clientKey.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
    val serverFinal = new String(
      roundTrip((withoutProof + ",p=" + b64e.encodeToString(proof))
        .getBytes(StandardCharsets.UTF_8)), StandardCharsets.UTF_8)
    val serverSig = hmac(hmac(salted, "Server Key".getBytes(StandardCharsets.UTF_8)), authMessage)
    require(serverFinal.startsWith("v=") &&
        java.security.MessageDigest.isEqual(
          b64d.decode(serverFinal.stripPrefix("v=").takeWhile(_ != ',')), serverSig),
      s"kafka: SCRAM server signature verification failed ($serverFinal) — " +
        "the broker could not prove knowledge of the credential")
  }

  // primitive writers (big-endian, classic encoding)
  private def str(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    ByteBuffer.allocate(2 + b.length).putShort(b.length.toShort).put(b).array()
  }
  private def readStr(bb: ByteBuffer): String = {
    val n = bb.getShort.toInt
    if (n < 0) return null
    val b = new Array[Byte](n); bb.get(b); new String(b, StandardCharsets.UTF_8)
  }
  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream(); parts.foreach(out.write); out.toByteArray
  }
  private def i32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
  private def i64(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()
  private def i8(v: Int): Array[Byte] = Array(v.toByte)

  // ------------------------------------------------- protocol requests

  /** api key → (min, max) supported versions. */
  private[readers] def apiVersions(c: Conn): Map[Short, (Short, Short)] = {
    val bb = c.call(18, 0, Array.empty)
    val err = bb.getShort
    require(err == 0, s"kafka: ApiVersions error $err")
    val n = bb.getInt
    (0 until n).map(_ => (bb.getShort, (bb.getShort, bb.getShort))).toMap
  }

  private[readers] case class BrokerNode(id: Int, host: String, port: Int)
  private[readers] case class PartMeta(partition: Int, leader: Int)

  /** Topic metadata at v4 (preferred) or v1. */
  private[readers] def metadata(c: Conn, topic: String, version: Short):
      (Map[Int, BrokerNode], Seq[PartMeta]) = {
    val body =
      if (version >= 4) cat(i32(1), str(topic), i8(0)) // allow_auto_topic_creation=false
      else cat(i32(1), str(topic))
    val bb = c.call(3, version, body)
    if (version >= 3) bb.getInt // throttle_time_ms
    val nBrokers = bb.getInt
    val brokers = (0 until nBrokers).map { _ =>
      val id = bb.getInt; val host = readStr(bb); val port = bb.getInt
      readStr(bb) // rack (nullable, v1+)
      id -> BrokerNode(id, host, port)
    }.toMap
    if (version >= 2) readStr(bb) // cluster_id
    bb.getInt // controller_id
    val nTopics = bb.getInt
    val parts = (0 until nTopics).flatMap { _ =>
      val errCode = bb.getShort
      val name = readStr(bb)
      bb.get() // is_internal
      val nParts = bb.getInt
      val ps = (0 until nParts).map { _ =>
        val pErr = bb.getShort
        val idx = bb.getInt
        val leader = bb.getInt
        val nRep = bb.getInt; (0 until nRep).foreach(_ => bb.getInt)
        val nIsr = bb.getInt; (0 until nIsr).foreach(_ => bb.getInt)
        require(pErr == 0, s"kafka: partition $idx metadata error $pErr")
        PartMeta(idx, leader)
      }
      require(errCode == 0, s"kafka: topic '$name' metadata error $errCode" +
        (if (errCode == 3) " (UNKNOWN_TOPIC_OR_PARTITION)" else ""))
      ps
    }
    (brokers, parts)
  }

  /** One partition's offset for timestamp -2 (earliest) / -1 (latest), ListOffsets v1. */
  private[readers] def listOffset(c: Conn, topic: String, partition: Int, ts: Long): Long = {
    val body = cat(i32(-1), i32(1), str(topic), i32(1), i32(partition), i64(ts))
    val bb = c.call(2, 1, body)
    val nTopics = bb.getInt
    require(nTopics == 1, s"kafka: ListOffsets returned $nTopics topics")
    readStr(bb)
    val nParts = bb.getInt
    require(nParts == 1, s"kafka: ListOffsets returned $nParts partitions")
    bb.getInt // partition index
    val err = bb.getShort
    require(err == 0, s"kafka: ListOffsets error $err for $topic-$partition")
    bb.getLong // timestamp
    bb.getLong // offset
  }

  /** One Fetch v4 round-trip: (error, highWatermark, recordSet bytes). */
  private[readers] def fetch(c: Conn, topic: String, partition: Int, offset: Long,
      maxBytes: Int): (Short, Long, Array[Byte]) = {
    val body = cat(
      i32(-1),           // replica_id
      i32(500),          // max_wait_ms
      i32(1),            // min_bytes
      i32(maxBytes),     // max_bytes (response-level)
      i8(0),             // isolation_level read_uncommitted
      i32(1), str(topic),
      i32(1), i32(partition), i64(offset), i32(maxBytes))
    val bb = c.call(1, 4, body)
    bb.getInt // throttle_time_ms
    val nTopics = bb.getInt
    require(nTopics == 1, s"kafka: Fetch returned $nTopics topics")
    readStr(bb)
    val nParts = bb.getInt
    require(nParts == 1, s"kafka: Fetch returned $nParts partitions")
    bb.getInt // partition index
    val err = bb.getShort
    val hw = bb.getLong
    bb.getLong // last_stable_offset
    val nAborted = bb.getInt
    if (nAborted > 0) (0 until nAborted).foreach { _ => bb.getLong; bb.getLong }
    val setLen = bb.getInt
    val set = if (setLen <= 0) Array.empty[Byte] else { val b = new Array[Byte](setLen); bb.get(b); b }
    (err, hw, set)
  }

  // ------------------------------------------- record batch v2 decode

  private[readers] def readVarint(bb: ByteBuffer): Int = {
    var value = 0; var shift = 0
    var b = bb.get().toInt
    while ((b & 0x80) != 0) {
      value |= (b & 0x7f) << shift; shift += 7
      require(shift <= 28, "kafka: varint too long")
      b = bb.get().toInt
    }
    value |= b << shift
    (value >>> 1) ^ -(value & 1) // zigzag
  }

  private[readers] def readVarlong(bb: ByteBuffer): Long = {
    var value = 0L; var shift = 0
    var b = bb.get().toLong
    while ((b & 0x80L) != 0) {
      value |= (b & 0x7fL) << shift; shift += 7
      require(shift <= 63, "kafka: varlong too long")
      b = bb.get().toLong
    }
    value |= b << shift
    (value >>> 1) ^ -(value & 1L)
  }

  private def decompress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case 1 => // gzip
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 2 => // snappy (xerial stream framing, the Kafka java client's form)
      val in = new org.xerial.snappy.SnappyInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 3 => // lz4 FRAME format (correct checksums for magic v2 batches)
      val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case 4 => // zstd
      val in = new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case other => throw new IllegalArgumentException(
      s"kafka: unknown compression codec $other in record batch")
  }

  private[readers] case class KRecord(offset: Long, timestamp: Long, timestampType: Int,
      key: Array[Byte], value: Array[Byte], headers: Seq[(String, Array[Byte])])

  /** Decode every complete record batch in a Fetch record_set. The
    * broker may truncate the FINAL batch at max_bytes — a partial tail
    * is normal and simply ends the decode. Control batches (attributes
    * bit 5) carry no data rows and are skipped; their offsets still
    * advance the fetch position via the batch header. Returns (records,
    * nextOffset). */
  private[readers] def decodeRecordSet(set: Array[Byte]): (Seq[KRecord], Long) = {
    val out = Seq.newBuilder[KRecord]
    var next = -1L
    val bb = ByteBuffer.wrap(set)
    var halted = false
    while (!halted && bb.remaining() >= 12) {
      val baseOffset = bb.getLong
      val batchLength = bb.getInt
      if (bb.remaining() < batchLength) halted = true // truncated tail
      else {
        val batch = bb.slice(); batch.limit(batchLength)
        bb.position(bb.position() + batchLength)
        batch.getInt // partitionLeaderEpoch
        val magic = batch.get()
        require(magic == 2,
          s"kafka: message format v$magic outside the supported profile (v2 only; " +
            "pre-0.11 topics need the spark-sql-kafka connector jar)")
        val crc = batch.getInt
        // CRC32C covers everything AFTER the crc field
        val crcCheck = new java.util.zip.CRC32C()
        crcCheck.update(batch.slice())
        require(crcCheck.getValue.toInt == crc,
          s"kafka: record batch CRC mismatch at offset $baseOffset — corrupt fetch")
        val attributes = batch.getShort
        val lastOffsetDelta = batch.getInt
        val baseTimestamp = batch.getLong
        val maxTimestamp = batch.getLong
        batch.getLong  // producerId
        batch.getShort // producerEpoch
        batch.getInt   // baseSequence
        val recordCount = batch.getInt
        next = math.max(next, baseOffset + lastOffsetDelta + 1)
        val isControl = (attributes & 0x20) != 0
        val tsType = if ((attributes & 0x08) != 0) 1 else 0
        if (!isControl && recordCount > 0) {
          val codec = attributes & 0x07
          val raw = { val b = new Array[Byte](batch.remaining()); batch.get(b); b }
          val records = ByteBuffer.wrap(if (codec == 0) raw else decompress(codec, raw))
          var i = 0
          while (i < recordCount) {
            readVarint(records) // record length
            records.get()       // record attributes (unused)
            val tsDelta = readVarlong(records)
            val offDelta = readVarint(records)
            def bytes(): Array[Byte] = {
              val n = readVarint(records)
              if (n < 0) null else { val b = new Array[Byte](n); records.get(b); b }
            }
            val key = bytes()
            val value = bytes()
            val nHeaders = readVarint(records)
            val headers = (0 until nHeaders).map { _ =>
              val kLen = readVarint(records)
              val k = { val b = new Array[Byte](kLen); records.get(b); new String(b, StandardCharsets.UTF_8) }
              k -> bytes()
            }
            // LogAppendTime batches stamp every record with the batch time
            val ts = if (tsType == 1) maxTimestamp else baseTimestamp + tsDelta
            out += KRecord(baseOffset + offDelta, ts, tsType, key, value, headers)
            i += 1
          }
        }
      }
    }
    (out.result(), next)
  }

  // ------------------------------------------------------- public read

  /** Read `kafka://broker:port/topic` as a bounded batch DataFrame.
    * `startOffset`/`endOffset`: "earliest"/"latest", a numeric offset
    * applied to every partition, or `ts:<epoch-millis>` — resolved per
    * partition via ListOffsets v1's timestamp lookup to the FIRST
    * offset whose record timestamp is >= the bound (the reference's
    * bounded time-window consume); a partition with no such record
    * (broker answers -1) resolves to its log end, so a too-late start
    * yields empty rather than wrong. The range resolves ON THE DRIVER
    * at plan time, then each partition fetches its own slice on an
    * executor. `maxOffsetsPerPartition` caps each planned range in
    * OFFSETS — on compacted/transactional topics that is an upper
    * bound, not a record count (use limit() for exact counts). */
  def read(spark: SparkSession, url: String,
      startOffset: String = "earliest", endOffset: String = "latest",
      maxOffsetsPerPartition: Long = Long.MaxValue,
      timeoutMs: Int = 15000, clientId: String = "graft-kafka",
      security: Security = Security()): DataFrame = {
    val uri = new URI(url)
    require(uri.getScheme == "kafka", s"not a kafka url: $url")
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 9092
    val topic = Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(s"no topic in kafka url $url"))

    // driver: handshake + metadata + offset range per partition
    val boot = connect(host, port, timeoutMs, clientId, security)
    val (brokers, parts, mdVersion) =
      try {
        val versions = apiVersions(boot)
        def supported(key: Short, v: Short): Boolean =
          versions.get(key).exists { case (lo, hi) => lo <= v && v <= hi }
        require(supported(1, 4) && supported(2, 1) && (supported(3, 1) || supported(3, 4)),
          s"kafka: broker at $host:$port does not serve Fetch v4 / ListOffsets v1 / " +
            "Metadata v1-v4 — outside this native reader's profile; use the " +
            "spark-sql-kafka connector jar")
        val mdV: Short = if (supported(3, 4)) 4 else 1
        val (bs, ps) = metadata(boot, topic, mdV)
        (bs, ps, mdV)
      } finally boot.close()
    require(parts.nonEmpty, s"kafka: topic '$topic' has no partitions")

    case class Slice(partition: Int, host: String, port: Int, start: Long, end: Long)
    // "ts:<millis>" → first offset with timestamp >= millis; the broker
    // answers -1 when no record qualifies → log end (empty, not wrong)
    def resolve(c: Conn, partition: Int, spec: String): Long = spec match {
      case "earliest" => listOffset(c, topic, partition, -2L)
      case "latest"   => listOffset(c, topic, partition, -1L)
      case ts if ts.startsWith("ts:") =>
        val got = listOffset(c, topic, partition, ts.stripPrefix("ts:").toLong)
        if (got < 0) listOffset(c, topic, partition, -1L) else got
      case n => n.toLong
    }
    val byLeader = parts.groupBy(_.leader)
    val slices: Seq[Slice] = byLeader.toSeq.flatMap { case (leaderId, ps) =>
      val node = brokers.getOrElse(leaderId, throw new IllegalArgumentException(
        s"kafka: leader $leaderId not in broker metadata"))
      val c = connect(node.host, node.port, timeoutMs, clientId, security)
      try ps.map { pm =>
        val start = resolve(c, pm.partition, startOffset)
        val end = resolve(c, pm.partition, endOffset)
        // saturating add: the default cap is Long.MaxValue
        val cap =
          if (start > Long.MaxValue - maxOffsetsPerPartition) Long.MaxValue
          else start + maxOffsetsPerPartition
        Slice(pm.partition, node.host, node.port, start, math.min(end, cap))
      } finally c.close()
    }

    // executors: one task per partition, each fetching only its slice
    val topicB = topic
    val timeoutB = timeoutMs
    val clientB = clientId
    val secB = security
    val rows = spark.sparkContext
      .parallelize(slices, math.max(1, slices.size))
      .flatMap { s =>
        if (s.start >= s.end) Iterator.empty
        else {
          // the connection closes on task completion (normal or not),
          // not via try/finally — the iterator outlives this block
          val c = connect(s.host, s.port, timeoutB, clientB, secB)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => scala.util.Try(c.close())))
          recordIterator(c, topicB, s.partition, s.start, s.end).map(r =>
            Row(r.key, r.value, topicB, s.partition, r.offset,
              new java.sql.Timestamp(r.timestamp), r.timestampType,
              r.headers.map { case (k, v) => Row(k, v) }))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** LAZY fetch loop over one partition's [start, end) slice: at most
    * one Fetch response (<= maxBytes compressed + its decoded batches)
    * lives in memory at a time, so a 100M-record partition streams
    * through the task instead of materializing in executor heap.
    * Shared by the batch read and the micro-batch streaming source so
    * the stall/err semantics cannot drift. */
  private[readers] def recordIterator(c: Conn, topic: String, part: Int,
      start: Long, end: Long): Iterator[KRecord] = new Iterator[KRecord] {
    private var offset = start
    private var done = start >= end
    private var stalls = 0
    private var cur: Iterator[KRecord] = Iterator.empty
    private def fill(): Unit =
      while (!done && !cur.hasNext) {
        val (err, hw, set) = fetch(c, topic, part, offset, 4 * 1024 * 1024)
        require(err == 0, s"kafka: Fetch error $err for $topic-$part" +
          (if (err == 1) " (OFFSET_OUT_OF_RANGE — data expired under the reader)" else ""))
        val (records, next) = decodeRecordSet(set)
        val lo = offset
        cur = records.iterator.filter(r => r.offset >= lo && r.offset < end)
        if (next >= end || hw <= offset) done = true
        else if (next > offset) { offset = next; stalls = 0 }
        else {
          // err==0 yet no batch advanced the offset while the broker
          // still advertises data (offset < min(end, hw)): silently
          // stopping here would under-deliver the planned range.
          // Retry bounded, then fail loudly.
          stalls += 1
          require(stalls < 5,
            s"kafka: $topic-$part stalled at offset $offset " +
              s"(planned end $end, high watermark $hw): the broker " +
              "returned empty fetches with no error 5 times — refusing " +
              "to silently under-deliver the planned offset range")
        }
      }
    def hasNext: Boolean = { fill(); cur.hasNext }
    def next(): KRecord = { fill(); cur.next() }
  }
}

/** Registry wrapper: the connector-gated `spark_kafka` streaming source
  * precedes this in `SparkReaders.all`, so the real connector wins when
  * its jar is present; this native bounded-batch consumer is the
  * always-importable fallback (reference KafkaReader's
  * `max_records=1000` bounded-consume semantics via `max_records`). */
class KafkaReaderImpl extends Reader {
  val name = "kafka_native"
  val implementsKinds = Set("kafka_topic")
  def read(spark: SparkSession, ref: DataRef): DataFrame = {
    // max_records applies as limit() ONLY — an offset-range cap would
    // under-deliver on compacted/transactional topics, where offsets
    // outnumber surviving records. The lazy per-partition fetch plus
    // Spark's LocalLimit stop pulling once the limit is satisfied, so
    // the bound still limits work, not just output.
    val df = KafkaReader.read(spark, ref.url,
      startOffset = ref.options.getOrElse("start_offset", "earliest"),
      endOffset = ref.options.getOrElse("end_offset", "latest"),
      maxOffsetsPerPartition =
        ref.options.get("max_offsets_per_partition").map(_.toLong).getOrElse(Long.MaxValue),
      timeoutMs = ref.options.getOrElse("timeout_ms", "15000").toInt,
      // NOTE plaintext-option trade-off: sasl_password/sasl_token are
      // ordinary DataRef options (the reference passes confluent_kafka
      // conf through the same way) — a catalog that persists this ref
      // persists the credential. Security.toString redacts both, so
      // closures/plan text/debug dumps never print them; keeping them
      // out of saved catalogs is the CALLER's choice of secret store.
      security = KafkaReader.Security(
        protocol = ref.options.getOrElse("security_protocol", "PLAINTEXT"),
        mechanism = ref.options.getOrElse("sasl_mechanism", "PLAIN"),
        username = ref.options.getOrElse("sasl_username", null),
        password = ref.options.getOrElse("sasl_password", null),
        token = ref.options.getOrElse("sasl_token", null)))
    ref.options.get("max_records").map(n => df.limit(n.toInt)).getOrElse(df)
  }
}
