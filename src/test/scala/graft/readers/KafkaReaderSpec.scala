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

  import KafkaFake._

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
