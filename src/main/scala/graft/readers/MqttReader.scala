package graft.readers

import graft.datatypes.DataRef
import java.io.{ByteArrayOutputStream, InputStream, OutputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native MQTT reader (reference `readers.py:3238` MQTTReader, which
  * delegates to paho-mqtt): speaks MQTT 3.1.1 directly over a socket —
  * CONNECT/CONNACK, SUBSCRIBE/SUBACK, then collects PUBLISH packets
  * until `maxMessages` arrive or `timeoutMs` elapses, exactly the
  * bounded-subscribe semantics of the reference's
  * `read(max_messages=100, timeout=10)`. QoS 1 deliveries are PUBACK'd;
  * QoS 0 (the default subscription) needs no ack.
  *
  * Rows are `(topic, payload, payload_str)` — the raw bytes plus a UTF-8
  * decode for the overwhelmingly common text/JSON payload case, so
  * `spark.read.json(df.select("payload_str").as[String])` lifts JSON
  * topics to columns.
  *
  * Scale shape: a bounded message batch collects driver-side like the
  * other service readers (Socrata/Elasticsearch/Mongo) — MQTT is a
  * control/telemetry endpoint, not the 100 TB fact path. An unbounded
  * subscription belongs in Structured Streaming via a broker bridge
  * (Kafka), which `streaming.StreamOps` covers.
  *
  * The transport is injectable (same contract as `MongoReader.Channel` /
  * `ServiceReaders.EsTransport`): production opens a socket, specs run a
  * loopback fake broker.
  */
object MqttReader {

  /** Bidirectional byte transport to a broker (shared [[Net.Transport]]). */
  type Transport = Net.Transport

  type TransportFactory = (String, Int) => Transport

  /** Real socket transport with explicit timeouts: the read-side timeout
    * doubles as the collect deadline for quiet topics.
    */
  def socketTransport(soTimeoutMs: Int): TransportFactory =
    (host, port) => Net.socket(host, port, tls = false, soTimeoutMs)

  // ------------------------------------------------------------- codec

  /** MQTT Remaining Length: 7-bit little-endian varint, max 4 bytes. */
  private[readers] def encodeRemaining(n: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(4)
    var x = n
    do {
      val digit = x % 128
      x /= 128
      out.write(if (x > 0) digit | 0x80 else digit)
    } while (x > 0)
    out.toByteArray
  }

  private[readers] def readRemaining(in: InputStream): Int = {
    var mult = 1
    var value = 0
    var i = 0
    var cont = true
    while (cont) {
      val b = in.read()
      require(b >= 0, "truncated MQTT remaining-length")
      value += (b & 0x7f) * mult
      mult *= 128
      i += 1
      require(i <= 4, "malformed MQTT remaining-length")
      cont = (b & 0x80) != 0
    }
    value
  }

  /** UTF-8 string with 2-byte big-endian length prefix. */
  private def mqttString(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    require(b.length < 65536, s"MQTT string too long (${b.length})")
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def packet(typeAndFlags: Int, body: Array[Byte]): Array[Byte] =
    Array(typeAndFlags.toByte) ++ encodeRemaining(body.length) ++ body

  /** CONNECT: protocol "MQTT" level 4, clean-session, 60 s keepalive. */
  private[readers] def connectPacket(clientId: String): Array[Byte] =
    packet(0x10,
      mqttString("MQTT") ++ Array[Byte](0x04, 0x02, 0x00, 60) ++ mqttString(clientId))

  /** SUBSCRIBE (flags 0b0010 required): packet id, topic filter, QoS 0. */
  private[readers] def subscribePacket(packetId: Int, topic: String): Array[Byte] =
    packet(0x82,
      Array[Byte]((packetId >> 8).toByte, (packetId & 0xff).toByte) ++
        mqttString(topic) ++ Array[Byte](0x00))

  private def pubackPacket(packetId: Int): Array[Byte] =
    packet(0x40, Array[Byte]((packetId >> 8).toByte, (packetId & 0xff).toByte))

  private def disconnectPacket: Array[Byte] = packet(0xe0, Array.empty)

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = in.readNBytes(n)
    require(buf.length == n, s"truncated MQTT packet body ($n expected, ${buf.length} read)")
    buf
  }

  /** Read `mqtt://host:port/topic` into (topic, payload, payload_str)
    * rows. The topic may contain `/` and the wildcards `+`/`#` — it is
    * everything after the authority. Stops at `maxMessages` or when
    * `timeoutMs` passes without the broker delivering.
    */
  def read(
      spark: SparkSession,
      url: String,
      maxMessages: Int = 100,
      timeoutMs: Int = 10000,
      clientId: String = "graft-mqtt",
      transport: TransportFactory = null
  ): DataFrame = {
    import spark.implicits._
    val uri = new URI(url)
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 1883
    val topic = Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(s"no topic in MQTT url $url"))
    val factory = Option(transport).getOrElse(socketTransport(timeoutMs))
    val t = factory(host, port)
    val messages = Seq.newBuilder[(String, Array[Byte])]
    var n = 0
    try {
      t.out.write(connectPacket(clientId))
      t.out.flush()
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var connacked = false
      var done = false
      while (!done && n < maxMessages && System.nanoTime() < deadline) {
        val first =
          try t.in.read()
          catch { case _: java.net.SocketTimeoutException => -1 }
        if (first < 0) done = true
        else {
          // A timeout mid-packet (after the fixed-header byte) is also
          // end-of-collect: the partial packet is unusable either way,
          // and throwing here would discard every message already
          // collected — the opposite of bounded-subscribe semantics.
          val bodyOpt =
            try Some(readFully(t.in, readRemaining(t.in)))
            catch { case _: java.net.SocketTimeoutException => None }
          if (bodyOpt.isEmpty) done = true
          else {
          val body = bodyOpt.get
          (first >> 4) match {
            case 2 => // CONNACK: [ack flags, return code]
              require(body.length >= 2 && body(1) == 0, s"MQTT CONNACK refused (rc=${body(1)})")
              connacked = true
              t.out.write(subscribePacket(1, topic))
              t.out.flush()
            case 9 => // SUBACK: [packet id hi/lo, return code] — 0x80 = failure
              require(body.length >= 3 && (body(2) & 0xff) != 0x80, "MQTT SUBACK refused")
            case 3 => // PUBLISH
              val qos = (first >> 1) & 0x03
              val topicLen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              val msgTopic = new String(body, 2, topicLen, StandardCharsets.UTF_8)
              var off = 2 + topicLen
              if (qos > 0) {
                val pid = ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff)
                off += 2
                t.out.write(pubackPacket(pid))
                t.out.flush()
              }
              messages += ((msgTopic, java.util.Arrays.copyOfRange(body, off, body.length)))
              n += 1
            case 13 => // PINGRESP — ignore
            case 14 => done = true // broker-side DISCONNECT (MQTT 5 style)
            case _ => // ignore unexpected control packets
          }
          }
        }
      }
      require(connacked, "broker closed before CONNACK")
      t.out.write(disconnectPacket)
      t.out.flush()
    } finally t.close()
    messages.result().toDF("topic", "payload").withColumn("payload_str",
      org.apache.spark.sql.functions.col("payload").cast("string"))
  }
}

class MqttReaderImpl extends Reader {
  val name = "mqtt_reader"
  val implementsKinds = Set("mqtt")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    MqttReader.read(spark, ref.url,
      maxMessages = ref.options.getOrElse("max_messages", "100").toInt,
      timeoutMs = ref.options.getOrElse("timeout_ms", "10000").toInt)
}
