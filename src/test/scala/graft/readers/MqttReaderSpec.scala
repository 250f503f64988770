package graft.readers

import graft.SparkSpec
import java.io.{InputStream, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

/** Drives the native MQTT 3.1.1 client against an in-process fake broker
  * (ServerSocket speaking the wire protocol over a canned topic), the
  * same loopback pattern as the Redis RESP spec.
  */
class MqttReaderSpec extends SparkSpec {

  private def mqttStr(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def publishPacket(topic: String, payload: String, qos: Int = 0, pid: Int = 0): Array[Byte] = {
    val body = mqttStr(topic) ++
      (if (qos > 0) Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) else Array.empty[Byte]) ++
      payload.getBytes(StandardCharsets.UTF_8)
    Array((0x30 | (qos << 1)).toByte) ++ MqttReader.encodeRemaining(body.length) ++ body
  }

  /** Fake broker: CONNACK on CONNECT, SUBACK on SUBSCRIBE, then three
    * PUBLISHes (one QoS 1, expecting a PUBACK back), then silence.
    */
  private def serve(sock: java.net.Socket): Unit = {
    val in: InputStream = sock.getInputStream
    val out: OutputStream = sock.getOutputStream
    def readPacket(): Int = {
      val first = in.read()
      if (first < 0) return -1
      val body = in.readNBytes(MqttReader.readRemaining(in))
      require(body != null)
      first >> 4
    }
    try {
      require(readPacket() == 1, "expected CONNECT first")
      out.write(Array[Byte](0x20, 0x02, 0x00, 0x00)) // CONNACK ok
      out.flush()
      require(readPacket() == 8, "expected SUBSCRIBE")
      out.write(Array[Byte](0x90.toByte, 0x03, 0x00, 0x01, 0x00)) // SUBACK pid=1 qos0
      out.write(publishPacket("sensors/temp", """{"c":21.5}"""))
      out.write(publishPacket("sensors/hum", """{"pct":40}""", qos = 1, pid = 7))
      out.write(publishPacket("sensors/temp", """{"c":22.0}"""))
      out.flush()
      require(readPacket() == 4, "expected PUBACK for the QoS-1 publish")
      // leave the socket open: the client's maxMessages bound ends the read
      readPacket() // DISCONNECT (or close)
      ()
    } catch { case _: Throwable => () } finally sock.close()
  }

  test("mqtt reader subscribes and collects publishes into rows") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try while (true) { val s = server.accept(); new Thread(() => serve(s)).start() }
      catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val df = MqttReader.read(spark, s"mqtt://127.0.0.1:${server.getLocalPort}/sensors/#",
        maxMessages = 3, timeoutMs = 10000)
      val rows = df.collect().map(r => (r.getString(0), r.getString(2)))
      assert(rows.length == 3)
      assert(rows.count(_._1 == "sensors/temp") == 2)
      assert(rows.contains(("sensors/hum", """{"pct":40}""")))
      // payload JSON lifts to columns through read.json
      import spark.implicits._
      val lifted = spark.read.json(df.filter(df("topic") === "sensors/temp")
        .select("payload_str").as[String])
      assert(lifted.agg(org.apache.spark.sql.functions.max("c")).head().getDouble(0) == 22.0)
    } finally server.close()
  }

  test("remaining-length varint round-trips the spec boundaries") {
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 268435455)) {
      val enc = MqttReader.encodeRemaining(n)
      assert(MqttReader.readRemaining(new java.io.ByteArrayInputStream(enc)) == n)
    }
    assert(MqttReader.encodeRemaining(127).length == 1)
    assert(MqttReader.encodeRemaining(128).length == 2)
  }

  test("mqtt reader is registered and mqtt:// urls are detected") {
    val (ok, _) = SparkReaders.recommend(graft.datatypes.DataRef("mqtt", "mqtt://h:1883/t"))
    assert(ok.exists(_.name == "mqtt_reader"))
    val kinds = graft.datatypes.Detect.recommend("mqtt://broker.example.org:1883/sensors/temp")
    assert(kinds.exists(_.kind.name == "mqtt"))
  }
}
