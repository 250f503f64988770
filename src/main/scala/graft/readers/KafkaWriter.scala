package graft.readers

import java.io.ByteArrayOutputStream
import java.net.URI
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Kafka PRODUCER — the write side of the round-9 wire client
  * ([[KafkaReader]]), so a DataFrame lands in a topic with NO connector
  * jar: Produce v3 (the first version carrying record-batch format v2,
  * served by every broker generation that serves v2 topics) over the
  * same connection/TLS/SASL plumbing the reader authenticates with.
  * Closes the zero-connector story write-side (VERDICT r11 #3).
  *
  * Record batches ENCODE per the published v2 format (the exact
  * inverse of [[KafkaReader.decodeRecordSet]]): batch header with
  * CRC32C over everything after the crc field, zigzag-varint record
  * framing, optional gzip/snappy/lz4-frame/zstd batch compression
  * through the codecs Spark already bundles. The broker assigns real
  * base offsets (baseOffset precedes the crc field, so brokers patch
  * it without re-checksumming — the format's own design).
  *
  * Input contract (spark-sql-kafka's sink columns): `value` required
  * (binary or string), `key`/`partition`/`headers`/`timestamp`
  * optional, anything else refuses loudly. Routing matches the Java
  * client's default partitioner: an explicit `partition` wins, a
  * non-null key hashes with murmur2 mod partition count, and null-key
  * rows stick to one partition per Spark task (the sticky partitioner's
  * batching shape without its timer).
  *
  * Scale shape: the driver touches only metadata (ApiVersions +
  * Metadata on one bootstrap connection); producing runs ON EXECUTORS —
  * each task groups its rows by target partition, encodes bounded
  * batches (`batchMaxRecords`), and sends them to each partition's OWN
  * leader over a per-task connection cache. Rows never pass the
  * driver.
  *
  * Delivery is AT-LEAST-ONCE: acks=all (default) or 1, and a retried
  * Spark task re-produces its rows — the same contract as the
  * spark-sql-kafka sink (exactly-once needs broker transactions, which
  * stay with the connector). acks=0 refuses: a fire-and-forget write
  * has no response to verify, and this writer will not report success
  * it cannot check.
  */
object KafkaWriter {

  // -------------------------------------------- record batch v2 ENCODE

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

  private[readers] def codecOf(name: String): Int = name.toLowerCase match {
    case "none" | "" | "uncompressed" => 0
    case "gzip"   => 1
    case "snappy" => 2
    case "lz4"    => 3
    case "zstd"   => 4
    case other => throw new IllegalArgumentException(
      s"kafka writer: unknown compression '$other' (none | gzip | snappy | lz4 | zstd)")
  }

  private def compressPayload(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
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

  private[readers] case class PRecord(key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])], tsMs: Long)

  /** One v2 batch: baseOffset 0 (the broker assigns and patches it),
    * producerId/epoch/sequence -1 (non-transactional, non-idempotent —
    * the profile's honest delivery class), CreateTime timestamps with
    * per-record deltas from the batch minimum. */
  private[readers] def encodeBatch(records: Seq[PRecord], codec: Int): Array[Byte] = {
    require(records.nonEmpty, "kafka writer: empty batch")
    val baseTs = records.iterator.map(_.tsMs).min
    val maxTs = records.iterator.map(_.tsMs).max
    val recBytes = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) =>
      val one = new ByteArrayOutputStream()
      one.write(0) // record attributes (unused by the format)
      writeVarlong(one, r.tsMs - baseTs)
      writeVarint(one, i)
      writeBytes(one, r.key)
      writeBytes(one, r.value)
      writeVarint(one, r.headers.size)
      r.headers.foreach { case (k, v) =>
        writeBytes(one, k.getBytes(StandardCharsets.UTF_8)); writeBytes(one, v)
      }
      val b = one.toByteArray
      writeVarint(recBytes, b.length)
      recBytes.write(b)
    }
    val payload = compressPayload(codec, recBytes.toByteArray)
    val afterCrc = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + payload.length)
    afterCrc.putShort(codec.toShort)          // attributes: codec bits, CreateTime
      .putInt(records.size - 1)               // lastOffsetDelta
      .putLong(baseTs).putLong(maxTs)
      .putLong(-1L).putShort(-1).putInt(-1)   // producerId/epoch/baseSequence
      .putInt(records.size)
      .put(payload)
    val crc = new java.util.zip.CRC32C()
    crc.update(afterCrc.array(), 0, afterCrc.position())
    val batchLength = 4 + 1 + 4 + afterCrc.position() // leaderEpoch + magic + crc + rest
    val bb = ByteBuffer.allocate(8 + 4 + batchLength)
    bb.putLong(0L)                            // baseOffset (broker-assigned)
      .putInt(batchLength)
      .putInt(-1)                             // partitionLeaderEpoch
      .put(2.toByte)                          // magic
      .putInt(crc.getValue.toInt)
      .put(afterCrc.array(), 0, afterCrc.position())
    bb.array()
  }

  // --------------------------------------------------- Produce v3 wire

  private def str(s: String): Array[Byte] = {
    if (s == null) return ByteBuffer.allocate(2).putShort(-1).array()
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
  private def i16(v: Int): Array[Byte] = ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def i32(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()

  private def errHint(err: Short): String = err match {
    case 3  => " (UNKNOWN_TOPIC_OR_PARTITION)"
    case 6  => " (NOT_LEADER_OR_FOLLOWER — stale metadata; re-run)"
    case 10 => " (MESSAGE_TOO_LARGE — lower batchMaxRecords or compress)"
    case 42 => " (INVALID_RECORD)"
    case _  => ""
  }

  /** One Produce v3 round-trip for one (topic, partition) batch;
    * returns the broker-assigned base offset. */
  private[readers] def produce(c: KafkaReader.Conn, topic: String, partition: Int,
      batch: Array[Byte], acks: Int, timeoutMs: Int): Long = {
    val body = cat(
      str(null),                 // transactional_id
      i16(acks), i32(timeoutMs),
      i32(1), str(topic),
      i32(1), i32(partition), i32(batch.length), batch)
    val bb = c.call(0, 3, body)
    val nTopics = bb.getInt
    require(nTopics == 1, s"kafka: Produce returned $nTopics topics")
    readStr(bb)
    val nParts = bb.getInt
    require(nParts == 1, s"kafka: Produce returned $nParts partitions")
    bb.getInt // partition index
    val err = bb.getShort
    require(err == 0, s"kafka: Produce error $err for $topic-$partition${errHint(err)}")
    val baseOffset = bb.getLong
    bb.getLong // log_append_time_ms
    baseOffset
  }

  /** murmur2, the Java client's default partitioner hash (published
    * algorithm; Kafka pins it forever for sticky key routing). */
  private[readers] def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val length4 = data.length / 4 * 4
    var i = 0
    while (i < length4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    (data.length % 4: @annotation.switch) match {
      case 3 =>
        h ^= (data(length4 + 2) & 0xff) << 16
        h ^= (data(length4 + 1) & 0xff) << 8
        h ^= data(length4) & 0xff; h *= m
      case 2 =>
        h ^= (data(length4 + 1) & 0xff) << 8
        h ^= data(length4) & 0xff; h *= m
      case 1 =>
        h ^= data(length4) & 0xff; h *= m
      case _ => ()
    }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  // --------------------------------------------------------- the write

  /** Produce `df` into `kafka://broker:port/topic`. */
  def write(spark: SparkSession, df: DataFrame, url: String,
      security: KafkaReader.Security = KafkaReader.Security(),
      acks: Int = -1, compression: String = "none",
      batchMaxRecords: Int = 1000, timeoutMs: Int = 15000,
      clientId: String = "graft-kafka-writer"): Unit = {
    require(acks == -1 || acks == 1,
      "kafka writer: acks=0 is fire-and-forget — no response to verify, so this writer " +
        "refuses to report a success it cannot check; use acks=1 or -1 (all)")
    require(batchMaxRecords >= 1, s"kafka writer: batchMaxRecords must be >= 1")
    val codec = codecOf(compression)
    val uri = new URI(url)
    require(uri.getScheme == "kafka", s"not a kafka url: $url")
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 9092
    val topic = Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(s"no topic in kafka url $url"))

    // input contract: value required, key/partition/headers/timestamp
    // optional, anything else loud (a silently dropped column is a
    // data-loss bug waiting to be noticed in production)
    val allowed = Set("key", "value", "partition", "headers", "timestamp")
    val extra = df.schema.fieldNames.filterNot(f => allowed.contains(f.toLowerCase))
    require(extra.isEmpty,
      s"kafka writer: unsupported column(s) [${extra.mkString(",")}] — the sink takes " +
        "key, value, partition, headers, timestamp (project/serialize the rest into value)")
    def fieldOf(name: String): Option[StructField] =
      df.schema.fields.find(_.name.equalsIgnoreCase(name))
    require(fieldOf("value").isDefined, "kafka writer: a 'value' column is required")
    import org.apache.spark.sql.functions.{col, lit}
    def asBinary(fl: StructField): org.apache.spark.sql.Column = fl.dataType match {
      case BinaryType => col(fl.name)
      case StringType => col(fl.name).cast(BinaryType)
      case other => throw new IllegalArgumentException(
        s"kafka writer: column '${fl.name}' must be binary or string (got ${other.simpleString})")
    }
    val headersType = ArrayType(StructType(Seq(
      StructField("key", StringType), StructField("value", BinaryType))))
    val norm = df.select(
      fieldOf("key").map(asBinary).getOrElse(lit(null).cast(BinaryType)).as("key"),
      asBinary(fieldOf("value").get).as("value"),
      fieldOf("partition").map(fl => col(fl.name).cast(IntegerType))
        .getOrElse(lit(null).cast(IntegerType)).as("partition"),
      fieldOf("headers").map(fl => col(fl.name).cast(headersType))
        .getOrElse(lit(null).cast(headersType)).as("headers"),
      // epoch millis, not TimestampType: the executor loop reads a
      // plain Long, so the row codec is identical whether the session
      // externalizes timestamps as java.sql.Timestamp or (under
      // spark.sql.datetime.java8API.enabled) java.time.Instant
      fieldOf("timestamp").map(fl =>
          org.apache.spark.sql.functions.unix_millis(col(fl.name).cast(TimestampType)))
        .getOrElse(lit(null).cast(LongType)).as("timestamp"))

    // driver: handshake + metadata only
    val boot = KafkaReader.connect(host, port, timeoutMs, clientId, security)
    val (brokers, parts) =
      try {
        val versions = KafkaReader.apiVersions(boot)
        def supported(key: Short, v: Short): Boolean =
          versions.get(key).exists { case (lo, hi) => lo <= v && v <= hi }
        require(supported(0, 3) && (supported(3, 1) || supported(3, 4)),
          s"kafka: broker at $host:$port does not serve Produce v3 / Metadata v1-v4 — " +
            "outside this native writer's profile; use the spark-sql-kafka connector jar")
        KafkaReader.metadata(boot, topic, if (supported(3, 4)) 4 else 1)
      } finally boot.close()
    require(parts.nonEmpty, s"kafka: topic '$topic' has no partitions")
    val leaderOf: Map[Int, (String, Int)] = parts.map { pm =>
      val n = brokers.getOrElse(pm.leader, throw new IllegalArgumentException(
        s"kafka: leader ${pm.leader} not in broker metadata"))
      pm.partition -> (n.host, n.port)
    }.toMap
    val nParts = leaderOf.size

    val topicB = topic
    val secB = security
    val timeoutB = timeoutMs
    val clientB = clientId
    val acksB = acks
    val codecB = codec
    val maxRecB = batchMaxRecords
    norm.foreachPartition { (it: Iterator[Row]) =>
      val conns = scala.collection.mutable.Map[(String, Int), KafkaReader.Conn]()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ =>
          conns.values.foreach(c => scala.util.Try(c.close()))))
      val sticky = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0) % nParts
      val stickyTarget = leaderOf.keys.toSeq.sorted.apply(sticky)
      val buffers = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[PRecord]]()
      def flush(p: Int): Unit = buffers.get(p).filter(_.nonEmpty).foreach { buf =>
        val (h, pt) = leaderOf(p)
        val c = conns.getOrElseUpdate((h, pt),
          KafkaReader.connect(h, pt, timeoutB, clientB, secB))
        produce(c, topicB, p, encodeBatch(buf.toSeq, codecB), acksB, timeoutB)
        buf.clear()
      }
      it.foreach { row =>
        val key = row.getAs[Array[Byte]]("key")
        val value = row.getAs[Array[Byte]]("value")
        val target =
          if (!row.isNullAt(row.fieldIndex("partition"))) {
            val p = row.getInt(row.fieldIndex("partition"))
            require(leaderOf.contains(p),
              s"kafka writer: row targets partition $p but '$topicB' has partitions " +
                s"[${leaderOf.keys.toSeq.sorted.mkString(",")}]")
            p
          } else if (key != null) (murmur2(key) & 0x7fffffff) % nParts
          else stickyTarget
        val headers: Seq[(String, Array[Byte])] =
          if (row.isNullAt(row.fieldIndex("headers"))) Nil
          else row.getAs[scala.collection.Seq[Row]]("headers").toSeq
            .map(h => h.getString(0) -> h.getAs[Array[Byte]](1))
        val ts =
          if (row.isNullAt(row.fieldIndex("timestamp"))) System.currentTimeMillis()
          else row.getLong(row.fieldIndex("timestamp"))
        val buf = buffers.getOrElseUpdate(target,
          scala.collection.mutable.ArrayBuffer.empty[PRecord])
        buf += PRecord(key, value, headers, ts)
        if (buf.size >= maxRecB) flush(target)
      }
      buffers.keys.foreach(flush)
    }
  }

  /** Option-map front door shared by the v1 batch save, the streaming
    * sink and [[graft.output.Writers.kafka]] (`url`,
    * `security_protocol`/`sasl_*`, `compression`, `acks`,
    * `batch_max_records`, `timeout_ms`, `client_id`). */
  def writeWithOptions(spark: SparkSession, df: DataFrame,
      parameters: Map[String, String]): Unit = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val url = ci.getOrElse("url", ci.getOrElse("path", throw new IllegalArgumentException(
      "graft-kafka sink: a topic url is required — option(\"url\", \"kafka://broker:port/topic\")")))
    write(spark, df, url,
      security = KafkaReader.Security(
        protocol = ci.getOrElse("security_protocol", "PLAINTEXT"),
        mechanism = ci.getOrElse("sasl_mechanism", "PLAIN"),
        username = ci.getOrElse("sasl_username", null),
        password = ci.getOrElse("sasl_password", null),
        token = ci.getOrElse("sasl_token", null)),
      acks = ci.getOrElse("acks", "-1").toInt,
      compression = ci.getOrElse("compression", "none"),
      batchMaxRecords = ci.getOrElse("batch_max_records", "1000").toInt,
      timeoutMs = ci.getOrElse("timeout_ms", "15000").toInt,
      clientId = ci.getOrElse("client_id", "graft-kafka-writer"))
  }
}
