package graft.readers

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.datatypes.DataRef
import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, InputStream}
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Native MongoDB reader (reference `readers.py:3341` MongoDBReader /
  * `:3364` MongoDBPandasReader, which delegate to pymongo): speaks the
  * modern wire protocol directly — `OP_MSG` (opcode 2013, MongoDB >= 3.6)
  * with a from-scratch BSON subset codec — so no client library is
  * needed. `find` + `getMore` page the cursor exactly as pymongo's
  * `col.find(query).limit(n)` does, and each document renders to
  * Extended-JSON-ish text that `spark.read.json` lifts into columns
  * (the Spark analogue of `pd.DataFrame(records)`).
  *
  * Scale shape: the cursor pages land driver-side like the
  * Elasticsearch/Socrata service readers — MongoDB is a dimension/
  * metadata endpoint in this engine, not the 100 TB fact path (that is
  * parquet). `maxDocs` bounds the pull; a collection bigger than that
  * belongs in object storage, not behind a single cursor.
  *
  * The channel is injectable (same contract as `ServiceReaders.
  * EsTransport` / `LlmOps`): production opens a socket, specs run a
  * loopback server or a canned responder.
  */
object MongoReader {

  /** One request->response exchange on an open connection. */
  trait Channel {
    def roundTrip(msg: Array[Byte]): Array[Byte]
    def close(): Unit
  }

  type ChannelFactory = (String, Int) => Channel

  /** Real socket channel: length-prefixed framing in both directions,
    * explicit timeouts so a dead mongod fails the read instead of
    * hanging the driver.
    */
  def socketChannel: ChannelFactory = (host, port) => {
    val s = new java.net.Socket()
    s.connect(new java.net.InetSocketAddress(host, port), 15000)
    s.setSoTimeout(60000)
    val in = new BufferedInputStream(s.getInputStream)
    val out = new BufferedOutputStream(s.getOutputStream)
    new Channel {
      def roundTrip(msg: Array[Byte]): Array[Byte] = {
        out.write(msg); out.flush()
        readFrame(in)
      }
      def close(): Unit = s.close()
    }
  }

  /** Read one wire message (messageLength prefix includes itself). */
  private[readers] def readFrame(in: InputStream): Array[Byte] = {
    val head = in.readNBytes(4)
    require(head.length == 4, "truncated mongo frame header")
    val len = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(len >= 16 && len < (1 << 27), s"implausible mongo frame length $len")
    val rest = in.readNBytes(len - 4)
    require(rest.length == len - 4, "truncated mongo frame body")
    val buf = ByteBuffer.allocate(len)
    buf.put(head).put(rest)
    buf.array()
  }

  // ---------------------------------------------------------------- BSON

  /** Minimal BSON codec over jackson trees: encodes command documents,
    * decodes replies. Non-JSON BSON types render in Extended-JSON spirit
    * (ObjectId → hex string, datetime → epoch millis, binary → base64,
    * Decimal128 → raw hex string) so the result stays `read.json`-able.
    */
  private[readers] object Bson {
    val mapper = new ObjectMapper()

    def encodeDoc(node: ObjectNode): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      writeDoc(node, out)
      out.toByteArray
    }

    private def writeDoc(node: JsonNode, out: ByteArrayOutputStream): Unit = {
      val body = new ByteArrayOutputStream()
      val fields: Iterator[(String, JsonNode)] =
        if (node.isArray) node.elements().asScala.zipWithIndex.map { case (v, i) => (i.toString, v) }
        else node.properties().asScala.iterator.map(e => (e.getKey, e.getValue))
      fields.foreach { case (k, v) => writeElement(k, v, body) }
      val total = 4 + body.size() + 1
      out.write(le32(total))
      body.writeTo(out)
      out.write(0)
    }

    private def le32(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    private def le64(l: Long): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()

    private def cstring(s: String): Array[Byte] = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      val r = new Array[Byte](b.length + 1)
      System.arraycopy(b, 0, r, 0, b.length)
      r
    }

    private def writeElement(key: String, v: JsonNode, out: ByteArrayOutputStream): Unit = {
      def tag(t: Int): Unit = { out.write(t); out.write(cstring(key)) }
      v match {
        case _ if v.isTextual =>
          tag(0x02)
          val b = v.asText().getBytes(StandardCharsets.UTF_8)
          out.write(le32(b.length + 1)); out.write(b); out.write(0)
        case _ if v.isInt => tag(0x10); out.write(le32(v.asInt()))
        case _ if v.isLong => tag(0x12); out.write(le64(v.asLong()))
        case _ if v.isFloatingPointNumber || v.isBigDecimal =>
          tag(0x01); out.write(le64(java.lang.Double.doubleToLongBits(v.asDouble())))
        case _ if v.isBoolean => tag(0x08); out.write(if (v.asBoolean()) 1 else 0)
        case _ if v.isNull => tag(0x0a)
        case _ if v.isArray => tag(0x04); writeDoc(v, out)
        case _ if v.isObject => tag(0x03); writeDoc(v, out)
        case other => throw new IllegalArgumentException(s"unencodable BSON value $other")
      }
    }

    def decodeDoc(buf: ByteBuffer): ObjectNode = {
      val node = mapper.createObjectNode()
      val len = buf.getInt
      val end = buf.position() + len - 4
      while (buf.position() < end - 1) {
        val t = buf.get() & 0xff
        val key = readCString(buf)
        node.set[JsonNode](key, readValue(t, buf))
      }
      require((buf.get() & 0xff) == 0, "BSON document missing terminator")
      node
    }

    private def readCString(buf: ByteBuffer): String = {
      val sb = new ByteArrayOutputStream()
      var b = buf.get()
      while (b != 0) { sb.write(b); b = buf.get() }
      new String(sb.toByteArray, StandardCharsets.UTF_8)
    }

    private def readString(buf: ByteBuffer): String = {
      val n = buf.getInt
      val b = new Array[Byte](n - 1)
      buf.get(b)
      buf.get() // trailing NUL
      new String(b, StandardCharsets.UTF_8)
    }

    private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

    private def readValue(t: Int, buf: ByteBuffer): JsonNode = t match {
      case 0x01 => mapper.getNodeFactory.numberNode(buf.getDouble)
      case 0x02 => mapper.getNodeFactory.textNode(readString(buf))
      case 0x03 => decodeDoc(buf)
      case 0x04 =>
        val doc = decodeDoc(buf)
        val arr = mapper.createArrayNode()
        doc.properties().asScala.foreach(e => arr.add(e.getValue))
        arr
      case 0x05 => // binary: length, subtype byte, payload → base64 text
        val n = buf.getInt; buf.get()
        val b = new Array[Byte](n); buf.get(b)
        mapper.getNodeFactory.textNode(java.util.Base64.getEncoder.encodeToString(b))
      case 0x06 => mapper.nullNode() // undefined (deprecated)
      case 0x07 => // ObjectId → 24-char hex, pymongo's str(ObjectId)
        val b = new Array[Byte](12); buf.get(b)
        mapper.getNodeFactory.textNode(hex(b))
      case 0x08 => mapper.getNodeFactory.booleanNode(buf.get() != 0)
      case 0x09 => mapper.getNodeFactory.numberNode(buf.getLong) // UTC millis
      case 0x0a => mapper.nullNode()
      case 0x0b =>
        val pattern = readCString(buf); val opts = readCString(buf)
        mapper.getNodeFactory.textNode(s"/$pattern/$opts")
      case 0x0d => mapper.getNodeFactory.textNode(readString(buf)) // code
      case 0x10 => mapper.getNodeFactory.numberNode(buf.getInt)
      case 0x11 => mapper.getNodeFactory.numberNode(buf.getLong) // internal timestamp
      case 0x12 => mapper.getNodeFactory.numberNode(buf.getLong)
      case 0x13 => // Decimal128: surface raw little-endian hex, lossless
        val b = new Array[Byte](16); buf.get(b)
        mapper.getNodeFactory.textNode(s"decimal128:0x${hex(b.reverse)}")
      case 0x7f | 0xff => mapper.nullNode() // MaxKey / MinKey
      case other => throw new IllegalStateException(f"unsupported BSON type 0x$other%02x")
    }
  }

  // -------------------------------------------------------------- OP_MSG

  private val OpMsg = 2013
  private val reqCounter = new java.util.concurrent.atomic.AtomicInteger(1)

  /** Frame one command document as an OP_MSG with a single kind-0 body
    * section (checksum/moreToCome flags clear).
    */
  private[readers] def opMsg(body: ObjectNode): Array[Byte] = {
    val doc = Bson.encodeDoc(body)
    val len = 16 + 4 + 1 + doc.length
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(len)
    buf.putInt(reqCounter.getAndIncrement())
    buf.putInt(0) // responseTo
    buf.putInt(OpMsg)
    buf.putInt(0) // flagBits
    buf.put(0.toByte) // section kind 0
    buf.put(doc)
    buf.array()
  }

  /** Parse an OP_MSG reply's kind-0 body; raises on command failure. */
  private[readers] def parseReply(msg: Array[Byte]): ObjectNode = {
    val buf = ByteBuffer.wrap(msg).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getInt
    require(len == msg.length, s"frame length $len != ${msg.length}")
    buf.getInt; buf.getInt // requestID, responseTo
    val op = buf.getInt
    require(op == OpMsg, s"expected OP_MSG reply, got opcode $op")
    buf.getInt // flagBits (checksum unsupported; servers only set it if asked)
    var body: ObjectNode = null
    while (buf.remaining() > 0 && body == null) {
      val kind = buf.get() & 0xff
      kind match {
        case 0 => body = Bson.decodeDoc(buf)
        case 1 => // document-sequence section: skip (find replies use body cursors)
          val start = buf.position()
          val size = buf.getInt
          buf.position(start + size)
        case other => throw new IllegalStateException(s"unknown OP_MSG section kind $other")
      }
    }
    require(body != null, "OP_MSG reply carried no body section")
    val ok = Option(body.get("ok")).exists(_.asDouble() == 1.0)
    if (!ok) {
      val msgTxt = Option(body.get("errmsg")).map(_.asText()).getOrElse(body.toString)
      throw new IllegalStateException(s"mongo command failed: $msgTxt")
    }
    body
  }

  private def runCommand(ch: Channel, body: ObjectNode): ObjectNode =
    parseReply(ch.roundTrip(opMsg(body)))

  // ---------------------------------------------------------------- read

  /** Read `database.collection` into a DataFrame.
    *
    * @param url        mongodb://host:port (path/options may carry db.coll)
    * @param filterJson BSON-expressible JSON filter (pymongo `query` arg)
    * @param limit      0 = no limit (pymongo semantics)
    * @param maxDocs    hard safety bound on the driver-side pull
    */
  def read(
      spark: SparkSession,
      url: String,
      database: String,
      collection: String,
      filterJson: String = "{}",
      limit: Int = 0,
      batchSize: Int = 1000,
      maxDocs: Int = 1000000,
      channelFactory: ChannelFactory = socketChannel
  ): DataFrame = {
    import spark.implicits._
    val uri = new URI(url)
    val host = Option(uri.getHost).getOrElse("localhost")
    val port = if (uri.getPort > 0) uri.getPort else 27017
    val bound = if (limit > 0) math.min(limit, maxDocs) else maxDocs

    val records = Seq.newBuilder[String]
    val ch = channelFactory(host, port)
    try {
      val find = Bson.mapper.createObjectNode()
      find.put("find", collection)
      find.set[JsonNode]("filter", Bson.mapper.readTree(filterJson))
      if (limit > 0) find.put("limit", limit)
      find.put("batchSize", batchSize)
      find.put("$db", database)
      var reply = runCommand(ch, find)

      var n = 0
      var cursorId = 0L
      var done = false
      while (!done) {
        val cursor = Option(reply.get("cursor")).collect { case o: ObjectNode => o }
          .getOrElse(throw new IllegalStateException("find reply carried no cursor"))
        val batch = Seq("firstBatch", "nextBatch").iterator
          .flatMap(k => Option(cursor.get(k)))
          .collectFirst { case a: ArrayNode => a }
          .getOrElse(Bson.mapper.createArrayNode())
        batch.elements().asScala.foreach { d =>
          if (n < bound) { records += Bson.mapper.writeValueAsString(d); n += 1 }
        }
        cursorId = Option(cursor.get("id")).map(_.asLong()).getOrElse(0L)
        done = cursorId == 0L || n >= bound
        if (!done) {
          val more = Bson.mapper.createObjectNode()
          more.put("getMore", cursorId)
          more.put("collection", collection)
          more.put("batchSize", batchSize)
          more.put("$db", database)
          reply = runCommand(ch, more)
        }
      }
      // curtail a live cursor we abandoned (bound hit before exhaustion)
      if (cursorId != 0L) {
        val kill = Bson.mapper.createObjectNode()
        kill.put("killCursors", collection)
        val ids = Bson.mapper.createArrayNode(); ids.add(cursorId)
        kill.set[JsonNode]("cursors", ids)
        kill.put("$db", database)
        scala.util.Try(runCommand(ch, kill))
      }
    } finally ch.close()
    spark.read.json(spark.createDataset(records.result()))
  }

  /** Split a DataRef into (database, collection): explicit options win,
    * else the URL path (`mongodb://h/db.coll` or `/db/coll`).
    */
  private[readers] def dbColl(ref: DataRef): (String, String) = {
    val fromOpts = for {
      d <- ref.options.get("database")
      c <- ref.options.get("collection")
    } yield (d, c)
    fromOpts.getOrElse {
      val path = Option(new URI(ref.url).getPath).getOrElse("").stripPrefix("/")
      val parts =
        if (path.contains("/")) path.split("/", 2).toSeq
        else if (path.contains(".")) path.split("\\.", 2).toSeq
        else Seq.empty
      parts match {
        case Seq(d, c) if d.nonEmpty && c.nonEmpty => (d, c)
        case _ => throw new IllegalArgumentException(
          s"mongo ref needs database+collection options or a /db.coll path: ${ref.url}")
      }
    }
  }
}

class MongoReaderImpl extends Reader {
  val name = "mongo_reader"
  val implementsKinds = Set("mongo")
  def read(spark: SparkSession, ref: DataRef): DataFrame = {
    val (db, coll) = MongoReader.dbColl(ref)
    MongoReader.read(spark, ref.url, db, coll,
      filterJson = ref.options.getOrElse("filter", "{}"),
      limit = ref.options.getOrElse("limit", "0").toInt)
  }
}
