package graft.readers

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Drives the OP_MSG client against an in-process fake mongod
  * (ServerSocket framing OP_MSG replies with paged cursors), and pins
  * the BSON decoder against hand-assembled bytes from the BSON spec so
  * the codec is not only tested against its own encoder.
  */
class MongoReaderSpec extends SparkSpec {
  private val mapper = MongoReader.Bson.mapper

  // ---- hand-built BSON fixture (spec bytes, not our encoder) ---------
  test("BSON decoder handles spec-assembled bytes incl ObjectId/datetime/binary") {
    val out = new ByteArrayOutputStream()
    def le32(i: Int) = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    def le64(l: Long) = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
    def cstr(s: String) = { out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0) }
    // {"_id": ObjectId(0102..0c), "name": "ada", "n": int32 7,
    //  "big": int64 2^40, "pi": 3.5, "ok": true, "ts": datetime 1700000000000,
    //  "blob": binary [1,2,3], "nested": {"k": null}}
    out.write(0x07); cstr("_id"); out.write((1 to 12).map(_.toByte).toArray)
    out.write(0x02); cstr("name"); out.write(le32(4)); out.write("ada".getBytes); out.write(0)
    out.write(0x10); cstr("n"); out.write(le32(7))
    out.write(0x12); cstr("big"); out.write(le64(1L << 40))
    out.write(0x01); cstr("pi"); out.write(le64(java.lang.Double.doubleToLongBits(3.5)))
    out.write(0x08); cstr("ok"); out.write(1)
    out.write(0x09); cstr("ts"); out.write(le64(1700000000000L))
    out.write(0x05); cstr("blob"); out.write(le32(3)); out.write(0); out.write(Array[Byte](1, 2, 3))
    // nested doc {"k": null}: total = 4 + (1 + 2 + 0) + 1 = 8
    out.write(0x03); cstr("nested"); out.write(le32(8)); out.write(0x0a); cstr("k"); out.write(0)
    val body = out.toByteArray
    val full = ByteBuffer.allocate(4 + body.length + 1).order(ByteOrder.LITTLE_ENDIAN)
    full.putInt(4 + body.length + 1).put(body).put(0.toByte)
    val node = MongoReader.Bson.decodeDoc(ByteBuffer.wrap(full.array()).order(ByteOrder.LITTLE_ENDIAN))
    assert(node.get("_id").asText() == "0102030405060708090a0b0c")
    assert(node.get("name").asText() == "ada")
    assert(node.get("n").asInt() == 7)
    assert(node.get("big").asLong() == (1L << 40))
    assert(node.get("pi").asDouble() == 3.5)
    assert(node.get("ok").asBoolean())
    assert(node.get("ts").asLong() == 1700000000000L)
    assert(node.get("blob").asText() == java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    assert(node.get("nested").get("k").isNull)
  }

  test("BSON encode/decode round-trips command-shaped documents") {
    val doc = mapper.createObjectNode()
    doc.put("find", "users")
    doc.set[JsonNode]("filter", mapper.readTree("""{"age":{"$gt":30},"tags":["a","b"],"active":true}"""))
    doc.put("limit", 5)
    doc.put("skip", 1L << 33)
    doc.put("score", 0.25)
    doc.put("$db", "app")
    val back = MongoReader.Bson.decodeDoc(
      ByteBuffer.wrap(MongoReader.Bson.encodeDoc(doc)).order(ByteOrder.LITTLE_ENDIAN))
    assert(back.get("find").asText() == "users")
    assert(back.get("filter").get("age").get("$gt").asInt() == 30)
    assert(back.get("filter").get("tags").get(1).asText() == "b")
    assert(back.get("filter").get("active").asBoolean())
    assert(back.get("limit").asInt() == 5)
    assert(back.get("skip").asLong() == (1L << 33))
    assert(back.get("score").asDouble() == 0.25)
    assert(back.get("$db").asText() == "app")
  }

  // ---- fake mongod ----------------------------------------------------
  /** 25 documents in db `app`, collection `users`; serves find with
    * batchSize paging through getMore, honors limit, fails unknown cmds.
    */
  private def fakeMongod(server: ServerSocket): Thread = {
    val docs = (1 to 25).map { i =>
      val d = mapper.createObjectNode()
      d.put("_id", i)
      d.put("name", s"user$i")
      d.put("age", 20 + (i % 7))
      d
    }
    def reply(requestId: Int, body: ObjectNode): Array[Byte] = {
      val doc = MongoReader.Bson.encodeDoc(body)
      val len = 16 + 4 + 1 + doc.length
      val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(len).putInt(9999).putInt(requestId).putInt(2013).putInt(0).put(0.toByte).put(doc)
      buf.array()
    }
    def cursorReply(batch: Seq[ObjectNode], cursorId: Long, key: String): ObjectNode = {
      val body = mapper.createObjectNode()
      val cursor = mapper.createObjectNode()
      val arr = mapper.createArrayNode()
      batch.foreach(arr.add)
      cursor.put("id", cursorId)
      cursor.put("ns", "app.users")
      cursor.set[JsonNode](key, arr)
      body.set[JsonNode]("cursor", cursor)
      body.put("ok", 1.0)
      body
    }
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = sock.getInputStream
        val out = sock.getOutputStream
        var remaining: Seq[ObjectNode] = Nil
        var liveCursor = 0L
        while (true) {
          val frame = MongoReader.readFrame(in)
          val buf = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
          buf.getInt; val reqId = buf.getInt; buf.getInt; buf.getInt; buf.getInt; buf.get()
          val cmd = MongoReader.Bson.decodeDoc(buf)
          val body =
            if (cmd.has("find")) {
              assert(cmd.get("find").asText() == "users" && cmd.get("$db").asText() == "app")
              val minAge = Option(cmd.get("filter")).flatMap(f => Option(f.get("age")))
                .flatMap(a => Option(a.get("$gte"))).map(_.asInt()).getOrElse(Int.MinValue)
              val limit = Option(cmd.get("limit")).map(_.asInt()).getOrElse(Int.MaxValue)
              val batchSize = Option(cmd.get("batchSize")).map(_.asInt()).getOrElse(101)
              val matched = docs.filter(_.get("age").asInt() >= minAge).take(limit)
              val (first, rest) = matched.splitAt(batchSize)
              remaining = rest
              liveCursor = if (rest.nonEmpty) 42L else 0L
              cursorReply(first, liveCursor, "firstBatch")
            } else if (cmd.has("getMore")) {
              assert(cmd.get("getMore").asLong() == 42L)
              val batchSize = Option(cmd.get("batchSize")).map(_.asInt()).getOrElse(101)
              val (page, rest) = remaining.splitAt(batchSize)
              remaining = rest
              liveCursor = if (rest.nonEmpty) 42L else 0L
              cursorReply(page, liveCursor, "nextBatch")
            } else if (cmd.has("killCursors")) {
              liveCursor = 0L; remaining = Nil
              val b = mapper.createObjectNode(); b.put("ok", 1.0); b
            } else {
              val b = mapper.createObjectNode()
              b.put("ok", 0.0); b.put("errmsg", s"no such command: ${cmd.fieldNames().next()}")
              b
            }
          out.write(reply(reqId, body)); out.flush()
        }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    t
  }

  test("find pages a cursor through getMore into a DataFrame") {
    val server = new ServerSocket(0)
    fakeMongod(server)
    try {
      val df = MongoReader.read(spark, s"mongodb://127.0.0.1:${server.getLocalPort}",
        "app", "users", batchSize = 10)
      assert(df.count() == 25)
      assert(df.columns.sorted.toSeq == Seq("_id", "age", "name"))
      assert(df.filter(df("_id") === 7).select("name").head().getString(0) == "user7")
    } finally server.close()
  }

  test("filter and limit push to the server command") {
    val server = new ServerSocket(0)
    fakeMongod(server)
    try {
      val df = MongoReader.read(spark, s"mongodb://127.0.0.1:${server.getLocalPort}",
        "app", "users", filterJson = """{"age":{"$gte":25}}""", limit = 4, batchSize = 3)
      val rows = df.collect()
      assert(rows.length == 4)
      assert(rows.forall(_.getAs[Long]("age") >= 25))
    } finally server.close()
  }

  test("server-side command errors surface with errmsg") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = sock.getInputStream
        MongoReader.readFrame(in)
        val b = mapper.createObjectNode()
        b.put("ok", 0.0); b.put("errmsg", "not authorized on app")
        val doc = MongoReader.Bson.encodeDoc(b)
        val len = 16 + 4 + 1 + doc.length
        val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
        buf.putInt(len).putInt(1).putInt(1).putInt(2013).putInt(0).put(0.toByte).put(doc)
        sock.getOutputStream.write(buf.array()); sock.getOutputStream.flush()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try {
      val e = intercept[IllegalStateException] {
        MongoReader.read(spark, s"mongodb://127.0.0.1:${server.getLocalPort}", "app", "users")
      }
      assert(e.getMessage.contains("not authorized"))
    } finally server.close()
  }

  test("mongodb:// urls route to mongo_reader and db/coll parse from path") {
    val ref = graft.datatypes.DataRef("mongo", "mongodb://h:27017/app.users")
    val (ok, _) = SparkReaders.recommend(ref)
    assert(ok.exists(_.name == "mongo_reader"))
    assert(MongoReader.dbColl(ref) == (("app", "users")))
    assert(MongoReader.dbColl(graft.datatypes.DataRef("mongo", "mongodb://h/app/users")) == (("app", "users")))
    assert(MongoReader.dbColl(graft.datatypes.DataRef("mongo", "mongodb://h/x",
      options = Map("database" -> "d", "collection" -> "c"))) == (("d", "c")))
    // detection: the url pattern recommends the mongo kind
    val kinds = graft.datatypes.Detect.recommend("mongodb://host:27017/app.users").map(_.kind.name)
    assert(kinds.contains("mongo"))
  }
}
