package graft.readers

import graft.SparkSpec
import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Drives the native RESP client against an in-process fake Redis
  * (ServerSocket speaking RESP2 over a small keyspace) and the Influx
  * reader against a file:// fixture of the published /query JSON shape.
  */
class RedisInfluxSpec extends SparkSpec {

  // ---- fake RESP server ----------------------------------------------
  private val store: Map[String, Any] = Map(
    "user:1" -> "alice",
    "user:2" -> "bob",
    "conf" -> Map("retries" -> "3", "mode" -> "fast"),
    "queue" -> List("a", "b", "c"),
    "tags" -> Set("x", "y")
  )

  private def bulk(s: String) = s"$$${s.getBytes(StandardCharsets.UTF_8).length}\r\n$s\r\n"
  private def arr(xs: Seq[String]) = s"*${xs.length}\r\n" + xs.map(bulk).mkString

  private def serve(sock: java.net.Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out: OutputStream = sock.getOutputStream
    def reply(s: String): Unit = { out.write(s.getBytes(StandardCharsets.UTF_8)); out.flush() }
    try {
      var line = in.readLine()
      while (line != null) {
        if (line.startsWith("*")) {
          val n = line.substring(1).toInt
          val args = (0 until n).map { _ => in.readLine(); in.readLine() } // $len then payload
          args.head.toUpperCase match {
            case "SCAN" =>
              // two-page cursor with one overlapping key: SCAN is
              // at-least-once, the reader must dedupe across pages
              val sorted = store.keys.toSeq.sorted
              if (args(1) == "0") reply(s"*2\r\n${bulk("7")}${arr(sorted.take(3))}")
              else reply(s"*2\r\n${bulk("0")}${arr(sorted.drop(2))}")
            case "TYPE" => store.get(args(1)) match {
              case Some(_: String) => reply("+string\r\n")
              case Some(_: Map[_, _]) => reply("+hash\r\n")
              case Some(_: List[_]) => reply("+list\r\n")
              case Some(_: Set[_]) => reply("+set\r\n")
              case _ => reply("+none\r\n")
            }
            case "GET" => reply(bulk(store(args(1)).asInstanceOf[String]))
            case "HGETALL" =>
              val m = store(args(1)).asInstanceOf[Map[String, String]]
              reply(arr(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(k, v) }))
            case "LRANGE" => reply(arr(store(args(1)).asInstanceOf[List[String]]))
            case "SMEMBERS" => reply(arr(store(args(1)).asInstanceOf[Set[String]].toSeq.sorted))
            case _ => reply("-ERR unknown\r\n")
          }
        }
        line = in.readLine()
      }
    } catch { case _: Throwable => () } finally sock.close()
  }

  test("redis reader scans keys and fetches typed values over RESP") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try while (true) { val s = server.accept(); new Thread(() => serve(s)).start() }
      catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val df = RedisReader.read(spark, s"redis://127.0.0.1:${server.getLocalPort}", numPartitions = 2)
      val collected = df.collect()
      assert(collected.length == store.size) // no dup rows from overlapping SCAN pages
      val rows = collected.map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(rows.keySet == store.keySet)
      assert(rows("user:1") == (("string", "\"alice\"")))
      assert(rows("conf") == (("hash", """{"mode":"fast","retries":"3"}""")))
      assert(rows("queue") == (("list", """["a","b","c"]""")))
      assert(rows("tags") == (("set", """["x","y"]""")))
    } finally server.close()
  }

  test("influx /query response flattens series values with tags") {
    val d = Files.createTempDirectory("influx")
    Files.writeString(d.resolve("query.json"),
      """{"results": [{"statement_id": 0, "series": [
        | {"name": "cpu", "tags": {"host": "a1"},
        |  "columns": ["time", "usage", "core"],
        |  "values": [["2024-01-01T00:00:00Z", 0.5, 0], ["2024-01-01T00:01:00Z", 0.7, 1]]},
        | {"name": "cpu", "tags": {"host": "b2"},
        |  "columns": ["time", "usage", "core"],
        |  "values": [["2024-01-01T00:00:00Z", 0.1, 0]]}
        |]}]}""".stripMargin)
    val df = graft.catalog.ServiceReaders.readInflux(spark, s"file://$d/query.json")
    assert(df.count() == 3)
    assert(df.columns.sorted.toSeq == Seq("core", "series", "tags_json", "time", "usage"))
    assert(df.filter(df("tags_json").contains("b2")).count() == 1)
    assert(df.filter(df("usage") === 0.7).select("core").head().getLong(0) == 1L)
  }

  test("redis/influx readers registered for their kinds") {
    val (ok, _) = SparkReaders.recommend(graft.datatypes.DataRef("redis", "redis://h:6379"))
    assert(ok.exists(_.name == "redis_reader"))
    val (ok2, _) = SparkReaders.recommend(graft.datatypes.DataRef("influx", "http://h:8086/query?db=x&q=y"))
    assert(ok2.exists(_.name == "influx_reader"))
  }
}
