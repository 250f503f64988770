package graft.readers

import graft.datatypes.DataRef
import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{Socket, URI}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native Redis reader (reference `readers.py:3397` Redis via redis-py):
  * speaks RESP2 directly over a socket — no client library — and maps a
  * keyspace to rows `(key, type, value_json)` with string/hash/list/set/
  * zset values rendered as JSON.
  *
  * Scale shape: the driver enumerates keys with cursor-bounded `SCAN`
  * (metadata-sized; `maxKeys` caps it), then the KEYS distribute and each
  * partition opens its own connection to fetch values executor-side — the
  * same driver-plans/executors-fetch split as the JDBC and service
  * readers. cite readers.py:3397-3416.
  */
object RedisReader {

  /** Minimal RESP2 codec over a socket. */
  private[readers] class Resp(in: InputStream, out: OutputStream) {
    private def writeCmd(args: Seq[String]): Unit = {
      val sb = new StringBuilder
      sb.append('*').append(args.length).append("\r\n")
      args.foreach { a =>
        val b = a.getBytes(StandardCharsets.UTF_8)
        sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
      out.flush()
    }

    private def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }

    /** One reply: String (simple/bulk), Long, null, or Seq[Any]. */
    def readReply(): Any = {
      val line = readLine()
      require(line.nonEmpty, "empty RESP reply")
      line.charAt(0) match {
        case '+' => line.substring(1)
        case '-' => throw new IllegalStateException(s"redis error: ${line.substring(1)}")
        case ':' => line.substring(1).toLong
        case '$' =>
          val n = line.substring(1).toInt
          if (n < 0) null
          else {
            val buf = new Array[Byte](n)
            var off = 0
            while (off < n) {
              val r = in.read(buf, off, n - off)
              require(r >= 0, "truncated RESP bulk string")
              off += r
            }
            in.read(); in.read() // \r\n
            new String(buf, StandardCharsets.UTF_8)
          }
        case '*' =>
          val n = line.substring(1).toInt
          if (n < 0) null else (0 until n).map(_ => readReply())
        case c => throw new IllegalStateException(s"unexpected RESP type byte '$c'")
      }
    }

    def cmd(args: String*): Any = { writeCmd(args); readReply() }
  }

  /** Connect with explicit timeouts: a dead server fails the job
    * instead of hanging a driver scan or an executor task forever.
    */
  private def connect(host: String, port: Int): Socket = {
    val s = new Socket()
    s.connect(new java.net.InetSocketAddress(host, port), 15000)
    s.setSoTimeout(60000)
    s
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Fetch one key's typed value as (type, valueJson). */
  private[readers] def fetchValue(r: Resp, key: String): (String, String) = {
    val t = String.valueOf(r.cmd("TYPE", key))
    val v = t match {
      case "string" => jsonStr(String.valueOf(r.cmd("GET", key)))
      case "hash" =>
        val flat = r.cmd("HGETALL", key).asInstanceOf[Seq[Any]].map(String.valueOf)
        flat.grouped(2).collect { case Seq(k, v2) => s"${jsonStr(k)}:${jsonStr(v2)}" }
          .mkString("{", ",", "}")
      case "list" =>
        r.cmd("LRANGE", key, "0", "-1").asInstanceOf[Seq[Any]]
          .map(x => jsonStr(String.valueOf(x))).mkString("[", ",", "]")
      case "set" =>
        r.cmd("SMEMBERS", key).asInstanceOf[Seq[Any]]
          .map(x => jsonStr(String.valueOf(x))).sorted.mkString("[", ",", "]")
      case "zset" =>
        r.cmd("ZRANGE", key, "0", "-1", "WITHSCORES").asInstanceOf[Seq[Any]].map(String.valueOf)
          .grouped(2).collect { case Seq(m, s) =>
            // Redis scores can be inf/-inf/nan (ZADD +inf is a common
            // pin idiom) — not valid JSON numbers; quote those
            val score = if (s.toDoubleOption.exists(d => !d.isNaN && !d.isInfinite)) s else jsonStr(s)
            s"[${jsonStr(m)},$score]"
          }.mkString("[", ",", "]")
      case other => jsonStr(s"<unsupported type $other>")
    }
    (t, v)
  }

  /** Read `redis://host:port` (optional `?pattern=glob&db=N`) into
    * (key, type, value_json) rows.
    */
  def read(
      spark: SparkSession,
      url: String,
      pattern: String = "*",
      db: Int = 0,
      maxKeys: Int = 1000000,
      numPartitions: Int = 0
  ): DataFrame = {
    import spark.implicits._
    val uri = new URI(url)
    val host = uri.getHost
    val port = if (uri.getPort > 0) uri.getPort else 6379
    // driver-side cursor scan: keys only, bounded. SCAN guarantees
    // at-least-once (a key can reappear across cursor pages during
    // rehash), so collect into an insertion-ordered set to dedupe.
    val keys = new scala.collection.mutable.LinkedHashSet[String]
    val sock = connect(host, port)
    try {
      val r = new Resp(new BufferedInputStream(sock.getInputStream), new BufferedOutputStream(sock.getOutputStream))
      if (db != 0) r.cmd("SELECT", db.toString)
      var cursor = "0"
      var done = false
      while (!done) {
        val reply = r.cmd("SCAN", cursor, "MATCH", pattern, "COUNT", "500").asInstanceOf[Seq[Any]]
        cursor = String.valueOf(reply.head)
        val page = reply(1).asInstanceOf[Seq[Any]].map(String.valueOf)
        page.foreach { k => if (keys.size < maxKeys) keys.add(k) }
        done = cursor == "0" || keys.size >= maxKeys
      }
    } finally sock.close()
    val parts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val keyDs = spark.createDataset(keys.toSeq).repartition(parts)
    // executor-side value fetch, one connection per partition
    keyDs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val s = connect(host, port)
        val r = new Resp(new BufferedInputStream(s.getInputStream), new BufferedOutputStream(s.getOutputStream))
        if (db != 0) r.cmd("SELECT", db.toString)
        val out = it.map { k => val (t, v) = fetchValue(r, k); (k, t, v) }.toVector
        s.close()
        out.iterator
      }
    }.toDF("key", "type", "value_json")
  }
}

class RedisReaderImpl extends Reader {
  val name = "redis_reader"
  val implementsKinds = Set("redis")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    RedisReader.read(spark, ref.url,
      pattern = ref.options.getOrElse("pattern", "*"),
      db = ref.options.getOrElse("db", "0").toInt)
}

class InfluxReaderImpl extends Reader {
  val name = "influx_reader"
  val implementsKinds = Set("influx")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    graft.catalog.ServiceReaders.readInflux(spark, ref.url)
}
