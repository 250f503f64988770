package graft.ops

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

/** Offline stand-in for a llama.cpp server binary: speaks /health plus the
  * native (/completion, /embedding) and OpenAI (/v1/completions,
  * /v1/embeddings) surfaces with DETERMINISTIC responses derived from the
  * input, so LlmServiceSpec can run the full spawn → health-poll →
  * transport chain as a real child process with zero model weights and
  * zero egress. Launched via a shell shim (see spec) exactly the way the
  * lifecycle manager launches llama-server: `exe -m model --host h --port p`.
  */
object FakeLlamaServer {

  def detEmbedding(text: String, dim: Int = 8): Array[Float] = {
    val v = new Array[Float](dim)
    text.foreach(c => v(c % dim) += 1f)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) v.map(_ / n) else v
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  // minimal extraction of "field":"string value" and "field":[...] from
  // the known request bodies (no JSON library in the test classpath)
  private def strField(body: String, field: String): Option[String] =
    ("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body).map(m => m.group(1)
        .replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\"))
  private def strArrayField(body: String, field: String): Seq[String] =
    ("\"" + field + "\"\\s*:\\s*\\[(.*?)\\]").r.findFirstMatchIn(body)
      .map(m => "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
        .map(_.group(1).replace("\\n", "\n").replace("\\\"", "\"")).toSeq)
      .getOrElse(Nil)

  def main(args: Array[String]): Unit = {
    var model = ""
    var host = "127.0.0.1"
    var port = 0
    var delayMs = 0L
    var flakyFails = 0
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-m" | "--model" => model = args(i + 1); i += 2
        case "--host"         => host = args(i + 1); i += 2
        case "--port"         => port = args(i + 1).toInt; i += 2
        case "--startup-delay-ms" => delayMs = args(i + 1).toLong; i += 2
        case "--flaky-fails"  => flakyFails = args(i + 1).toInt; i += 2
        case "--die"          => sys.exit(7) // spec: early-death path
        case _                => i += 1     // tolerate pass-through flags
      }
    }
    // throttle simulation: the first N data-plane requests 503 (retry spec)
    val remainingFails = new java.util.concurrent.atomic.AtomicInteger(flakyFails)
    def maybeThrottle(ex: HttpExchange): Boolean =
      if (remainingFails.getAndDecrement() > 0) {
        respond(ex, 503, """{"error":"loading model"}"""); true
      } else false
    require(model.nonEmpty && Files.isReadable(Paths.get(model)), s"bad -m $model")
    if (delayMs > 0) Thread.sleep(delayMs) // spec: health-poll actually polls
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"ok"}"""))
    server.createContext("/completion", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val p = strField(body, "prompt").getOrElse("")
      respond(ex, 200, s"""{"content":"echo:${p.take(24)}"}""")
    })
    server.createContext("/embedding", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val c = strField(body, "content").getOrElse("")
      respond(ex, 200, s"""{"embedding":[${detEmbedding(c).mkString(",")}]}""")
    })
    server.createContext("/v1/completions", { (ex: HttpExchange) =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val p = strField(body, "prompt").getOrElse("")
      respond(ex, 200, s"""{"choices":[{"text":"echo:${p.take(24)}"}]}""")
    })
    server.createContext("/v1/embeddings", { (ex: HttpExchange) =>
      if (!maybeThrottle(ex)) {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val data = strArrayField(body, "input").zipWithIndex.map { case (t, idx) =>
          s"""{"index":$idx,"embedding":[${detEmbedding(t).mkString(",")}]}"""
        }
        respond(ex, 200, s"""{"data":[${data.mkString(",")}]}""")
      }
    })
    server.start()
    // park the main thread like a real server process
    Thread.currentThread().join()
  }
}
