package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** LLM-service operators: embedding and completion over a text column by
  * calling an HTTP endpoint from the executors (the reference runs these
  * driver-side per-call — reference intake/readers/readers.py:769
  * LlamaCPPCompletion, :785 LlamaCPPEmbedding, :814 OpenAICompletion;
  * here they are `mapPartitions` operators: one connection per
  * partition, requests batched, rows streamed — the only shape that
  * survives 100 TB).
  *
  * The transport is injectable: [[HttpTransport]] posts JSON to a real
  * endpoint (llama.cpp/OpenAI-style servers); tests and offline runs use
  * a deterministic [[HashEmbedTransport]]. No service lifecycle is
  * managed here — pointing at a served model is configuration.
  */
object LlmOps {

  /** Non-2xx response, with the status code for retry classification. */
  final class HttpStatusException(val code: Int, msg: String)
      extends java.io.IOException(msg)

  /** One request batch: texts in → one vector or string per text out. */
  trait Transport extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Float]]
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Minimal JSON-over-HTTP transport for OpenAI-shaped endpoints
    * (`/v1/embeddings`, `/v1/completions`). Connection reuse comes from
    * the JVM's keep-alive pooling; one transport instance per partition.
    *
    * Retries: a 100 TB embed pass makes millions of requests from
    * hundreds of executors — transient connection resets and 429/5xx
    * throttle responses are CERTAIN, and one must not fail a 20-minute
    * task. Bounded exponential backoff (`maxRetries` retries, so
    * maxRetries+1 attempts total; base `backoffMs` doubling per attempt,
    * each sleep multiplied by a uniform random factor in [0.5, 1.0] so a
    * fleet of throttled executors de-synchronizes instead of re-spiking
    * the endpoint in lockstep) on IOException and retryable status
    * codes; 4xx application errors (except 429) fail fast — retrying a
    * malformed request burns quota for nothing.
    */
  final class HttpTransport(baseUrl: String, model: String = "default", apiKey: String = "",
      maxRetries: Int = 3, backoffMs: Long = 200L)
      extends Transport {
    private def postOnce(path: String, body: String): String = {
      val conn = new java.net.URL(baseUrl + path).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      if (apiKey.nonEmpty) conn.setRequestProperty("Authorization", s"Bearer $apiKey")
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      val code = conn.getResponseCode
      if (code >= 200 && code < 300)
        new String(conn.getInputStream.readAllBytes(), "UTF-8")
      else {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), "UTF-8")).getOrElse("")
        throw new HttpStatusException(code, s"$path -> HTTP $code: ${err.take(200)}")
      }
    }
    private def retryable(t: Throwable): Boolean = t match {
      case e: HttpStatusException => e.code == 429 || e.code >= 500
      case _: java.io.IOException => true
      case _                      => false
    }
    private def post(path: String, body: String): String = {
      var attempt = 0
      while (true) {
        try return postOnce(path, body)
        catch {
          case t: Throwable if retryable(t) && attempt < maxRetries =>
            attempt += 1
            val base = backoffMs * (1L << (attempt - 1))
            // uniform jitter in [base/2, base]: keeps the bound while
            // spreading a fleet's synchronized retries over half a window
            val jittered =
              base / 2 + java.util.concurrent.ThreadLocalRandom.current().nextLong(base / 2 + 1)
            Thread.sleep(jittered)
        }
      }
      throw new IllegalStateException("unreachable")
    }
    private def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"'           => "\\\""
        case '\\'          => "\\\\"
        case '\n'          => "\\n"
        case '\r'          => "\\r"
        case '\t'          => "\\t"
        // remaining control chars (< 0x20) are invalid raw in JSON strings —
        // real corpus text contains them, so escape as \u00XX
        case c if c < ' '  => f"\\u${c.toInt}%04x"
        case c             => c.toString
      } + "\""

    def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val body = s"""{"model":${jsonStr(model)},"input":[${texts.map(jsonStr).mkString(",")}]}"""
      val resp = post("/v1/embeddings", body)
      // minimal parse: arrays under "embedding":[...]
      "\"embedding\"\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(resp).map { m =>
        m.group(1).split(",").filter(_.nonEmpty).map(_.trim.toFloat)
      }.toSeq
    }
    def complete(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val resp = post("/v1/completions", s"""{"model":${jsonStr(model)},"prompt":${jsonStr(p)}}""")
      "\"text\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(resp).map(_.group(1)).getOrElse("")
    }
  }

  /** Deterministic offline stand-in: feature-hash n-grams into a fixed
    * dim (a real, if crude, embedding — not random), echo completions.
    */
  final class HashEmbedTransport(dim: Int = 64) extends Transport {
    def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](dim)
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (toks ++ toks.sliding(2).map(_.mkString(" "))).foreach { g =>
        val h = scala.util.hashing.MurmurHash3.stringHash(g)
        v(math.abs(h % dim)) += (if (((h >> 16) & 1) == 0) 1f else -1f)
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (norm > 0) v.map(_ / norm) else v
    }
    def complete(prompts: Seq[String]): Seq[String] = prompts.map(p => s"[stub completion for ${p.take(20)}]")
  }

  /** Append an `embedding: array<float>` column by batching `textCol`
    * through the transport, `batchSize` texts per request, one transport
    * per partition.
    */
  def embedText(df: DataFrame, textCol: String, transport: Transport, batchSize: Int = 32): DataFrame = {
    val schema = df.schema.add(StructField("embedding", ArrayType(FloatType)))
    val idx = df.schema.fieldIndex(textCol)
    val out = df.rdd.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        val vecs = transport.embed(batch.map(r => String.valueOf(r.get(idx))))
        batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Append a `completion: string` column. */
  def completeText(df: DataFrame, promptCol: String, transport: Transport, batchSize: Int = 8): DataFrame = {
    val schema = df.schema.add(StructField("completion", StringType))
    val idx = df.schema.fieldIndex(promptCol)
    val out = df.rdd.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        val outs = transport.complete(batch.map(r => String.valueOf(r.get(idx))))
        batch.zip(outs).map { case (r, c) => Row.fromSeq(r.toSeq :+ c) }
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }
}
