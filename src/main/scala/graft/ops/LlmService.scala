package graft.ops

import java.net.{HttpURLConnection, InetSocketAddress, ServerSocket, Socket, URL}
import java.nio.file.{Files, Path, Paths}

import graft.datatypes.DataRef

/** llama.cpp server lifecycle, driver-side (reference
  * intake/readers/readers.py:583-746 LlamaServerReader, convert.py:561-587
  * GGUFToLlamaCPPService / LLamaCPPServiceToOpenAIService): spawn a local
  * model server from a GGUF file — or attach to one already running —
  * health-poll until ready, and hand back a [[Handle]] whose OpenAI-shaped
  * `/v1` endpoint feeds [[LlmOps.HttpTransport]]. That completes the
  * GGUF → served model → distributed embed/complete chain: the SERVER is a
  * one-per-box driver concern; the REQUESTS stay `mapPartitions`-batched on
  * executors (LlmOps), the only shape that survives 100 TB.
  *
  * Scale note: in cluster mode each executor host would run its own
  * sidecar server (or point at a shared inference tier); this manager owns
  * exactly the reference's scope — one local process, spawn/health/stop —
  * and the transport URL is plain configuration beyond that.
  */
object LlmService {

  /** A running (or attached) model server. `process` is None when
    * attached — stop() then only forgets, never kills, a server this
    * handle does not own (the reference's atexit only terminates
    * processes it spawned).
    */
  final case class Handle(
      url: String,
      process: Option[Process],
      logFile: Option[Path]
  ) {
    def alive: Boolean = process.forall(_.isAlive) && healthOk(url)
    /** llama.cpp serves an OpenAI-compatible surface under /v1
      * (convert.py:569 LLamaCPPServiceToOpenAIService: urljoin(url,"/v1")). */
    def openAiUrl: String = url.stripSuffix("/") + "/v1"
    /** The executor-side transport for [[LlmOps.embedText]]/[[LlmOps.completeText]]. */
    def transport(model: String = "default", apiKey: String = "none"): LlmOps.HttpTransport =
      new LlmOps.HttpTransport(url.stripSuffix("/"), model, apiKey)
    def stop(): Unit = process.foreach { p => p.destroy(); p.waitFor() }
  }

  /** llama.cpp short→long option names (public CLI surface; the same
    * convenience map the reference exposes, readers.py:611-668). */
  val shortArgs: Map[String, String] = Map(
    "v" -> "verbose", "s" -> "seed", "t" -> "threads", "tb" -> "threads-draft",
    "tbd" -> "threads-batch-draft", "ps" -> "p-split",
    "lcs" -> "lookup-cache-static", "lcd" -> "lookup-cache-dynamic",
    "c" -> "ctx-size", "n" -> "predict", "b" -> "batch-size",
    "ub" -> "ubatch-size", "fa" -> "flash-attn", "p" -> "prompt",
    "f" -> "file", "bf" -> "binary-file", "e" -> "escape",
    "ptc" -> "prompt-token-count", "r" -> "reverse-prompt", "sp" -> "special",
    "cnv" -> "conversation", "l" -> "logit-bias", "j" -> "json-schema",
    "gan" -> "grp-attn-n", "gaw" -> "grp-attn-w", "dkvc" -> "dump-kv-cache",
    // deliberate divergence from the reference map (readers.py:611-668),
    // which spells this "no-ko-offload" — llama.cpp's actual flag is
    // --no-kv-offload, and the typo'd form makes the server exit on an
    // unknown option
    "nkvo" -> "no-kv-offload", "ctk" -> "cache-type-k", "ctv" -> "cache-type-v",
    "dt" -> "defrag-thold", "np" -> "parallel", "ns" -> "sequences",
    "cb" -> "cont-batching", "ngl" -> "gpu-layers", "ngld" -> "gpu-layers-draft",
    "sm" -> "split-mode", "ts" -> "tensor-split", "mg" -> "main-gpu",
    "md" -> "model-draft", "o" -> "output", "sps" -> "slot-prompt-similarity",
    "ld" -> "logdir")

  /** Normalize user kwargs to llama.cpp CLI argv: short names expand via
    * [[shortArgs]], '_' becomes '-', a "--" prefix is added unless the key
    * already starts with '-', and a None/empty value emits a bare flag
    * (readers.py:726-739).
    */
  def normalizeArgs(kwargs: Seq[(String, Option[String])]): Seq[String] =
    kwargs.flatMap { case (k0, v) =>
      val k1 = shortArgs.getOrElse(k0, k0).replace('_', '-')
      val k = if (k1.startsWith("-")) k1 else s"--$k1"
      v match {
        case Some(s) if s.nonEmpty => Seq(k, s)
        case _                     => Seq(k)
      }
    }

  /** Read the GGUF metadata KV section off the file's prefix (the same
    * parse `inspect.HeaderParsers.gguf` serves catalogs with —
    * readers.py:2643 GGUFMetadataReader's surface). */
  def ggufMetadata(modelPath: String, capBytes: Int = 1 << 20): Map[String, Any] = {
    val in = Files.newInputStream(Paths.get(modelPath))
    val bytes = try in.readNBytes(capBytes) finally in.close()
    graft.inspect.HeaderParsers.gguf(bytes)
  }

  /** Derive server CLI defaults from the model's own GGUF metadata:
    * `--ctx-size` from `<architecture>.context_length` when the caller
    * didn't choose one. User args always win; a model without the keys
    * (or an unparsable KV section) contributes nothing.
    */
  def autoArgs(metadata: Map[String, Any],
      userArgs: Seq[(String, Option[String])]): Seq[(String, Option[String])] = {
    val userKeys = userArgs.map { case (k, _) =>
      shortArgs.getOrElse(k, k).replace('_', '-').stripPrefix("--") }.toSet
    val ctx = metadata.get("general.architecture").collect { case a: String =>
      metadata.get(s"$a.context_length")
    }.flatten.collect { case n: Number => n.longValue() }
    if (ctx.isEmpty || userKeys.contains("ctx-size")) userArgs
    else userArgs :+ ("ctx-size" -> Some(ctx.get.toString))
  }

  /** Locate the server binary on PATH: `llama-server`, falling back to the
    * pre-rename `server` (readers.py:671-679; the executables were renamed
    * in llama.cpp PR 7809). */
  def findExecutable(): Option[String] = {
    val exts = Seq("llama-server", "server")
    val dirs = sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparatorChar).filter(_.nonEmpty)
    exts.iterator.flatMap { name =>
      dirs.iterator.map(d => Paths.get(d, name)).find(p => Files.isExecutable(p))
    }.toSeq.headOption.map(_.toString)
  }

  def findFreePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  def portInUse(host: String, port: Int): Boolean = {
    val s = new Socket()
    try { s.connect(new InetSocketAddress(host, port), 500); true }
    catch { case _: java.io.IOException => false }
    finally s.close()
  }

  /** GET /health is 200-ok (llama.cpp's readiness endpoint; readers.py:748). */
  def healthOk(url: String): Boolean =
    try {
      val conn = new URL(url.stripSuffix("/") + "/health").openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(1000)
      conn.setReadTimeout(2000)
      val ok = conn.getResponseCode == 200
      conn.disconnect()
      ok
    } catch { case _: java.io.IOException => false }

  /** Spawn a llama.cpp server for a local GGUF model and wait for health.
    *
    * @param modelPath local .gguf file; magic-checked before spawning
    * @param executable server binary; defaults to [[findExecutable]]
    * @param port 0 picks a free port (readers.py:712); a non-zero port
    *             already in use refuses loudly rather than attaching —
    *             attach is the explicit [[attach]] call
    * @param args extra CLI options, normalized via [[normalizeArgs]]
    * @param startupTimeoutSec health-poll budget; on expiry OR early
    *        process death, fail with the log path (readers.py:753-758)
    */
  def start(
      modelPath: String,
      executable: Option[String] = None,
      host: String = "127.0.0.1",
      port: Int = 0,
      args: Seq[(String, Option[String])] = Nil,
      startupTimeoutSec: Int = 60,
      logFile: Option[Path] = None
  ): Handle = {
    val mp = Paths.get(modelPath)
    require(Files.isReadable(mp), s"model file not readable: $modelPath")
    val magic = {
      val in = Files.newInputStream(mp)
      try in.readNBytes(4) finally in.close()
    }
    require(magic.length == 4 && new String(magic, "ISO-8859-1") == "GGUF",
      s"not a GGUF model (bad magic): $modelPath")
    val exe = executable.orElse(findExecutable()).getOrElse(
      throw new IllegalStateException(
        "no llama.cpp server executable found (looked for llama-server, server on PATH)"))
    val p = if (port == 0) findFreePort() else port
    val url = s"http://$host:$p"
    if (portInUse(host, p)) throw new IllegalStateException(s"$url in use")
    val log = logFile.getOrElse(Files.createTempFile("llama-cpp", ".log"))
    // model-derived defaults (ctx-size from the GGUF's own metadata);
    // a stub/truncated KV section contributes nothing rather than failing
    val fullArgs = scala.util.Try(autoArgs(ggufMetadata(modelPath), args)).getOrElse(args)
    val cmd = Seq(exe, "-m", modelPath, "--host", host, "--port", p.toString) ++
      normalizeArgs(fullArgs)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectOutput(ProcessBuilder.Redirect.appendTo(log.toFile))
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val deadline = System.nanoTime() + startupTimeoutSec * 1000000000L
    var up = false
    while (!up) {
      up = healthOk(url)
      if (!up) {
        if (!proc.isAlive || System.nanoTime() > deadline) {
          proc.destroy()
          throw new RuntimeException(
            s"could not start $exe (alive=${proc.isAlive}). See $log for details.")
        }
        Thread.sleep(200)
      }
    }
    // terminate with the JVM, like the reference's atexit (readers.py:760)
    sys.addShutdownHook { if (proc.isAlive) proc.destroy() }
    Handle(url, Some(proc), Some(log))
  }

  /** Attach to an ALREADY-RUNNING server: health-check within the timeout,
    * return a non-owning handle (stop() will not kill it). */
  def attach(url: String, timeoutSec: Int = 10): Handle = {
    val deadline = System.nanoTime() + timeoutSec * 1000000000L
    while (!healthOk(url)) {
      if (System.nanoTime() > deadline)
        throw new RuntimeException(s"no healthy server at $url within ${timeoutSec}s")
      Thread.sleep(200)
    }
    Handle(url, None, None)
  }

  /** Spawn-or-attach: if a server already answers at host:port, attach;
    * otherwise spawn one there. The idempotent entry for notebooks and
    * retried jobs. */
  def startOrAttach(
      modelPath: String,
      host: String = "127.0.0.1",
      port: Int = 8080,
      executable: Option[String] = None,
      args: Seq[(String, Option[String])] = Nil,
      startupTimeoutSec: Int = 60
  ): Handle = {
    val url = s"http://$host:$port"
    if (portInUse(host, port) && healthOk(url)) attach(url)
    else start(modelPath, executable, host, port, args, startupTimeoutSec)
  }

  /** The whole reference chain from a catalog entry: GGUF DataRef →
    * spawned server → handle whose [[Handle.transport]] plugs into
    * LlmOps (convert.py:561 GGUFToLlamaCPPService then :569
    * LLamaCPPServiceToOpenAIService). Recognized DataRef options:
    * `executable`, `host`, `port`, `startup_timeout`; any other option
    * passes through to the server CLI.
    */
  def fromGguf(ref: DataRef): Handle = {
    require(ref.kind == "gguf", s"expected a gguf DataRef, got kind=${ref.kind}")
    val reserved = Set("executable", "host", "port", "startup_timeout")
    val extra = ref.options.view.filterKeys(!reserved.contains(_))
      .map { case (k, v) => k -> (if (v == null || v.isEmpty) None else Some(v)) }.toSeq
    start(
      modelPath = ref.url,
      executable = ref.options.get("executable"),
      host = ref.options.getOrElse("host", "127.0.0.1"),
      port = ref.options.get("port").map(_.toInt).getOrElse(0),
      args = extra,
      startupTimeoutSec = ref.options.get("startup_timeout").map(_.toInt).getOrElse(60)
    )
  }
}
