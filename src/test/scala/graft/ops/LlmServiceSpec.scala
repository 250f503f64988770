package graft.ops

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import graft.SparkSpec
import graft.datatypes.DataRef
import org.apache.spark.sql.functions._

/** E2E lifecycle: GGUF DataRef → spawned (fake) llama.cpp server process →
  * health poll → OpenAI transport → distributed embed/complete — the whole
  * reference chain (readers.py:583 LlamaServerReader, convert.py:561/569)
  * against a REAL child process, offline (FakeLlamaServer).
  */
class LlmServiceSpec extends SparkSpec {
  import spark.implicits._

  /** A shell shim standing in for the llama-server binary: launches
    * FakeLlamaServer from this JVM's classpath with the argv the manager
    * builds (`exe -m model --host h --port p ...`). */
  private lazy val fakeExe: Path = {
    val cp = System.getProperty("java.class.path")
    val java = System.getProperty("java.home") + "/bin/java"
    val script = Files.createTempFile("fake-llama-server", ".sh",
      PosixFilePermissions.asFileAttribute(PosixFilePermissions.fromString("rwx------")))
    Files.writeString(script,
      s"""#!/bin/sh
         |exec "$java" -cp "$cp" graft.ops.FakeLlamaServer "$$@"
         |""".stripMargin)
    script
  }

  private lazy val ggufModel: Path = {
    val f = Files.createTempFile("model", ".gguf")
    Files.write(f, "GGUF".getBytes("ISO-8859-1") ++ Array.fill[Byte](16)(0))
    f
  }

  test("autoArgs derives --ctx-size from GGUF metadata; user args always win") {
    val meta = Map[String, Any]("general.architecture" -> "llama",
      "llama.context_length" -> 4096L)
    assert(LlmService.autoArgs(meta, Nil) == Seq("ctx-size" -> Some("4096")))
    // explicit ctx wins, through the short name too
    assert(LlmService.autoArgs(meta, Seq("c" -> Some("2048"))) == Seq("c" -> Some("2048")))
    assert(LlmService.autoArgs(meta, Seq("ctx_size" -> Some("1024"))) ==
      Seq("ctx_size" -> Some("1024")))
    // no architecture keys -> nothing derived
    assert(LlmService.autoArgs(Map("version" -> 3), Seq("verbose" -> None)) ==
      Seq("verbose" -> None))
    // a REAL crafted GGUF KV section parses end-to-end
    val bb = java.nio.ByteBuffer.allocate(256).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GGUF".getBytes("ISO-8859-1")).putInt(3).putLong(0L).putLong(2L)
    def putStr(s: String): Unit = { bb.putLong(s.length); bb.put(s.getBytes("UTF-8")) }
    putStr("general.architecture"); bb.putInt(8); putStr("llama")
    putStr("llama.context_length"); bb.putInt(4); bb.putInt(8192)
    val f = Files.createTempFile("meta", ".gguf")
    Files.write(f, java.util.Arrays.copyOf(bb.array(), bb.position()))
    val derived = LlmService.autoArgs(LlmService.ggufMetadata(f.toString), Nil)
    assert(derived == Seq("ctx-size" -> Some("8192")))
  }

  test("normalizeArgs: short names expand, underscores dash, bare flags pass") {
    val out = LlmService.normalizeArgs(Seq(
      "c" -> Some("2048"),           // short -> --ctx-size 2048
      "n_gpu_layers" -> Some("0"),   // underscore -> dash
      "verbose" -> None,             // bare flag
      "--log-disable" -> Some("")))  // already-dashed, empty value -> bare
    assert(out == Seq("--ctx-size", "2048", "--n-gpu-layers", "0", "--verbose", "--log-disable"))
    // nkvo must map to llama.cpp's real flag (the reference map carries
    // a "no-ko-offload" typo we deliberately diverge from)
    assert(LlmService.normalizeArgs(Seq("nkvo" -> None)) == Seq("--no-kv-offload"))
  }

  test("start refuses a non-GGUF model and a missing executable loudly") {
    val notGguf = Files.createTempFile("model", ".gguf")
    Files.write(notGguf, "NOPE".getBytes("ISO-8859-1"))
    val e = intercept[IllegalArgumentException] {
      LlmService.start(notGguf.toString, executable = Some(fakeExe.toString))
    }
    assert(e.getMessage.contains("bad magic"))
  }

  test("start spawns, health-polls through a slow boot, serves, and stops") {
    val h = LlmService.start(
      ggufModel.toString,
      executable = Some(fakeExe.toString),
      args = Seq("startup_delay_ms" -> Some("800")), // forces >1 poll round
      startupTimeoutSec = 30)
    try {
      assert(h.alive)
      assert(h.url.startsWith("http://127.0.0.1:"))
      assert(h.openAiUrl.endsWith("/v1"))
      // the transport speaks OpenAI against the spawned process — from
      // executors via mapPartitions, the LlmOps scale shape
      val docs = Seq((0L, "hello spark"), (1L, "hello spark"), (2L, "other")).toDF("id", "text")
      val emb = LlmOps.embedText(docs, "text", h.transport(), batchSize = 2)
        .select(col("id"), col("embedding")).as[(Long, Seq[Float])].collect().toMap
      assert(emb(0L) == emb(1L) && emb(0L) != emb(2L))
      assert(emb(0L) == FakeLlamaServer.detEmbedding("hello spark").toSeq)
      val comp = LlmOps.completeText(docs, "text", h.transport(), batchSize = 2)
        .select(col("id"), col("completion")).as[(Long, String)].collect().toMap
      assert(comp(2L) == "echo:other")
    } finally h.stop()
    assert(!h.alive)
    assert(h.process.exists(!_.isAlive))
  }

  test("startup failure: early process death fails fast with the log path") {
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] {
      LlmService.start(
        ggufModel.toString,
        executable = Some(fakeExe.toString),
        args = Seq("die" -> None),
        startupTimeoutSec = 60)
    }
    assert(e.getMessage.contains("could not start") && e.getMessage.contains(".log"))
    // died-process detection, not timeout expiry (readers.py:755 P.poll())
    assert((System.nanoTime() - t0) < 30L * 1000000000L)
  }

  test("startOrAttach attaches to a live server instead of respawning; attach never kills") {
    val h1 = LlmService.start(ggufModel.toString, executable = Some(fakeExe.toString))
    try {
      val port = h1.url.split(":").last.toInt
      val h2 = LlmService.startOrAttach(ggufModel.toString, port = port)
      assert(h2.url == h1.url && h2.process.isEmpty) // attached, not owned
      h2.stop()                                      // non-owning: no kill
      assert(h1.alive)
    } finally h1.stop()
  }

  test("fromGguf runs the whole DataRef chain with option pass-through") {
    val ref = DataRef("gguf", ggufModel.toString,
      Map("executable" -> fakeExe.toString, "startup_timeout" -> "30",
        "startup_delay_ms" -> "200"))
    val h = LlmService.fromGguf(ref)
    try {
      assert(h.alive)
      val Seq(v) = h.transport().embed(Seq("abc"))
      assert(v.toSeq == FakeLlamaServer.detEmbedding("abc").toSeq)
    } finally h.stop()
  }

  test("transport rides out transient 503s with bounded backoff; exhaustion surfaces the status") {
    val h = LlmService.start(ggufModel.toString, executable = Some(fakeExe.toString),
      args = Seq("flaky_fails" -> Some("2"))) // first two data requests 503
    try {
      // default maxRetries=3 absorbs both throttles inside ONE logical call
      val t = new LlmOps.HttpTransport(h.url, backoffMs = 20L)
      val Seq(v) = t.embed(Seq("abc"))
      assert(v.toSeq == FakeLlamaServer.detEmbedding("abc").toSeq)
    } finally h.stop()
    // a fresh server failing more times than the retry budget -> the 503 surfaces
    val h2 = LlmService.start(ggufModel.toString, executable = Some(fakeExe.toString),
      args = Seq("flaky_fails" -> Some("10")))
    try {
      val t2 = new LlmOps.HttpTransport(h2.url, maxRetries = 1, backoffMs = 10L)
      val e = intercept[LlmOps.HttpStatusException] { t2.embed(Seq("abc")) }
      assert(e.code == 503)
    } finally h2.stop()
  }

  test("fromGguf rejects non-gguf refs") {
    intercept[IllegalArgumentException] {
      LlmService.fromGguf(DataRef("parquet", "/tmp/x.parquet"))
    }
  }

  test("real llama-server CLI smoke (PATH-gated: cancels where the binary is absent)") {
    // Everything else in this suite runs against the fake server shim;
    // this one exercises the flag surface [[LlmService.normalizeArgs]]
    // emits against an ACTUAL llama-server --help, where one is
    // installed. The asserted subset is the stable core of the CLI —
    // the full shortArgs map tracks the reference's convenience table,
    // whose tail flags churn across llama.cpp releases.
    val exe = System.getenv("PATH").split(java.io.File.pathSeparator)
      .map(d => java.nio.file.Paths.get(d, "llama-server"))
      .find(p => Files.isRegularFile(p) && Files.isExecutable(p))
    assume(exe.isDefined, "llama-server not on PATH — smoke skipped")
    val proc = new ProcessBuilder(exe.get.toString, "--help").redirectErrorStream(true).start()
    val help = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    proc.waitFor()
    val core = Seq("c" -> "ctx-size", "t" -> "threads", "b" -> "batch-size",
      "ub" -> "ubatch-size", "s" -> "seed", "n" -> "predict",
      "nkvo" -> "no-kv-offload", "np" -> "parallel", "ngl" -> "gpu-layers")
    core.foreach { case (short, long) =>
      assert(LlmService.shortArgs(short) == long, s"shortArgs($short)")
      assert(help.contains(s"--$long"), s"real llama-server --help lacks --$long")
    }
    // the reference map's typo must never resurface
    assert(!help.contains("--no-ko-offload"))
  }
}
