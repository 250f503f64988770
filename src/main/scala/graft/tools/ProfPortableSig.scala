package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B for the r21 byte-streaming portable-MinHash UDF
  * ([[graft.ops.Dedup.withPortableMinhashSignature]]) vs the r20
  * string-building loop (slice + mkString(" ") + full re-encode per
  * shingle), kept here as the reference implementation — on a
  * replicated doc slice so the signature map side dominates.
  * `sbt "runMain graft.tools.ProfPortableSig [sfDir] [replicas]"`.
  */
object ProfPortableSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = if (args.length > 1) args(1).toInt else 10
    val out = s"/tmp/prof_portable_x$replicas"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!new java.io.File(s"$out/documents.parquet").exists())
      ProbeData.replicateDocs(spark, sfDir, replicas, out)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"[prof] corpus: ${docs.count()} docs")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    // r20 reference loop: build each shingle STRING, encode, digest.
    val (a, b) = graft.ops.Dedup.portableCoeffs(16, 42L)
    val aArr = a.toArray; val bArr = b.toArray
    val p = 2147483647L
    val oldUdf = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        val md = graft.core.Token.md5()
        val arr = toks.toArray
        val out = Array.fill(16)(Long.MaxValue)
        val shingleIt: Iterator[String] =
          if (arr.length < 3) Iterator(arr.mkString(" "))
          else (0 to arr.length - 3).iterator.map(i => arr.slice(i, i + 3).mkString(" "))
        shingleIt.foreach { s =>
          md.reset()
          val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var le = 0L
          var i = 7
          while (i >= 0) { le = (le << 8) | (d(i) & 0xffL); i -= 1 }
          val h = java.lang.Long.remainderUnsigned(le, p)
          var j = 0
          while (j < 16) { val v = (aArr(j) * h + bArr(j)) % p; if (v < out(j)) out(j) = v; j += 1 }
        }
        out
      }
    }
    val newSig = graft.ops.Dedup
      .withPortableMinhashSignature(docs.repartition(32), "text", "sig", 3, 16)
      .select(sum(element_at(col("sig"), 1)).as("c"))
    val oldSig = docs.repartition(32)
      .withColumn("sig", oldUdf(graft.ops.TextOps.tokens(col("text"))))
      .select(sum(element_at(col("sig"), 1)).as("c"))
    newSig.collect(); oldSig.collect() // shared untimed warmup
    var parity = (0L, 0L)
    for (r <- 1 to 3) {
      val n = time(s"round $r byte-stream (r21)")(newSig.head.getLong(0))
      val o = time(s"round $r string-build (r20)")(oldSig.head.getLong(0))
      parity = (n, o)
    }
    println(s"[prof] checksum new=${parity._1} old=${parity._2} equal=${parity._1 == parity._2}")
    spark.stop()
  }
}
