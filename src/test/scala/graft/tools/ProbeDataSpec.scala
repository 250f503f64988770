package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ProbeData's driver-side precomputed sign pattern to the
  * Catalyst expression it replaced (`pmod(xxhash64(i, lit(r)), 2)`
  * parity): the derived probe corpora must stay BIT-IDENTICAL across
  * the refactor, or scale exponents stop being comparable across
  * rounds.
  */
class ProbeDataSpec extends SparkSpec {
  import spark.implicits._

  test("signPattern equals the Catalyst xxhash64-parity expression for every (dim, replica)") {
    val dim = 64
    for (r <- 1 to 5) {
      val catalystSigns = Seq(1).toDF("x")
        .select(transform(sequence(lit(0), lit(dim - 1)),
          i => when(pmod(xxhash64(i, lit(r)), lit(2)) === 0, lit(-1.0f)).otherwise(lit(1.0f))).as("s"))
        .as[Seq[Float]].head()
      assert(ProbeData.signPattern(dim, r).toSeq == catalystSigns, s"replica $r diverged")
    }
  }

  test("sign patterns are distinct across replicas (no cross-replica clone vectors)") {
    val pats = (1 to 100).map(r => ProbeData.signPattern(64, r).toSeq)
    assert(pats.distinct.size == 100)
  }

  test("replicateDocs explode derivation equals the per-replica union formulation") {
    val dir = java.nio.file.Files.createTempDirectory("probedocs").toString
    Seq(
      (0L, "alpha beta  gamma", "en", "web", 17L),
      (3L, "one", "de", "book", 3L),
      (5L, null.asInstanceOf[String], "fr", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    ProbeData.replicateDocs(spark, dir, 3, s"$dir/out")
    val got = spark.read.parquet(s"$dir/out/documents.parquet")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    // the pre-refactor rule: replica r offsets doc_id by r*(max+1) and
    // prefixes every non-space token with "r{r}x" (replica 0 identity)
    val base = Seq(
      (0L, "alpha beta  gamma", "en", "web", 17L),
      (3L, "one", "de", "book", 3L),
      (5L, null.asInstanceOf[String], "fr", "web", 0L))
    val want = (0 until 3).flatMap { r =>
      base.map { case (id, text, lang, src, n) =>
        val t = if (r == 0 || text == null) text
                else text.replaceAll("(\\S+)", s"r${r}x$$1")
        (id + r * 6L, t, lang, src, n)
      }
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("replicateEmbeddings handles ragged and null rows without null-padding") {
    val dir = java.nio.file.Files.createTempDirectory("probedata").toString
    Seq(
      (0L, Array(1.0f, 2.0f, 3.0f, 4.0f), "a"),
      (1L, Array(5.0f, 6.0f), "b"),                       // ragged: shorter row
      (2L, null.asInstanceOf[Array[Float]], "c")          // null embedding
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    ProbeData.replicateEmbeddings(spark, dir, 2, s"$dir/out")
    val out = spark.read.parquet(s"$dir/out/embeddings.parquet")
      .as[(Long, Seq[Float], String)].collect().map(r => r._1 -> r._2).toMap
    assert(out.size == 6)
    // replica 0 is the identity
    assert(out(0L) == Seq(1.0f, 2.0f, 3.0f, 4.0f) && out(1L) == Seq(5.0f, 6.0f) && out(2L) == null)
    // replica 1: per-dimension sign flip, ragged row keeps its OWN
    // length (the zip_with formulation null-padded it to dim 4)
    val sgn = ProbeData.signPattern(4, 1)
    assert(out(3L) == Seq(1.0f, 2.0f, 3.0f, 4.0f).zip(sgn).map { case (v, s) => v * s })
    assert(out(4L) == Seq(5.0f, 6.0f).zip(sgn.take(2)).map { case (v, s) => v * s })
    assert(out(4L).forall(_ != null), "ragged row must not null-pad")
    assert(out(5L) == null)
  }
}
