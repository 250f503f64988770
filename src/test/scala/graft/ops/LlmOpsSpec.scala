package graft.ops

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark shuffles data between executors"),
    (1L, "spark shuffles data between executors"),
    (2L, "my cat enjoys sitting on warm laptops")
  ).toDF("id", "text")

  test("embedText appends deterministic unit-norm embeddings via mapPartitions") {
    val t = new LlmOps.HashEmbedTransport(dim = 32)
    val out = LlmOps.embedText(docs, "text", t, batchSize = 2)
    assert(out.columns.contains("embedding"))
    val rows = out.select(col("id"), col("embedding")).as[(Long, Seq[Float])].collect().toMap
    assert(rows(0L) == rows(1L))           // deterministic
    assert(rows(0L).length == 32)
    val norm = math.sqrt(rows(0L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)    // unit norm
    // identical docs cosine 1, unrelated doc lower
    val sim = out.as("a").crossJoin(out.as("b"))
      .filter(col("a.id") === 0 && col("b.id") === 2)
      .select(VectorFunctions.cosineSim(col("a.embedding"), col("b.embedding")))
      .as[Double].head()
    assert(sim < 0.9)
  }

  test("completeText appends completions") {
    val t = new LlmOps.HashEmbedTransport()
    val out = LlmOps.completeText(docs, "text", t)
    val c = out.select("completion").as[String].head()
    assert(c.startsWith("[stub completion"))
  }

  test("embeddings compose with similarity search ops") {
    val t = new LlmOps.HashEmbedTransport(dim = 32)
    val emb = LlmOps.embedText(docs, "text", t)
    val pairs = Similarity.cosineNearDupPairs(emb, "id", "embedding", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
  }
}
