package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens windows with overlap and exact boundaries") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: step 3 → ceil((10-1)/3)=3 chunks: [1..4],[4..7],[7..10]
    assert(chunks.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7 w8 w9 w10", 4L)))
    // short doc: one chunk, its own tokens
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "solo", 1L)))
    // empty doc: one empty chunk (shape-preserving)
    assert(chunks.filter(_._1 == 3L).map(c => (c._2, c._3)).toSeq == Seq((0L, "")))
  }

  test("every token position is covered and consecutive chunks overlap") {
    val doc = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = Chunking.chunkByTokens(Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 32, 8)
      .orderBy("chunk_index").collect().map(_.getString(2).split(" ").toSeq)
    assert(out.flatten.distinct.size == 100) // full coverage
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(8) == b.take(8)) // overlap region identical
      case _ => ()
    }
  }

  test("packSequences covers every doc once within budget") {
    val docs = (1L to 500L).map(i => (i, (i % 97) + 1)).toDF("doc_id", "n_tokens")
      .repartition(8)
    val packs = Chunking.packSequences(docs, "doc_id", "n_tokens", budget = 256)
    val rows = packs.collect()
    // coverage: every doc in exactly one pack
    val all = rows.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids"))
    assert(all.length == 500 && all.distinct.length == 500)
    // budget respected (no multi-doc pack exceeds it)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_docs") == 1 || r.getAs[Long]("total_tokens") <= 256)
    }
    // packing is meaningfully dense: average fill over 50%
    val fill = rows.map(_.getAs[Long]("total_tokens")).sum.toDouble / (rows.length * 256)
    assert(fill > 0.5)
  }

  test("packSequencesGlobal is deterministic across partitionings") {
    val base = (1L to 500L).map(i => (i, (i * 31 % 97) + 1))
    def run(parts: Int) =
      Chunking.packSequencesGlobal(base.toDF("doc_id", "n_tokens").repartition(parts),
          "doc_id", "n_tokens", budget = 256)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    val a = run(1)
    val b = run(8)
    val c = run(32)
    assert(a.sameElements(b) && b.sameElements(c))
    // prefix-sum semantics: pack of each doc = floor(sum of all PRIOR docs / budget)
    var running = 0L
    base.sortBy(_._1).zip(a).foreach { case ((id, t), (aid, pack)) =>
      assert(id == aid && pack == running / 256)
      running += t
    }
    // coverage: every doc assigned exactly once
    assert(a.map(_._1).distinct.length == 500)
  }

  test("oversized documents get singleton packs") {
    val docs = Seq((1L, 5000L), (2L, 10L), (3L, 20L)).toDF("doc_id", "n_tokens").coalesce(1)
    val packs = Chunking.packSequences(docs, "doc_id", "n_tokens", budget = 100).collect()
    val single = packs.find(_.getAs[scala.collection.Seq[Long]]("doc_ids") == Seq(1L))
    assert(single.isDefined && single.get.getAs[Long]("total_tokens") == 5000L)
    assert(packs.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids")).sorted.toSeq == Seq(1L, 2L, 3L))
  }
}
