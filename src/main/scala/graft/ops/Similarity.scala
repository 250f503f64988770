package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale strategy: brute force is the oracle path (broadcast the small
  * query side — never the corpus — so the 100 TB corpus streams through a
  * map-only stage). The scale path is random-hyperplane LSH: bucket by
  * sign bits, equi-join on (bucket-group, bits), score only candidates.
  */
object Similarity {

  /** Exact top-k by cosine: each row of `queries` against all of `corpus`.
    * `queries` is broadcast (must be small); the corpus side never
    * shuffles — the join is a BroadcastNestedLoopJoin over a map-only
    * scan, then a per-query top-k window.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv")))
    val scored = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        VectorFunctions.cosineSim(col("_qv"), col("_cv")).as("cosine")
      )
    Relational.topKPerGroup(scored, Seq("query_id"), Seq(col("cosine").desc, col("neighbor_id").asc), k)
  }

  /** Deterministic pseudo-random hyperplanes: `nBits` x `dim` doubles in
    * [-1, 1], generated from `seed` (same on every executor — the planes
    * are literals folded into the plan, so there is no side data to ship).
    */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-bit signature of a vector under `nBits` random hyperplanes,
    * packed into a Long. Pure Column expression (HOFs, codegen'd).
    */
  def lshSignature(vec: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val pLit = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(vec, pLit, (x, w) => x.cast("double") * w),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(dot > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k via banded hyperplane LSH: `groups` bands of
    * `bitsPerGroup` sign bits each; vectors sharing any band bucket are
    * candidates (OR-amplification). Equi-join on (band, bits-in-band) —
    * shuffle partitioned by bucket, no cross join — then exact cosine on
    * candidates and per-query top-k. Recall rises with `groups`, cost
    * with bucket collision rate.
    */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int,
      dim: Int,
      bitsPerGroup: Int = 8,
      groups: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val nBits = bitsPerGroup * groups
    def banded(df: DataFrame, idc: String, vecc: String, idOut: String, vecOut: String): DataFrame = {
      val sig = lshSignature(col(vecc), nBits, dim, seed)
      df.select(col(idc).as(idOut), col(vecc).as(vecOut), sig.as("_sig"))
        .select(
          col(idOut),
          col(vecOut),
          posexplode(
            transform(
              sequence(lit(0), lit(groups - 1)),
              g =>
                call_function("shiftright", col("_sig"), g * bitsPerGroup)
                  .bitwiseAND(lit((1L << bitsPerGroup) - 1))
            )
          )
        )
        .withColumnRenamed("pos", "_band")
        .withColumnRenamed("col", "_bucket")
    }
    val c = banded(corpus, corpusId, corpusVec, "neighbor_id", "_cv")
    val q = banded(queries, queryId, queryVec, "query_id", "_qv")
    val cand = c
      .join(q, Seq("_band", "_bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("_qv"), col("_cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        VectorFunctions.cosineSim(col("_qv"), col("_cv")).as("cosine")
      )
    Relational.topKPerGroup(cand, Seq("query_id"), Seq(col("cosine").desc, col("neighbor_id").asc), k)
  }

  /** All pairs with cosine >= threshold among rows of `df` — embedding
    * near-dup detection. Brute-force variant (oracle scale); LSH variant
    * for scale is `lshTopK` with df as both sides.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("id1"), col(vecCol).as("_v1"))
    val r = df.select(col(idCol).as("id2"), col(vecCol).as("_v2"))
    l.crossJoin(r)
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), VectorFunctions.cosineSim(col("_v1"), col("_v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
