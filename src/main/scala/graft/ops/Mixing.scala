package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture composition operators: the sampling/bucketing steps
  * a data pipeline runs between filtering and tokenization (domain
  * mixtures a la the public LLM data recipes — proportional sampling
  * per source, curriculum buckets by length).
  */
object Mixing {

  /** Deterministic stratified sample: keep `frac` of each stratum,
    * selecting rows by a content-derived hash order (md5 of the id) so
    * the choice is stable across runs and engines — no RNG, no
    * partitioning dependence. One window shuffle per call; at scale the
    * window partitions by stratum, so skewed strata parallelize as well
    * as their cardinality allows.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String, frac: Double): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wAll = Window.partitionBy(col(strataCol))
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") <= ceil(col("_n") * frac))
      .drop("_rn", "_n")
  }

  /** Curriculum length buckets: ntile over a size column with a
    * deterministic tiebreak, plus per-bucket stats. The ntile window is
    * a single global sort — the curriculum step is a one-off pass over
    * metadata columns, not the data path.
    */
  def lengthBuckets(df: DataFrame, sizeCol: String, idCol: String, buckets: Int): DataFrame = {
    val w = Window.orderBy(col(sizeCol), col(idCol))
    df.withColumn("bucket", ntile(buckets).over(w))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min(sizeCol).as("min_size"),
        max(sizeCol).as("max_size"))
  }

  /** Deterministic global training-order shuffle: order by a
    * content-derived hash (md5 of the id) with the id as tiebreak —
    * stable across runs, engines, and partitionings, unlike RNG or
    * partition-dependent `rand(seed)`. `order` is the 1-based position.
    * One global sort (range partitioned); at 100 TB this is the standard
    * pre-sharding pass and the sort is the cost you pay for a
    * reproducible epoch order.
    */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame = {
    val w = Window.orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("order", row_number().over(w).cast("long"))
  }

  /** Assign each row to one of `n` output shards by content hash —
    * reproducible, uniform-ish, and partitioning-independent (the
    * writer-side counterpart of [[deterministicShuffle]]: shard files of
    * a training corpus). The hash is the first 8 md5 bytes little-endian
    * mod n (DuckDB-replicable via md5_number_upper, same convention as
    * [[Dedup.md5Hash31]]), so shard membership is verifiable
    * cross-engine. No shuffle: the assignment is a per-row projection;
    * the subsequent `write.partitionBy("shard")` does the clustering.
    */
  def assignShards(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.withColumn("shard", pmod(Dedup.md5Hash31(col(idCol).cast("string")), lit(n)).cast("int"))
}
