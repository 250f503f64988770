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
}
