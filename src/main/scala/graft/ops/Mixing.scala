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

  /** Temperature-based mixture weights — the multilingual sampling rule
    * (XLM-R, mC4: p_g ∝ n_g^alpha): per-group row counts raised to
    * `alpha`, normalized. alpha=1 is proportional to size, alpha→0
    * uniform across groups; alpha<1 upsamples low-resource groups
    * relative to their share. One groupBy shuffle; O(groups) rows out.
    * alpha=0.5 routes through `sqrt` (IEEE correctly-rounded, so the
    * weights are engine-exact; `pow` carries ULP slack) — the canonical
    * setting and the oracle-checked one.
    */
  def temperatureWeights(df: DataFrame, groupCol: String, alpha: Double): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_rows"))
    val powered =
      if (alpha == 0.5) sqrt(col("n_rows").cast("double"))
      else if (alpha == 1.0) col("n_rows").cast("double")
      else pow(col("n_rows").cast("double"), alpha)
    val wTotal = Window.partitionBy()
    counts.withColumn("_p", powered)
      .withColumn("weight", col("_p") / sum(col("_p")).over(wTotal))
      .drop("_p")
  }

  /** Realize [[temperatureWeights]] against a row budget: group g keeps
    * its `min(n_g, round(budget * w_g))` hash-first rows (the same
    * md5-order determinism as [[stratifiedSample]] — no RNG). Groups
    * whose target exceeds their size keep everything — sampling without
    * replacement can't upsample; epoch repetition handles >1x.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, budgetRows: Long): DataFrame = {
    val weights = temperatureWeights(df.select(col(groupCol)), groupCol, alpha)
      .withColumn("_target", round(col("weight") * budgetRows).cast("long"))
      .select(col(groupCol), col("_target"))
    val w = Window.partitionBy(col(groupCol)).orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(weights), Seq(groupCol)) // O(groups) rows: always broadcast
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_target"))
      .drop("_rn", "_target")
  }

  /** Map-only realization of [[temperatureWeights]] — the 100 TB path:
    * per-group hash-threshold keep, where group g's threshold is
    * `min(1, round(budget*w_g)/n_g)` of the md5Hash31 range. The rank
    * window in [[temperatureSample]] funnels each group through ONE
    * task (all 5 TB of a source on one core at corpus scale); this
    * variant is a broadcast join of O(groups) thresholds + a per-row
    * hash compare — no window, no sort, the one exchange is the tiny
    * per-group count. The trade: group sizes are binomial around the
    * target instead of exact ([[hashSample]]'s standard trade).
    * Cross-engine exact (every arithmetic step is deterministic double
    * math both engines share; the hash is the md5_number_upper-parity
    * [[Dedup.md5Hash31]] value) — oracle-checked as q92.
    */
  def temperatureSampleThreshold(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, budgetRows: Long): DataFrame = {
    val p = (1L << 31) - 1
    val thresholds = temperatureWeights(df.select(col(groupCol)), groupCol, alpha)
      .withColumn("_target", round(col("weight") * budgetRows))
      .withColumn("_thr",
        floor(least(lit(1.0), col("_target") / col("n_rows")) * p).cast("long"))
      .select(col(groupCol), col("_thr"))
    df.join(broadcast(thresholds), Seq(groupCol))
      .filter(md5Mod31(col(idCol).cast("string")) < col("_thr"))
      .drop("_thr")
  }

  /** md5Hash31 as one fused JIT loop (same VALUE as [[Dedup.md5Hash31]]:
    * little-endian uint64 of the first 8 md5 bytes mod 2^31-1 — DuckDB
    * md5_number_upper parity), ~6x faster than the 18-node
    * md5/substring/conv/DECIMAL expression tree (the same lesson as the
    * portable minhash signatures). The ONE copy of this loop —
    * [[hashSample]] and [[temperatureSampleThreshold]] both compare its
    * output against their thresholds. */
  private val md5Mod31 = udf { (s: String) =>
    if (s == null) null.asInstanceOf[java.lang.Long]
    else {
      val d = graft.core.Token.md5() // thread-local: getInstance per row is a measurable provider lookup
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var le = 0L
      var i = 7
      while (i >= 0) { le = (le << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.valueOf(java.lang.Long.remainderUnsigned(le, (1L << 31) - 1))
    }
  }

  /** Deterministic Bernoulli sample by hash THRESHOLD: keep rows whose
    * `md5Hash31(id)` falls below `frac` of the hash range. Map-only — no
    * window, no sort, no shuffle — so it scales embarrassingly where
    * [[stratifiedSample]]'s per-stratum rank sort funnels each stratum
    * through one task. Sample size is only approximately `frac * n`
    * (binomial), which is the standard trade for a threshold sample;
    * use [[stratifiedSample]] when the count must be exact per stratum.
    * Cross-engine exact: DuckDB replicates the predicate as
    * `md5_number_upper(id) % 2147483647 < floor(frac * 2147483647)`.
    */
  def hashSample(df: DataFrame, idCol: String, frac: Double): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac out of range: $frac")
    val p = (1L << 31) - 1
    val threshold = (frac * p).toLong
    // md5Mod31 is the shared fused loop (null ids hash to null, and
    // null < threshold filters false — same exclusion the old boolean
    // UDF applied)
    df.filter(md5Mod31(col(idCol).cast("string")) < threshold)
  }

  /** Global 1-based rank of `df` under `sortCols`, computed WITHOUT an
    * unpartitioned window (`row_number() over (order by ...)` plans
    * `Exchange SinglePartition` — every row through one task, the
    * opposite of a scalable sort). Instead: range-partitioned sort
    * (parallel, the same shuffle `orderBy` plans) + `zipWithIndex`
    * (one lightweight count job for partition offsets, then a map).
    * Appends `order` (long).
    */
  private def globalOrder(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val spark = df.sparkSession
    // replace-don't-duplicate: the old row_number().withColumn semantics
    // replaced a pre-existing "order" column; schema concatenation would
    // produce an ambiguous duplicate instead
    val sorted = df.drop("order").orderBy(sortCols: _*)
    // zipWithIndex runs a partition-size job that executes the sort, and
    // the caller's action would execute it AGAIN from scratch — persist
    // the sorted rows so the sort runs once (MEMORY_AND_DISK spills
    // rather than recomputes; the ContextCleaner reclaims the blocks
    // when the returned frame is dereferenced)
    val sortedRdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField("order", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sortedRdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Curriculum length buckets: ntile-equivalent bucketing over a size
    * column with a deterministic tiebreak, plus per-bucket stats. Uses
    * the parallel [[globalOrder]] rank plus the exact ntile assignment
    * arithmetic (first `n % buckets` buckets take one extra row), so the
    * result matches SQL `ntile()` value-for-value without the
    * single-partition window `ntile() over (order by ...)` plans.
    */
  def lengthBuckets(df: DataFrame, sizeCol: String, idCol: String, buckets: Int): DataFrame = {
    val ranked = globalOrder(df, Seq(col(sizeCol), col(idCol)))
    val n = df.count() // row count from the UNSORTED input — no extra sort
    val base = n / buckets
    val rem = n % buckets
    val cut = rem * (base + 1) // ranks <= cut fall in the wider buckets
    val bucket = when(lit(base) === 0, col("order")) // n < buckets: tile = rank
      .otherwise(
        when(col("order") <= cut, ((col("order") - 1) / (base + 1)) + 1)
          .otherwise(lit(rem) + ((col("order") - cut - 1) / base) + 1))
    ranked.withColumn("bucket", bucket.cast("int"))
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
    * The sort is range-partitioned and the rank comes from
    * [[globalOrder]]'s zipWithIndex — no single-partition window; at
    * 100 TB this is the standard pre-sharding pass and the parallel
    * sort is the cost you pay for a reproducible epoch order.
    */
  def deterministicShuffle(df: DataFrame, idCol: String): DataFrame =
    globalOrder(df.drop("_ds_k").withColumn("_ds_k", md5(col(idCol).cast("string"))),
      Seq(col("_ds_k"), col(idCol))).drop("_ds_k")

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
