package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational helper operators the reference exposes only through engine
  * passthrough (intake delegates joins/windows to its backends; see
  * reference readers.py:510-516 `DuckSQL`, transform.py:87 `Method`).
  * Here they are first-class, shuffle-conscious Spark operators.
  */
object Relational {

  /** As-of join: for each left row, attach the single most recent right row
    * with `right(rightOn) <= left(leftOn)` (direction="backward"; "forward"
    * matches the nearest `>=`), within equal `by` keys.
    *
    * Implementation is the union-window pattern rather than a range
    * join: tag both sides, union, and carry the last-seen right row
    * forward with `last(_, ignoreNulls=true)` over a window ordered by
    * (time, tag). One shuffle on the `by` keys, no row explosion — at
    * 100 TB a naive `left.join(right, ts >= rts)` range join explodes
    * quadratically per key; this stays linear and sorts within
    * partitions.
    *
    * Ties: a right row at exactly `leftOn` is eligible (inclusive); among
    * right rows with the same timestamp the last by `tieBreak` ordering
    * wins.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: String,
      rightOn: String,
      by: Seq[(String, String)],
      direction: String = "backward",
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    require(direction == "backward" || direction == "forward", s"bad direction: $direction")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val byL = by.map(_._1)
    val byR = by.map(_._2)

    // Common layout: by-keys, event time, side tag, payload structs.
    val lNorm = left.select(
      struct(leftCols.map(col): _*).as("_l"),
      lit(null).cast(right.select(struct(rightCols.map(col): _*)).schema.fields.head.dataType).as("_r"),
      col(leftOn).as("_t"),
      lit(1).as("_tag"),
      struct(byL.map(col): _*).as("_by")
    )
    val rNorm = right.select(
      lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.fields.head.dataType).as("_l"),
      struct(rightCols.map(col): _*).as("_r"),
      col(rightOn).as("_t"),
      lit(0).as("_tag"),
      struct(byR.map(col): _*).as("_by")
    )
    val unioned = lNorm.unionByName(rNorm)

    // backward: right rows must sort before a same-time left row so that
    // last() sees them; forward mirrors by reversing the time order.
    val timeOrder =
      if (direction == "backward") Seq(col("_t").asc, col("_tag").asc)
      else Seq(col("_t").desc, col("_tag").asc)
    val tieOrder = tieBreak.map(c => col("_r").getField(c).asc)
    val w = Window
      .partitionBy(col("_by"))
      .orderBy(timeOrder ++ tieOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)

    val leftOut = leftCols.map(c => col("_l").getField(c).as(c))
    val rightOut = rightCols.filterNot(byR.contains).map(c => col("_match").getField(c).as(c))
    matched.select(leftOut ++ rightOut: _*)
  }

  /** Top-k rows per group by the given ordering (rank-window pattern).
    * Partial top-k is pushed map-side by Catalyst's `WindowGroupLimit`
    * (Spark 3.5+) so only k rows per group per partition shuffle.
    */
  def topKPerGroup(df: DataFrame, partitionBy: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }

  /** Skew-safe equi-join: salt the skewed (left) side's key into
    * `saltFactor` subkeys and explode the build (right) side across all
    * salt values, so one hot key spreads over `saltFactor` reducers
    * instead of melting a single one. AQE's skew-join handles moderate
    * skew adaptively; explicit salting is for the pathological key whose
    * single partition would still exceed an executor.
    *
    * Right side is replicated `saltFactor`× — keep it the smaller input.
    * Only inner/left joins are sound: with a right or full join every
    * unmatched right row would surface once per salt replica.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(
      joinType == "inner" || joinType.startsWith("left"),
      s"saltedJoin supports inner/left joins only (right side is replicated): $joinType"
    )
    val salted = left.withColumn("_salt_l", pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("_salt_r", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, col("_salt_l") === col("_salt_r") && col(leftKey) === col(rightKey), joinType)
      .drop("_salt_l", "_salt_r")
  }

  /** Gap-based sessionization (batch): rows for the same key belong to one
    * session while consecutive gaps stay <= maxGap. Adds `session_id`
    * (0-based per key). One shuffle on the key; cumulative-sum window.
    */
  /** Bloom-filter join pre-filter — the classic runtime-filter pattern
    * for big joins: build a Bloom filter over the build side's join
    * keys (one aggregation, compact bitset to the driver), broadcast
    * it, and drop probe rows that can't match BEFORE the join shuffle.
    * False positives only — the join afterwards stays exact; what's
    * saved is shuffling rows that would die in the join anyway. Spark's
    * own `spark.sql.optimizer.runtime.bloomFilter` does this inside one
    * query; this op makes the same pre-filter explicit and reusable
    * across stages (build once, filter many probes).
    */
  def bloomPreFilter(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val spark = probe.sparkSession
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val might = udf { (k: Any) => k != null && bloomBc.value.mightContain(k) }
    probe.filter(might(col(probeKey)))
  }

  /** Exact-k uniform random sample without replacement — what
    * `df.sample(fraction)` can't give (Bernoulli rows counts vary) and
    * `rdd.takeSample` gives only as a local array. Each partition keeps
    * at most k candidates with standard reservoir sampling, tagged with
    * their uniform priority; the global top-k by priority is then an
    * exact uniform k-subset. Driver state is bounded by k, executor
    * state by k per partition; one pass, no shuffle of non-candidates.
    */
  def exactSampleK(df: DataFrame, k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    val schema = df.schema
    val spark = df.sparkSession
    val candidates = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rnd = new java.util.Random(seed + pid)
      // per-partition: top-k by uniform priority (min-heap of size k)
      val heap = new java.util.PriorityQueue[(Double, org.apache.spark.sql.Row)](
        math.max(1, k), (a: (Double, org.apache.spark.sql.Row), b: (Double, org.apache.spark.sql.Row)) => java.lang.Double.compare(a._1, b._1))
      it.foreach { row =>
        val p = rnd.nextDouble()
        if (heap.size < k) heap.add((p, row))
        else if (p > heap.peek()._1) { heap.poll(); heap.add((p, row)) }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(heap.iterator()).asScala
    }
    val top = candidates.sortBy(-_._1).take(k).map(_._2) // ≤ k per partition reaches the driver
    spark.createDataFrame(spark.sparkContext.parallelize(top.toSeq, math.max(1, math.min(top.length, 4))), schema)
  }

  def sessionize(df: DataFrame, keyCol: String, tsCol: String, maxGap: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    val gapSec = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(maxGap))
    // Compare gaps in integral microseconds: casting timestamps to double
    // seconds loses sub-second precision (micros/1e6 is inexact in binary),
    // which flips session boundaries when a gap sits exactly on maxGap.
    val gapMicros =
      gapSec.months * 2592000000000L + gapSec.days * 86400000000L + gapSec.microseconds
    val newSession = when(
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w) > gapMicros,
      1
    ).otherwise(0)
    df.withColumn("_new", coalesce(newSession, lit(0)))
      .withColumn("session_id", sum(col("_new")).over(w))
      .drop("_new")
  }
}
