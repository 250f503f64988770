package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the bounded watch registry (review r19): boundedBucketFilter
  * registers one watch per call with no deregistration signal, so a
  * long-running driver constructing guarded frames per request must
  * not grow the registry (or the per-job-end scan) without bound.
  */
class ObservedWarningsSpec extends SparkSpec {
  import spark.implicits._

  test("the watch registry is bounded: oldest watches evict, recent ones still fire") {
    val filters = (1 to 600).map(i =>
      ObservedWarnings.boundedBucketFilter(spark, 5, s"synthetic watch $i"))
    assert(ObservedWarnings.registrySize <= 512,
      s"registry must stay bounded, got ${ObservedWarnings.registrySize}")
    // the most recent watch still works end-to-end: guard semantics
    // (2 <= sz <= maxBucket) hold and the oversized bucket fires the
    // async warning
    ObservedWarnings.fired.clear()
    // repartition: a bare local relation would let ConvertToLocalRelation
    // evaluate the guard ON THE DRIVER at optimization time and collect
    // without any job — no job-end event, no listener scan (production
    // inputs are scans, never local relations)
    val out = Seq(1, 3, 99).toDF("sz").repartition(2).filter(filters.last(col("sz")))
    assert(out.collect().map(_.getInt(0)).toSet == Set(3))
    val deadline = System.nanoTime() + 10e9.toLong
    while (ObservedWarnings.fired.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!ObservedWarnings.fired.isEmpty, "a recent (non-evicted) watch must still fire")
  }
}
