package graft.ops

import graft.SparkSpec

/** Pins [[Dedup.eagerOverlap]] (r22): the background launch of an eager
  * chain (probe checkpoint, history CC) plus the failure contract —
  * await() rethrows the body's own exception, cancel() is safe in every
  * state. (A busy-driver inline gate was tried and REVERTED inside r22:
  * the calm paired A/B measured inline q98 ~1.7x worse in-batch —
  * FAIR scheduling shares the pool per JOB, so holding two concurrent
  * chains is how a query keeps its share; see eagerOverlap's scaladoc.)
  */
class EagerOverlapSpec extends SparkSpec {

  test("the handle returns the body's value; cancel is a no-op after completion") {
    val h = Dedup.eagerOverlap(spark, "spec: value")(21 * 2)
    assert(h.await() == 42)
    h.cancel() // finished group: must be a no-op
    assert(h.await() == 42)
  }

  test("the background chain can run real Spark jobs under its job group") {
    val h = Dedup.eagerOverlap(spark, "spec: job")(
      spark.range(1000).selectExpr("sum(id)").collect()(0).getLong(0))
    assert(h.await() == 499500L)
  }

  test("the body's failure surfaces at await, unwrapped; cancel after failure is safe") {
    val h = Dedup.eagerOverlap(spark, "spec: failure")(sys.error("boom"): Int)
    val e = intercept[RuntimeException](h.await())
    assert(e.getMessage.contains("boom"))
    h.cancel()
  }
}
