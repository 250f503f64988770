package graft.ops

import graft.SparkSpec
import java.util.concurrent.{CountDownLatch, TimeUnit}

/** Pins [[Dedup.eagerOverlap]] (r22): the pool-pressure gate that
  * decides whether an eager chain (probe checkpoint, history CC) runs
  * inline or overlapped, plus the failure contract — await() rethrows,
  * cancel() is safe in every state.
  */
class EagerOverlapSpec extends SparkSpec {

  test("idle driver overlaps; the handle returns the body's value") {
    val h = Dedup.eagerOverlap(spark, "spec: idle")(21 * 2)
    assert(h.overlapped, "no other job is active — the chain must overlap")
    assert(h.await() == 42)
    h.cancel() // finished group: must be a no-op
    assert(h.await() == 42)
  }

  test("busy driver (another active job) runs inline") {
    val running = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val bg = new Thread(() => {
      spark.sparkContext.parallelize(1 to 2, 2).foreach { _ =>
        // task-side: signal it's on core, then park until released
        // (executor and driver share the JVM under local[*])
        EagerOverlapSpec.taskGate.countDown()
        EagerOverlapSpec.taskRelease.await(30, TimeUnit.SECONDS)
      }
      release.countDown()
    })
    bg.start()
    assert(EagerOverlapSpec.taskGate.await(30, TimeUnit.SECONDS), "background job never started")
    try {
      val h = Dedup.eagerOverlap(spark, "spec: busy")("inline")
      assert(!h.overlapped, "an active job means pool pressure — must run inline")
      assert(h.await() == "inline")
    } finally {
      EagerOverlapSpec.taskRelease.countDown()
      bg.join(30000)
    }
  }

  test("the body's failure surfaces at or before await, unwrapped") {
    // inline handles throw at creation, overlapped ones at await()
    // (which branch runs depends on listener-bus timing — the status
    // tracker can briefly report a just-finished job as active); the
    // caller contract is the same either way: create-then-await
    // propagates the body's own exception
    val e = intercept[RuntimeException] {
      Dedup.eagerOverlap(spark, "spec: failure")(sys.error("boom"): Int).await()
    }
    assert(e.getMessage.contains("boom"))
  }
}

object EagerOverlapSpec {
  // latches are static so the task closure (serialized to the local
  // executor) and the driver-side spec share them
  val taskGate = new CountDownLatch(1)
  val taskRelease = new CountDownLatch(1)
}
