package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.LongAccumulator

/** Execution-time visibility for silent data-dependent drops (ADVICE
  * r18: the maxBucket skew guard drops oversized identical-doc cliques
  * with zero runtime signal — a clique-dominated corpus loses all its
  * pairs invisibly).
  *
  * Mechanism: a LongAccumulator counted from inside the guard predicate
  * plus a once-per-context job-end listener that prints the registered
  * warning when the count grows. `Dataset.observe` was the first cut —
  * zero-job and plan-native — but it has a blind spot in EXACTLY the
  * pathological case: when every bucket drops, the downstream frame is
  * empty and AQE's empty-relation propagation replaces the subtree
  * containing the CollectMetricsExec, so the metric never surfaces
  * (reproduced: a clique-only corpus reported no metric; adding one
  * surviving bucket made it appear). Accumulators ride task completion
  * instead of the final plan shape, so they survive. Laziness is
  * preserved — registration is driver-side bookkeeping; nothing runs
  * until the caller's action. Task retries / plan re-execution can
  * over-count; for a threshold-zero warning that is benign.
  */
private[graft] object ObservedWarnings {
  private val counter = new AtomicLong()
  private case class Watch(acc: LongAccumulator, message: String) {
    @volatile var reported: Long = 0L
  }
  private val watches = new ConcurrentHashMap[String, Watch]()
  // Bounded registry: each boundedBucketFilter call registers one watch
  // for the LIFETIME of the frame it guards, and nothing tells us when
  // that frame dies — so a long-running driver constructing LSH frames
  // per request would otherwise grow the registry (and the per-job-end
  // scan) without bound. Warnings are best-effort observability, so the
  // registry evicts its OLDEST watch beyond this cap: an evicted
  // still-live frame merely loses its drop warning, it never mis-runs.
  private val MaxWatches = 512
  private val insertionOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  /** Registry size, for the eviction-bound spec. */
  private[graft] def registrySize: Int = watches.size()
  private def putBounded(name: String, w: Watch): Unit = {
    watches.put(name, w)
    insertionOrder.add(name)
    while (watches.size() > MaxWatches) {
      val oldest = insertionOrder.poll()
      if (oldest != null) watches.remove(oldest) else return
    }
  }
  // WeakHashMap: contexts come and go in tests — the registry must not
  // pin a stopped context (the listener itself dies with it).
  private val attached =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())
  /** Fired warnings (name, count), for specs — the listener bus is
    * async, so tests poll this rather than capturing stderr. */
  private[graft] val fired = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()

  /** A bucket-size guard predicate `2 <= sz && sz <= maxBucket` that
    * counts every oversized bucket (`sz > maxBucket`) into a named
    * accumulator; after any job whose tasks grew the count, `message`
    * prints once to stderr with the count appended. The UDF wrapper
    * exists for the accumulator side-channel, not the arithmetic — it
    * evaluates once per BUCKET (post-aggregation), never per row.
    */
  def boundedBucketFilter(spark: SparkSession, maxBucket: Int, message: String): Column => Column = {
    val name = s"graft.warn.${counter.incrementAndGet()}"
    val acc = spark.sparkContext.longAccumulator(name)
    putBounded(name, Watch(acc, message))
    attach(spark.sparkContext)
    val guard = udf { (sz: Int) =>
      if (sz > maxBucket) acc.add(1L)
      sz >= 2 && sz <= maxBucket
    }
    (sizeCol: Column) => guard(sizeCol)
  }

  /** Like [[boundedBucketFilter]] but keeps singletons (`sz >= 1`): the
    * incremental probe bounds each SIDE of a (batch × history) bucket
    * join, where a one-member bucket still pairs with the other side's
    * members — only oversize is a drop condition. Takes the size as
    * Long because it guards window/agg `count` outputs.
    *
    * The accumulator's unit follows the CALLER's frame (ADVICE r21):
    * the history-side callers guard a per-row window count (each band
    * row carries its bucket's size — dropped band ROWS), while the r21
    * batch-side callers guard a per-bucket `groupBy(band,bucket).count`
    * aggregate (dropped BUCKETS) — the message passed in should name
    * the right unit. Note also that when the guarded sizes frame is
    * not broadcast-reused (`broadcastBatch = false`), its aggregate
    * subtree can appear in two join plans and the accumulator may
    * double-count a dropped key — the warning is a recall-cliff
    * signal, not an exact audit counter.
    */
  def oversizeBucketFilter(spark: SparkSession, maxBucket: Int, message: String): Column => Column = {
    val name = s"graft.warn.${counter.incrementAndGet()}"
    val acc = spark.sparkContext.longAccumulator(name)
    putBounded(name, Watch(acc, message))
    attach(spark.sparkContext)
    val guard = udf { (sz: Long) =>
      if (sz > maxBucket) acc.add(1L)
      sz <= maxBucket
    }
    (sizeCol: Column) => guard(sizeCol)
  }

  private def attach(sc: SparkContext): Unit =
    if (attached.put(sc, java.lang.Boolean.TRUE) == null)
      sc.addSparkListener(new SparkListener {
        override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
          watches.forEach { (name, w) =>
            val v = w.acc.value
            if (v > w.reported) {
              w.reported = v
              fired.add(name -> v)
              System.err.println(s"[graft] WARNING: ${w.message} (count=$v)")
            }
          }
      })
}
