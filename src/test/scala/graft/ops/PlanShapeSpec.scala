package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-SHAPE regression tests for the scale guarantees the ops
  * advertise in their scaladoc. Results going green proves correctness;
  * these prove the PLAN stays the one that survives a 100x scale-up —
  * a refactor that silently reintroduces a single-partition exchange or
  * un-broadcasts a small side fails here, not in production.
  */
class PlanShapeSpec extends SparkSpec {

  private def physical(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("hashSample plans no exchange, no sort, no window — map-only") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"row$i")).toDF("id", "txt")
    val plan = physical(Mixing.hashSample(df, "id", 0.1))
    assert(!plan.contains("Exchange"), s"hashSample must be map-only:\n$plan")
    assert(!plan.contains("Sort"), s"hashSample must not sort:\n$plan")
    assert(!plan.contains("Window"), s"hashSample must not window:\n$plan")
  }

  test("stratifiedSample plans a hash-partitioned window, never SinglePartition") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"s${i % 3}")).toDF("id", "stratum")
    val plan = physical(Mixing.stratifiedSample(df, "stratum", "id", 0.2))
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition"),
      s"per-stratum windows must partition by stratum, not collapse to one task:\n$plan")
  }

  test("brute-force KNN broadcasts the query side, never the corpus") {
    import spark.implicits._
    val corpus = Seq.tabulate(50)(i => (i.toLong, Array.fill(4)(i.toFloat))).toDF("id", "embedding")
    val queries = Seq((999L, Array.fill(4)(0.5f))).toDF("qid", "qemb")
    val plan = physical(Similarity.bruteForceTopK(corpus, "id", "embedding", queries, "qid", "qemb", k = 3))
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      s"query side must broadcast:\n$plan")
  }

  test("exact dedup plans a partial (map-side) aggregate before the shuffle") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"doc${i % 10}")).toDF("doc_id", "text")
    val plan = physical(Dedup.exactDedup(df, "text", "doc_id"))
    // partial_ prefix in the aggregate expressions marks map-side combine
    assert(plan.contains("partial_"), s"groupBy must partial-aggregate map-side:\n$plan")
  }

  test("minhash signature stage plans no shuffle") {
    import spark.implicits._
    val df = Seq.tabulate(20)(i => (i.toLong, s"some text number $i here")).toDF("doc_id", "text")
    val plan = physical(df.select(col("doc_id"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 2), k = 16)))
    assert(!plan.contains("Exchange"), s"per-row signatures must not shuffle:\n$plan")
  }
}
