package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample keeps ceil(frac*n) rows per stratum, deterministically") {
    val df = (0 until 100).map(i => (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "src")
    val s1 = Mixing.stratifiedSample(df, "src", "id", 0.25)
    val byStratum = s1.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("a") == math.ceil(34 * 0.25).toLong)
    assert(byStratum("b") == math.ceil(66 * 0.25).toLong)
    // stable: same rows on a rerun
    val s2 = Mixing.stratifiedSample(df, "src", "id", 0.25)
    assert(s1.collect().toSet == s2.collect().toSet)
  }

  test("lengthBuckets produces even quartiles with ordered ranges") {
    val df = (1 to 80).map(i => (i.toLong, (i * 7 % 100).toLong)).toDF("id", "sz")
    val rows = Mixing.lengthBuckets(df, "sz", "id", 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(20L, 20L, 20L, 20L))
    // bucket ranges don't overlap and ascend
    rows.sliding(2).foreach { case Array(lo, hi) => assert(lo._4 <= hi._3) }
  }

  test("deterministicShuffle is a stable permutation; assignShards is reproducible and covers") {
    val df = (1 to 200).map(_.toLong).toDF("doc_id")
    val a = Mixing.deterministicShuffle(df, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Mixing.deterministicShuffle(df.repartition(7), "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b) // partitioning-independent
    assert(a.values.toSeq.sorted == (1L to 200L)) // a permutation
    assert(a(1L) != 1L || a(2L) != 2L) // actually shuffled

    val shards = Mixing.assignShards(df, "doc_id", 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sizes = shards.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.keys.toSet == (0 to 7).toSet) // all shards hit
    assert(sizes.values.max <= 3 * sizes.values.min) // rough uniformity at n=200
  }

  test("temperature weights: alpha=1 proportional, alpha->0 flattens, sampler honors budget") {
    import org.apache.spark.sql.functions.col
    // 3 groups: 160 / 30 / 10 rows
    val df = ((0 until 160).map(i => (i.toLong, "big")) ++
      (200 until 230).map(i => (i.toLong, "mid")) ++
      (300 until 310).map(i => (i.toLong, "small"))).toDF("id", "src")
    def weights(alpha: Double): Map[String, Double] =
      Mixing.temperatureWeights(df, "src", alpha)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val w1 = weights(1.0)
    assert(math.abs(w1("big") - 0.8) < 1e-9 && math.abs(w1("small") - 0.05) < 1e-9)
    val w5 = weights(0.5)
    // sqrt compresses the ratio: big/small falls from 16x to 4x
    assert(math.abs(w5("big") / w5("small") - 4.0) < 1e-9)
    val w01 = weights(0.1)
    assert(w01("big") / w01("small") < 2.0) // near-uniform as alpha -> 0
    // weights always normalize
    Seq(w1, w5, w01).foreach(w => assert(math.abs(w.values.sum - 1.0) < 1e-9))
    // sampler: budget 40 at alpha=0.5 -> targets round(40*w); small
    // groups upsample RELATIVELY but never beyond their size
    val kept = Mixing.temperatureSample(df, "src", "id", alpha = 0.5, budgetRows = 40)
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("big") == math.round(40 * w5("big")))
    assert(kept("mid") == math.round(40 * w5("mid")))
    assert(kept("small") == math.round(40 * w5("small")))
    assert(kept.values.sum <= 41) // rounding slack only
    // determinism: same call, same rows
    val a = Mixing.temperatureSample(df, "src", "id", 0.5, 40).select("id").collect().map(_.getLong(0)).toSet
    val b = Mixing.temperatureSample(df, "src", "id", 0.5, 40).select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // an over-budget request caps at group size, never duplicates
    val all = Mixing.temperatureSample(df, "src", "id", 0.5, 100000)
    assert(all.count() == df.count() && all.select("id").distinct().count() == df.count())
  }

  test("temperatureSampleThreshold: map-only plan (no window), subset, deterministic, caps at group size") {
    val df = (0 until 900).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val kept = Mixing.temperatureSampleThreshold(df, "src", "id", alpha = 0.5, budgetRows = 300)
    // THE reason this variant exists: temperatureSample's rank window
    // funnels each group through one task. The DATA side here must be a
    // pure broadcast-join filter — no window, no sort, no exchange at
    // all. (The broadcast BUILD side may window/single-partition freely:
    // it is the O(groups) threshold table, bounded at any corpus size.)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Mixing.temperatureSampleThreshold(df, "src", "id", 0.5, 300)
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      assert(joins.nonEmpty, s"expected a broadcast threshold join:\n$plan")
      val probe = joins.head.children(if (joins.head.buildSide.toString == "BuildRight") 0 else 1)
      val probeStr = probe.toString
      Seq("Window", "Exchange", "Sort").foreach(op =>
        assert(!probeStr.contains(op), s"data side must be map-only, found $op:\n$probeStr"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    // subset of the input, deterministic, binomial around the budget
    val ids = kept.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf((0L until 900L).toSet))
    val n = ids.size
    assert(n > 200 && n < 400, s"binomial around 300, got $n")
    val again = Mixing.temperatureSampleThreshold(df, "src", "id", 0.5, 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
    // an over-budget request keeps everything (threshold caps at the
    // full hash range), never duplicates
    val all = Mixing.temperatureSampleThreshold(df, "src", "id", 0.5, 100000)
    assert(all.count() == 900 && all.select("id").distinct().count() == 900)
  }

  test("centroidOutliers ranks a planted far vector first") {
    val base = (0 until 50).map(i => (i.toLong, Array.fill(8)(0.01f * (i % 3))))
    val planted = Seq((999L, Array.fill(8)(1.9f)))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val top = Similarity.centroidOutliers(df, "vec_id", "embedding", topK = 3).collect()
    assert(top.head.getLong(0) == 999L)
    assert(top.head.getLong(1) > top(1).getLong(1))
  }
}
