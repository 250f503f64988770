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

  test("centroidOutliers ranks a planted far vector first") {
    val base = (0 until 50).map(i => (i.toLong, Array.fill(8)(0.01f * (i % 3))))
    val planted = Seq((999L, Array.fill(8)(1.9f)))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val top = Similarity.centroidOutliers(df, "vec_id", "embedding", topK = 3).collect()
    assert(top.head.getLong(0) == 999L)
    assert(top.head.getLong(1) > top(1).getLong(1))
  }
}
