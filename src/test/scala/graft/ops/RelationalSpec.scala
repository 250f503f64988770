package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin backward picks most recent right row at or before left time") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:20")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "C", ts("2024-01-01 10:00:10")) // no quotes for C
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:00:10"), 101.0),
      ("A", ts("2024-01-01 10:00:30"), 102.0),
      ("B", ts("2024-01-01 10:00:10"), 200.0) // exactly equal ts: inclusive
    ).toDF("sym", "qt", "price")

    val out = Relational
      .asofJoin(trades, quotes, "t", "qt", Seq(("sym", "sym")))
      .select("trade_id", "price")
      .as[(Long, Option[Double])]
      .collect()
      .toMap
    assert(out(1L).contains(100.0)) // 10:00:05 -> quote at 10:00:00
    assert(out(2L).contains(101.0)) // 10:00:20 -> quote at 10:00:10
    assert(out(3L).contains(200.0)) // equal timestamps match (inclusive)
    assert(out(4L).isEmpty)         // no quote for C -> null
  }

  test("asofJoin forward picks nearest right row at or after left time") {
    val left = Seq((1L, "A", ts("2024-01-01 10:00:05"))).toDF("id", "k", "t")
    val right = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:00:07"), 2.0),
      ("A", ts("2024-01-01 10:00:30"), 3.0)
    ).toDF("k", "rt", "v")
    val out = Relational
      .asofJoin(left, right, "t", "rt", Seq(("k", "k")), direction = "forward")
      .select("id", "v").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2.0)))
  }

  test("topKPerGroup keeps exactly k rows per group in order") {
    val df = Seq(
      ("g1", 10), ("g1", 30), ("g1", 20), ("g2", 5), ("g2", 1)
    ).toDF("g", "v")
    val out = Relational
      .topKPerGroup(df, Seq("g"), Seq(col("v").desc), 2)
      .as[(String, Int)].collect().toSet
    assert(out == Set(("g1", 30), ("g1", 20), ("g2", 5), ("g2", 1)))
  }

  test("sessionize splits on gaps larger than the threshold") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")), // same session (10 min gap)
      (1L, ts("2024-01-01 11:20:00")), // new session (70 min gap)
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Relational
      .sessionize(df, "user_id", "ts", "30 minutes")
      .select("user_id", "session_id")
      .as[(Long, Long)].collect().toSeq
    assert(out.count { case (u, s) => u == 1L && s == 0L } == 2)
    assert(out.count { case (u, s) => u == 1L && s == 1L } == 1)
    assert(out.count { case (u, s) => u == 2L && s == 0L } == 1)
  }

  test("bloomPreFilter keeps all matches and drops most non-matches") {
    import spark.implicits._
    val build = (0L until 500L).map(i => i * 7).toDF("k") // multiples of 7
    val probe = (0L until 20000L).toDF("pk")
    val filtered = Relational.bloomPreFilter(probe, build, "pk", "k", expectedItems = 500, fpp = 0.01)
    val kept = filtered.as[Long].collect().toSet
    // no false negatives: every true match survives the pre-filter
    val truth = (0L until 20000L).filter(i => i % 7 == 0 && i / 7 < 500).toSet
    assert(truth.subsetOf(kept))
    // false positives bounded well under the probe size (fpp 1% of ~20k)
    assert(kept.size < truth.size + 800)
    // exactness restored by the join itself
    val joined = filtered.join(build, filtered("pk") === build("k")).count()
    assert(joined == truth.size)
  }

  test("exactSampleK draws exactly k distinct rows, roughly uniformly") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id").repartition(8)
    val s1 = Relational.exactSampleK(df, 100, seed = 7L).as[Long].collect()
    assert(s1.length == 100 && s1.distinct.length == 100)
    // deterministic for a fixed seed and partitioning
    val s2 = Relational.exactSampleK(df, 100, seed = 7L).as[Long].collect()
    assert(s1.sorted.toSeq == s2.sorted.toSeq)
    // crude uniformity: mean of a 500-sample within 15% of population mean
    val s3 = Relational.exactSampleK(df, 500, seed = 11L).as[Long].collect()
    assert(math.abs(s3.map(_.toDouble).sum / 500 - 4999.5) < 750)
    // k larger than the data returns everything
    assert(Relational.exactSampleK(spark.range(5).toDF("id"), 100).count() == 5)
  }
}
