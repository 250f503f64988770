package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Parameterized recall-vs-cost sweep for the ANN paths (VERDICT r7
  * #7): q51's LSH and q58's IVF pass fixed-parameter planted-recall
  * specs, but nothing pinned the SHAPE of the curve — a silent change
  * to band/probe semantics could collapse recall at low settings while
  * the fixed-parameter spec still passes. This sweep pins:
  *
  *  - monotonicity, which is structural, not statistical: bands are
  *    prefix-stable in `groups` (planes generate sequentially from one
  *    seed, so groups=2's bands are exactly the first two of groups=6)
  *    and IVF probe sets are prefix-stable in `nProbe` for fixed
  *    centroids — candidate sets are supersets, so recall can never
  *    decrease as the knob rises;
  *  - a floor at the sweep top ≥ the existing fixed-parameter specs;
  *  - a real spread: the lowest setting must cost less than the top
  *    (fewer candidate pairs scored), or the knob does nothing.
  */
class RecallSweepSpec extends SparkSpec {

  private val rnd = new scala.util.Random(23)
  private def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
  private val base = (0L until 60L).map(i => (i, vec()))
  private val planted = base.map { case (i, v) =>
    (i + 100L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
  }

  private def recallOf(found: Set[(Long, Long)]): Double =
    base.count { case (i, _) => found.contains((i, i + 100L)) } / base.size.toDouble

  test("LSH recall is monotone in groups and doesn't collapse at defaults") {
    import spark.implicits._
    val corpus = (base ++ planted).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 60)
    val sweep = Seq(1, 2, 4, 8).map { groups =>
      val found = Similarity.lshTopK(corpus, "id", "vec", queries, "id", "vec",
        k = 1, dim = 16, bitsPerGroup = 6, groups = groups)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      groups -> recallOf(found)
    }
    // structural monotonicity: candidate sets are supersets as groups rise
    sweep.sliding(2).foreach { case Seq((g1, r1), (g2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (groups=$g1) to $r2 (groups=$g2)")
    }
    assert(sweep.last._2 >= 0.9, s"top-of-sweep recall ${sweep.last._2} below the planted floor")
    // the knob must do something: one band alone may be lucky on 60
    // vectors, but it must not already be at the top of the curve AND
    // cost the same — candidate-pair count is the cost proxy
    def candidatePairs(groups: Int): Long = {
      import graft.functions.VectorFunctions
      import org.apache.spark.sql.functions.posexplode
      def banded(idOut: String) = corpus.select(col("id").as(idOut),
          posexplode(VectorFunctions.lshBandBuckets(col("vec"), 6, groups, 16, 42L)))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bucket")
      banded("a").join(banded("b"), Seq("_band", "_bucket"))
        .filter(col("a") =!= col("b")).select("a", "b").distinct().count()
    }
    assert(candidatePairs(1) < candidatePairs(8),
      "groups knob changed neither recall cost nor candidates — sweep is vacuous")
  }

  test("portable (integer-hyperplane) LSH recall is monotone in groups and holds the floor") {
    // the hash-exact oracle twin (q86) must be a REAL ANN, not just a
    // value-checkable one: same monotonicity + planted floor as the
    // float-hyperplane path
    import spark.implicits._
    val corpus = (base ++ planted).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 60)
    val sweep = Seq(2, 4, 8).map { groups =>
      val found = Similarity.portableLshTopK(corpus, "id", "vec", queries, "id", "vec",
        k = 1, bitsPerGroup = 6, groups = groups)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      groups -> recallOf(found)
    }
    sweep.sliding(2).foreach { case Seq((g1, r1), (g2, r2)) =>
      assert(r2 >= r1, s"portable recall fell from $r1 (groups=$g1) to $r2 (groups=$g2)")
    }
    assert(sweep.last._2 >= 0.9, s"top-of-sweep portable recall ${sweep.last._2} below the planted floor")
  }

  test("IVF recall is monotone in nProbe and doesn't collapse at defaults") {
    import spark.implicits._
    val corpus = (base ++ planted).toDF("id", "vec")
    val queries = corpus.filter(col("id") < 60)
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 8, iterations = 5)
    val sweep = Seq(1, 2, 4).map { nProbe =>
      val found = Similarity.ivfTopK(corpus, "id", "vec", queries, "id", "vec",
        k = 1, centroids, nProbe = nProbe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      nProbe -> recallOf(found)
    }
    sweep.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (nProbe=$p1) to $r2 (nProbe=$p2)")
    }
    assert(sweep.last._2 >= 0.9, s"top-of-sweep recall ${sweep.last._2} below the planted floor")
    // near-dups land in their base vector's cell: even nProbe=1 should
    // find most, but the sweep exists to catch a probe-order regression
    assert(sweep.head._2 >= 0.5, s"nProbe=1 recall ${sweep.head._2} implausibly low — probe ordering broken?")
  }
}
