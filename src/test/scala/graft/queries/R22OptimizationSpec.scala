package graft.queries

import graft.SparkSpec
import graft.functions.MinHashUnion
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-22 optimization pins: each test freezes the EQUIVALENCE between
  * an optimized shape and the formulation it replaced, so the speedup
  * can never silently drift the results.
  */
class R22OptimizationSpec extends SparkSpec {
  import spark.implicits._

  test("q56 posexplode min-fold == MinHashUnion Aggregator formulation") {
    // Covers every group shape the union can see: multi-doc groups,
    // a single-doc group (union = its own sig), empty text (the
    // all-zeros signature row), unicode, repeated tokens, and k below/
    // at/above the 2-slot sketch_head (k=1 exercises the no-comma
    // take(2) edge).
    val docs = Seq(
      ("web", "the quick brown fox jumps"),
      ("web", "the quick brown fox jumps over the lazy dog"),
      ("web", ""),
      ("books", "Ünïcödé tökens ünïcödé tökens"),
      ("books", "repeat repeat repeat repeat"),
      ("single", "one lonely document here"),
      ("zeros", "")
    ).toDF("source", "text")
    for (k <- Seq(1, 2, 8, 64)) {
      val sigs = Dedup.withMinhashSignature(docs, "text", "sig", shingleN = 1, k = k)
      val viaAggregator = sigs.select(col("source"), col("sig").as("value"))
        .as[(String, Seq[Long])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(MinHashUnion.column.name("sketch"))
        .map { case (src, sketch) => (src, sketch.length, sketch.take(2).mkString(",")) }
        .toDF("source", "sketch_len", "sketch_head")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.as[(String, Int, String)].collect().sorted.toSeq
      val fold = canon(StreamingBatchQueries.sketchUnionMinFold(sigs))
      assert(fold == canon(viaAggregator), s"k=$k")
      // every sketch reports the full slot count: the fold's final
      // count consumes all k slot rows, so none of the union's work
      // can be pruned out of the bench path
      assert(fold.forall(_._2 == k), s"k=$k sketch_len")
    }
  }
}
