package graft.ops

import graft.SparkSpec
import graft.output.Writers
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join results") {
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "lv")
    val right = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("rk", "rv")
    val plain = left.join(right, col("k") === col("rk")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Relational.saltedJoin(left, right, "k", "rk", saltFactor = 4)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 4)
  }

  test("bucketedTable round-trips and records bucket metadata") {
    val df = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "s")
    val ref = Writers.bucketedTable(df, "bt_test", Seq("id"), nBuckets = 4)
    assert(ref.options("buckets") == "4")
    assert(spark.table("bt_test").count() == 3)
    spark.sql("DROP TABLE bt_test")
  }

  test("ivfTopK finds planted near-duplicates") {
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val base = (0L until 60L).map(i => (i, vec()))
    val planted = base.map { case (i, v) => (i + 100L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)) }
    val corpus = (base ++ planted).toDF("id", "vec")
    val centroids = Similarity.trainIvfCentroids(corpus, "vec", k = 8, iterations = 5)
    assert(centroids.length == 8 && centroids.head.length == 16)
    val queries = corpus.filter(col("id") < 60)
    val found = Similarity.ivfTopK(corpus, "id", "vec", queries, "id", "vec",
      k = 1, centroids, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = base.count { case (i, _) => found.contains((i, i + 100L)) } / 60.0
    assert(recall >= 0.9, s"IVF planted-near-dup recall $recall too low")
  }
}
