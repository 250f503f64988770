package graft.tools

import graft.functions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session A/B of the cosineNearDupPairs candidate shapes (round 18):
  * (a) banded SELF-JOIN — the pre-r18 shape: `lshBandBuckets` (128
  *     hyperplane dot products per vector) evaluates once PER JOIN SIDE,
  *     i.e. twice over the corpus, plus two bucket-keyed exchanges;
  * (b) ONE bucket exchange — groupBy(band,bucket).agg(sort_array(
  *     collect_list(id))) + map-side in-bucket pair expansion, the
  *     committed shape (the Dedup.lshCandidatePairs / q85 mold);
  * plus a stage-by-stage breakdown of (b) to attribute the residue.
  */
object ProfQ50 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // (a) the pre-r18 self-join shape, reproduced verbatim
    def selfJoinShape(df: DataFrame): DataFrame = {
      val banded = df
        .select(col("vec_id").as("_id"),
          posexplode(VectorFunctions.lshBandBuckets(col("embedding"), 8, 16, 64, 42L)))
        .withColumnRenamed("pos", "_band")
        .withColumnRenamed("col", "_bucket")
      val candidates = banded.select(col("_band"), col("_bucket"), col("_id").as("id1"))
        .join(banded.select(col("_band"), col("_bucket"), col("_id").as("id2")), Seq("_band", "_bucket"))
        .filter(col("id1") < col("id2"))
        .dropDuplicates("id1", "id2")
      candidates
        .join(df.select(col("vec_id").as("id1"), col("embedding").as("_v1")), Seq("id1"))
        .join(df.select(col("vec_id").as("id2"), col("embedding").as("_v2")), Seq("id2"))
        .select(col("id1"), col("id2"), VectorFunctions.cosineSim(col("_v1"), col("_v2")).as("cosine"))
        .filter(col("cosine") >= 0.8)
    }

    def banded(df: DataFrame): DataFrame = df
      .select(col("vec_id").as("_id"),
        posexplode(VectorFunctions.lshBandBuckets(col("embedding"), 8, 16, 64, 42L)))
      .withColumnRenamed("pos", "_band")
      .withColumnRenamed("col", "_bucket")
    def buckets(df: DataFrame): DataFrame = banded(df)
      .groupBy("_band", "_bucket")
      .agg(sort_array(collect_list("_id")).as("_ids"))
      .where(size(col("_ids")).between(2, 1000))
    def pairs(df: DataFrame): DataFrame = buckets(df)
      .select(explode(flatten(transform(col("_ids"), (x, i) =>
        transform(slice(col("_ids"), i + lit(2), size(col("_ids"))), y =>
          struct(x.as("id1"), y.as("id2")))))).as("_p"))
      .select(col("_p.id1").as("id1"), col("_p.id2").as("id2"))
    def deduped(df: DataFrame): DataFrame = pairs(df).dropDuplicates("id1", "id2")

    def time(label: String)(f: => Long): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[$label] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    if (sys.env.contains("PROF_EXPLAIN")) {
      println("=== LSH shape ===")
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.8, bruteForceMax = 0).explain("formatted")
      println("=== brute shape ===")
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.8, exact = true).explain("formatted")
    }
    time("a-self-join")(selfJoinShape(emb).count())
    time("b-one-exchange")(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.8, bruteForceMax = 0).count())
    time("c-cost-based")(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.8).count())
    time("s1-scan")(emb.count())
    time("s2-banded")(banded(emb).count())
    time("s3-buckets")(buckets(emb).count())
    time("s4-pairs")(pairs(emb).count())
    time("s5-deduped")(deduped(emb).count())
    spark.stop()
  }
}
