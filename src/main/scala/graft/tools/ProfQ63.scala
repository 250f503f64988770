package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the text-LSH candidate shapes (round 18):
  * (a) the pre-r18 shape — bucket-size aggregation + bound join +
  *     self-join + distinct + two independent sig re-attach joins;
  * (b) the bucket-collect mold — ONE (band,bucket) exchange + map-side
  *     pair expansion + reused re-attach exchange
  *     (Dedup.bucketCandidatePairs / scorePairs, the q50 mold).
  * Both run the full q42-style pipeline (signatures → candidates →
  * jaccard filter → count) on sf0.1 documents; passes alternate a,b
  * after a shared untimed warmup (sequential blocks bias whichever
  * runs first — the ProfQ88 lesson).
  */
object ProfQ63 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    def sigs(): DataFrame =
      Dedup.withMinhashSignature(docs.select(col("doc_id"), col("text")), "text", "_sig",
        shingleN = 3, k = 64)
        .select(col("doc_id"), col("_sig"))

    // (a) the pre-r18 candidate shape, reproduced verbatim
    def oldShape(): Long = {
      val base = sigs().select(col("doc_id").as("_id"), col("_sig"))
        .where(col("_sig").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandW = floor(size(col("_sig")) / 16).cast("int")
      val banded = base.select(
        col("_id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => xxhash64(slice(col("_sig"), b * bandW + 1, bandW), b))))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bucket")
      val bucketSizes = banded.groupBy("_band", "_bucket").count()
      val bounded = banded
        .join(bucketSizes.filter(col("count") <= 1000), Seq("_band", "_bucket"))
        .drop("count")
      val pairs = bounded.select(col("_band"), col("_bucket"), col("_id").as("id1"))
        .join(bounded.select(col("_band"), col("_bucket"), col("_id").as("id2")), Seq("_band", "_bucket"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2")
        .distinct()
      val n = pairs
        .join(base.select(col("_id").as("id1"), col("_sig").as("sig1")), Seq("id1"))
        .join(base.select(col("_id").as("id2"), col("_sig").as("sig2")), Seq("id2"))
        .select((size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / size(col("sig1"))).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .count()
      base.unpersist(blocking = false)
      n
    }

    def newShape(): Long =
      Dedup.minhashNearDupPairs(docs.select(col("doc_id"), col("text")), "doc_id", "text",
        shingleN = 3, threshold = 0.5).count()

    oldShape(); newShape() // shared warmup, untimed
    (1 to 4).foreach { i =>
      val tA0 = System.nanoTime(); val nA = oldShape(); val tA = (System.nanoTime() - tA0) / 1e9
      val tB0 = System.nanoTime(); val nB = newShape(); val tB = (System.nanoTime() - tB0) / 1e9
      println(f"[ab-interleaved] round $i: a-selfjoin $tA%.2fs (rows=$nA)  b-bucketcollect $tB%.2fs (rows=$nB)")
    }
    spark.stop()
  }
}
