package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the minhash-LSH pipeline (dev tool). */
object ProfQ42 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("count docs")(docs.count())
    time("tokens only")(docs.select(explode(graft.ops.TextOps.tokens(col("text")))).count())
    val sigs = graft.ops.Dedup.withMinhashSignature(docs, "text", "sig", repartitionTo = Some(32))
    time("signatures 1st")(sigs.select(sum(element_at(col("sig"), 1))).collect())
    time("signatures 2nd")(sigs.select(sum(element_at(col("sig"), 1))).collect())
    // Interleaved A/B: fused MinHashSig expression vs the round-18 staged
    // transform+UDF shape (values bit-identical — MinHashSigSpec).
    val staged = docs.repartition(32)
      .withColumn("sig", graft.ops.Dedup.stagedMinhashSignature(col("text"), 3, 64, 42L))
    for (r <- 1 to 3) {
      time(s"A/B round $r fused ")(sigs.select(sum(element_at(col("sig"), 1))).collect())
      time(s"A/B round $r staged")(staged.select(sum(element_at(col("sig"), 1))).collect())
    }
    val pairs = graft.ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text", repartitionTo = Some(32))
    time("full pairs")(pairs.count())
    time("full pairs again")(pairs.count())
    spark.stop()
  }
}
