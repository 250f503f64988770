package graft.tools

import graft.ops.Decontam
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 A/B record for the q85 shapes, warm, one session, sf0.1,
  * local[32]: set path ~0.70s, knownSources bitmask ~0.74s,
  * one-exchange (gram,source)-pre-dedup mold ~0.72s — all three
  * aggregation strategies CONVERGE; the wall is the map-side gram
  * pipeline (~0.25s) + stage overhead, not the shuffle. The one real
  * lever was perRowDistinct=false on the full pipeline (0.56s vs
  * 0.73s), now the crossSourceOverlap default. Dictionary discovery
  * (distinct source) costs ~0.15s/job — why the bitmask path stays
  * opt-in behind a caller-supplied dictionary. */
object ProfQ85 {
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
    def time(label: String)(f: => Long): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[$label] run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    val par = Some(spark.sparkContext.defaultParallelism)
    time("set") {
      Decontam.crossSourceOverlap(docs, "source", "text", n = 5, repartitionTo = par).count()
    }
    val dict = docs.select("source").distinct().collect().map(_.getString(0)).toSeq
    time("dict-discovery") {
      docs.select("source").distinct().count()
    }
    time("bitmask") {
      Decontam.crossSourceOverlap(docs, "source", "text", n = 5, repartitionTo = par,
        knownSources = Some(dict)).count()
    }
    // decomposition: map-side gram pipeline alone (no agg shuffle)
    time("explode-only") {
      graft.ops.Dedup.explodeGramHashes(
        docs.repartition(spark.sparkContext.defaultParallelism), "source", "text", 5)
        .select(count(lit(1))).collect()(0).getLong(0)
    }
    // gram agg without within-row distinct (is the per-row hash-set walk paying?)
    time("set-norowdistinct") {
      graft.ops.Dedup.explodeGramHashes(
        docs.repartition(spark.sparkContext.defaultParallelism), "source", "text", 5,
        perRowDistinct = false)
        .groupBy(col("_g")).agg(collect_set(col("source")).as("_ss"))
        .where(size(col("_ss")) >= 2).select(count(lit(1))).collect()(0).getLong(0)
    }
    // full pipeline, no per-row distinct
    time("set-full-nrd") {
      graft.ops.Dedup.explodeGramHashes(
        docs.repartition(spark.sparkContext.defaultParallelism), "source", "text", 5,
        perRowDistinct = false)
        .groupBy(col("_g")).agg(collect_set(col("source")).as("_ss"))
        .where(size(col("_ss")) >= 2)
        .select(explode(col("_ss")).as("source_a"), col("_ss"))
        .select(col("source_a"), explode(col("_ss")).as("source_b"))
        .where(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .count()
    }
    // q88 mold: one gram exchange, (gram,source) pre-dedup, collect_list
    time("mold") {
      val g = graft.ops.Dedup.explodeGramHashes(
        docs.repartition(spark.sparkContext.defaultParallelism), "source", "text", 5)
        .repartition(col("_g"))
      g.groupBy(col("_g"), col("source")).agg(count(lit(1)))
        .groupBy(col("_g")).agg(collect_list(col("source")).as("_ss"))
        .where(size(col("_ss")) >= 2)
        .select(explode(col("_ss")).as("source_a"), col("_ss"))
        .select(col("source_a"), explode(col("_ss")).as("source_b"))
        .where(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
        .count()
    }
    spark.stop()
  }
}
