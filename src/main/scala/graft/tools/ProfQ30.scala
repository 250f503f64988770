package graft.tools

import graft.queries.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-session interleaved A/B for q30_math_funcs (VERDICT r18 #2): the
  * only non-accepted >2x heavy-tail row (judge-serial 0.263 s vs DuckDB
  * 0.103 s, map-only plan, zero exchanges at both SFs). Three shapes:
  *
  *   a) the committed query — every summed term fixed to DECIMAL so the
  *      sum is exact and order-independent (the oracle hash-match
  *      contract: double sums accumulate in engine-specific order);
  *   b) the same query with plain DOUBLE sums — what q30 would cost if
  *      the oracle allowed order-dependent float aggregation;
  *   c) the floor — same scan + groupBy with count(*) only, isolating
  *      per-query fixed cost (job scheduling, codegen, scan) from the
  *      arithmetic.
  *
  * (a)-(b) attributes the decimal-exactness tax, (b)-(c) the plain math,
  * (c) the floor no rewrite can remove. Interleaved a,b,c per round after
  * one shared untimed warmup (sequential blocks bias whichever runs
  * first — r18 measured a 45% sequential read shrinking to ~10%
  * interleaved).
  */
object ProfQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def committed(): DataFrame = {
      val priceDec = col("l_extendedprice").cast("decimal(18,4)")
      val discDec = col("l_discount").cast("decimal(18,4)")
      val qtyDec = col("l_quantity").cast("decimal(18,4)")
      table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(sum(priceDec * discDec), 2).cast("double").as("disc_total"),
          sum(floor(col("l_quantity"))).as("qty_floor_sum"),
          sum(ceil(col("l_discount") * 100)).as("disc_pct_ceil_sum"),
          round(sum(abs(priceDec - 1000)), 2).cast("double").as("abs_dev_sum"),
          round(sum(qtyDec * qtyDec), 2).cast("double").as("qty_sq_sum"),
          sum(log(col("l_extendedprice") + 1).cast("decimal(28,6)")).cast("double").as("log_price_sum"),
          sum(sqrt(col("l_quantity")).cast("decimal(28,6)")).cast("double").as("sqrt_qty_sum"),
          sum(col("l_orderkey") % 7).as("mod_sum")
        )
    }
    def doubles(): DataFrame =
      table(spark, sfDir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_extendedprice") * col("l_discount")).as("disc_total"),
          sum(floor(col("l_quantity"))).as("qty_floor_sum"),
          sum(ceil(col("l_discount") * 100)).as("disc_pct_ceil_sum"),
          sum(abs(col("l_extendedprice") - 1000)).as("abs_dev_sum"),
          sum(col("l_quantity") * col("l_quantity")).as("qty_sq_sum"),
          sum(log(col("l_extendedprice") + 1)).as("log_price_sum"),
          sum(sqrt(col("l_quantity"))).as("sqrt_qty_sum"),
          sum(col("l_orderkey") % 7).as("mod_sum")
        )
    def floorQ(): DataFrame =
      table(spark, sfDir, "lineitem").groupBy("l_returnflag").agg(count(lit(1)).as("n"))

    def run(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(committed()); run(doubles()); run(floorQ()) // shared warmup, untimed
    val acc = Array.fill(3)(List.empty[Double])
    (1 to 6).foreach { i =>
      val (ta, na) = run(committed())
      val (tb, nb) = run(doubles())
      val (tc, nc) = run(floorQ())
      acc(0) ::= ta; acc(1) ::= tb; acc(2) ::= tc
      println(f"[ab-q30] round $i: a-decimal $ta%.3fs ($na) b-double $tb%.3fs ($nb) c-floor $tc%.3fs ($nc)")
    }
    def best(l: List[Double]) = l.min
    println(f"[ab-q30] BEST: a-decimal ${best(acc(0))}%.3fs  b-double ${best(acc(1))}%.3fs  c-floor ${best(acc(2))}%.3fs")
    println(f"[ab-q30] attribution: decimal-tax ${best(acc(0)) - best(acc(1))}%.3fs  math ${best(acc(1)) - best(acc(2))}%.3fs  floor ${best(acc(2))}%.3fs")
    spark.stop()
  }
}
