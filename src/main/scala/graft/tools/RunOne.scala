package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Run a single named query with timing and optional plan dump:
  * `sbt "runMain graft.tools.RunOne q42_minhash_lsh /root/testdata/sf0.1 [explain] [repeat=N]"`.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explain = args.contains("explain")
    val repeat = args.collectFirst { case s if s.startsWith("repeat=") => s.drop(7).toInt }.getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + physical planning
      val tPlan = System.nanoTime()
      if (explain && i == 1) df.explain("formatted")
      val n = df.count()
      val tEnd = System.nanoTime()
      println(f"[$name] run $i: total=${(tEnd - t0) / 1e9}%.2fs build=${(tBuild - t0) / 1e9}%.2fs plan=${(tPlan - tBuild) / 1e9}%.2fs exec=${(tEnd - tPlan) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }
}
