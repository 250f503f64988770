package graft.tools

import graft.SparkEntry
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of named queries to files — the
  * before/after plan evidence for optimization rounds:
  * `sbt "runMain graft.tools.DumpPlans /root/testdata/sf0.1 plans/r21 _before q59_multiset_ops q94_incremental_dedup"`.
  * Plans are captured AFTER execution so AQE-final shapes are shown,
  * matching what the bench actually runs.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[dumpplans] unknown query: $name")
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val t0 = System.nanoTime()
          df.count() // settle AQE so the dumped plan is the executed one
          val wall = (System.nanoTime() - t0) / 1e9
          val fmt = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"$name$suffix.txt"),
            s"// $name @ $sfDir (cold-ish wall ${f"$wall%.2f"}s)\n$fmt")
          println(f"[dumpplans] $name%-36s ${wall}%.2fs -> $outDir/$name$suffix.txt")
      }
    }
    spark.stop()
  }
}
