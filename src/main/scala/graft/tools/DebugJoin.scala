package graft.tools

// scratch debug main — deleted before commit
object DebugJoin {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("debugjoin")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("dbgdim").toString
    Seq((7, "seven"), (8, "seven"), (55, "absent")).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("dim")
    spark.table("dim").where(org.apache.spark.sql.functions.expr("rand() < 2.0"))
      .createOrReplaceTempView("dim_nd")
    val q = spark.sql("SELECT d.k FROM dim_nd d WHERE d.v = 'seven'")
    println("=== optimized ===")
    println(q.queryExecution.optimizedPlan.treeString)
    val plan = q.queryExecution.optimizedPlan
    println("nondet nodes: " + plan.collect {
      case n if n.expressions.exists(e => !e.deterministic) => n.nodeName
    })
    spark.stop()
  }
}
