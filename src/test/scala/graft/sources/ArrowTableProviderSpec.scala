package graft.sources

import graft.SparkSpec
import graft.readers.ArrowIPCSpecHelpers
import java.nio.file.Files

class ArrowTableProviderSpec extends SparkSpec {
  import spark.implicits._

  test("DataSource V2 reads arrow directories with per-file partitions") {
    val dir = Files.createTempDirectory("arrowdsv2").toString
    ArrowIPCSpecHelpers.writeArrowFile(s"$dir/a.arrow", Seq(1L, 2L), Seq("x", "y"), Seq(0.5f, 1.5f))
    ArrowIPCSpecHelpers.writeArrowFile(s"$dir/b.arrow", Seq(3L), Seq("z"), Seq(2.5f))
    val df = spark.read.format("graft.sources.ArrowTableProvider").load(dir)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(df.rdd.getNumPartitions == 2) // one partition per file
    val rows = df.as[(Long, String, Float)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "x", 0.5f), (2L, "y", 1.5f), (3L, "z", 2.5f)))
    // filters/projection compose through Catalyst above the scan
    assert(df.filter($"score" > 1.0).select("name").as[String].collect().sorted.toSeq == Seq("y", "z"))
  }

  test("DataSource V2 write path round-trips scalars and arrays") {
    val dir = Files.createTempDirectory("arroww").toString + "/out"
    val src = Seq(
      (1L, "a", 0.5, true, Seq(1.0f, 2.0f)),
      (2L, "b", 1.5, false, Seq(3.0f)),
      (3L, null.asInstanceOf[String], 2.5, true, Seq.empty[Float])
    ).toDF("id", "name", "score", "flag", "vec").repartition(2)
    src.write.format("graft.sources.ArrowTableProvider").mode("append").save(dir)

    val back = spark.read.format("graft.sources.ArrowTableProvider").load(dir)
    assert(back.rdd.getNumPartitions == 2) // one file per writing task
    val rows = back.as[(Long, String, Double, Boolean, Seq[Float])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", 0.5, true, Seq(1.0f, 2.0f)),
      (2L, "b", 1.5, false, Seq(3.0f)),
      (3L, null, 2.5, true, Seq.empty[Float])))
  }

  test("mode overwrite truncates the previous contents") {
    val dir = Files.createTempDirectory("arrowow").toString + "/out"
    Seq((1L, "old")).toDF("id", "v").write.format("graft.sources.ArrowTableProvider").mode("append").save(dir)
    Seq((2L, "new"), (3L, "er")).toDF("id", "v")
      .write.format("graft.sources.ArrowTableProvider").mode("overwrite").save(dir)
    val back = spark.read.format("graft.sources.ArrowTableProvider").load(dir)
    assert(back.as[(Long, String)].collect().sortBy(_._1).toSeq == Seq((2L, "new"), (3L, "er")))
  }

  test("writes spill to multiple record batches past the batch size") {
    val dir = Files.createTempDirectory("arrowbatch").toString + "/out"
    val n = 10000 // > 4096 per-batch rows
    spark.range(n).selectExpr("id", "cast(id as double) as d")
      .coalesce(1).write.format("graft.sources.ArrowTableProvider").mode("append").save(dir)
    val back = spark.read.format("graft.sources.ArrowTableProvider").load(dir)
    assert(back.count() == n)
    assert(back.selectExpr("sum(d)").as[Double].head() == (n.toLong * (n - 1) / 2).toDouble)
  }
}
