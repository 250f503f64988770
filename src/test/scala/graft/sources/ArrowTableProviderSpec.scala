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
}
