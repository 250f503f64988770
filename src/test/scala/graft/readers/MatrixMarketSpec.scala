package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.nio.file.Files

class MatrixMarketSpec extends SparkSpec {
  import spark.implicits._

  test("coordinate real general") {
    val dir = Files.createTempDirectory("mtx")
    Files.writeString(dir.resolve("m.mtx"),
      """%%MatrixMarket matrix coordinate real general
        |% a comment
        |3 4 4
        |1 1 5.5
        |2 3 -1.0
        |3 4 2.25
        |1 4 0.5
        |""".stripMargin)
    val m = MatrixMarketReader.read(spark, s"file://$dir/m.mtx")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m == Map((0L, 0L) -> 5.5, (1L, 2L) -> -1.0, (2L, 3L) -> 2.25, (0L, 3L) -> 0.5))
  }

  test("coordinate pattern symmetric mirrors off-diagonal entries") {
    val dir = Files.createTempDirectory("mtxs")
    Files.writeString(dir.resolve("s.mtx"),
      """%%MatrixMarket matrix coordinate pattern symmetric
        |3 3 3
        |1 1
        |2 1
        |3 2
        |""".stripMargin)
    val m = MatrixMarketReader.read(spark, s"file://$dir/s.mtx")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m == Map((0L, 0L) -> 1.0, (1L, 0L) -> 1.0, (0L, 1L) -> 1.0, (2L, 1L) -> 1.0, (1L, 2L) -> 1.0))
  }

  test("dense array is column-major") {
    val dir = Files.createTempDirectory("mtxa")
    Files.writeString(dir.resolve("a.mtx"),
      """%%MatrixMarket matrix array real general
        |2 2
        |1.0
        |2.0
        |3.0
        |4.0
        |""".stripMargin)
    val m = MatrixMarketReader.read(spark, s"file://$dir/a.mtx")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m == Map((0L, 0L) -> 1.0, (1L, 0L) -> 2.0, (0L, 1L) -> 3.0, (1L, 1L) -> 4.0))
  }

  test("registry routes the matrixmarket kind") {
    val dir = Files.createTempDirectory("mtxr")
    Files.writeString(dir.resolve("r.mtx"),
      "%%MatrixMarket matrix coordinate integer general\n1 1 1\n1 1 7\n")
    val df = SparkReaders.reader("matrixmarket_reader").get
      .read(spark, DataRef("matrixmarket", s"file://$dir/r.mtx"))
    assert(df.as[(Long, Long, Double)].head() == ((0L, 0L, 7.0)))
  }
}
