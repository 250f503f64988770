package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class ArrayPatternReaderSpec extends SparkSpec {
  import spark.implicits._

  private def npy(data: Seq[Double]): Array[Byte] = {
    val header = s"{'descr': '<f8', 'fortran_order': False, 'shape': (${data.size},), }"
    val pad = 64 - ((10 + header.length + 1) % 64)
    val h = header + (" " * pad) + "\n"
    val body = ByteBuffer.allocate(data.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    data.foreach(body.putDouble)
    val out = ByteBuffer.allocate(10 + h.length + data.size * 8)
    out.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1")).put(1.toByte).put(0.toByte)
    out.order(ByteOrder.LITTLE_ENDIAN).putShort(h.length.toShort)
    out.put(h.getBytes("ISO-8859-1")).put(body.array())
    out.array()
  }

  private lazy val dir = {
    val d = Files.createTempDirectory("arrpat")
    Files.write(d.resolve("temp_north_2023.npy"), npy(Seq(1.0, 2.0)))
    Files.write(d.resolve("temp_south_2024.npy"), npy(Seq(3.0, 4.0)))
    d
  }

  test("captures re-parse paths against the pattern") {
    val got = ArrayPatternReader.captures("file:///data/t_{site}_{year}.npy", "file:/data/t_north_2023.npy")
    assert(got.contains(Seq("north", "2023")))
    assert(ArrayPatternReader.captures("file:///data/t_{s}.npy", "file:/data/other.txt").isEmpty)
  }

  test("patterned npy files concat with captured fields as columns") {
    val df = ArrayPatternReader.read(spark, s"file://$dir/temp_{site}_{year}.npy")
    assert(df.columns.toSeq == Seq("idx", "value", "site", "year"))
    val rows = df.as[(Long, Double, String, String)].collect().sortBy(r => (r._3, r._1))
    assert(rows.toSeq == Seq(
      (0L, 1.0, "north", "2023"), (1L, 2.0, "north", "2023"),
      (0L, 3.0, "south", "2024"), (1L, 4.0, "south", "2024")))
  }

  test("registry routes pattern urls for array kinds") {
    val r = SparkReaders.reader("array_pattern_reader").get
    assert(r.isOk(DataRef("numpy", s"file://$dir/temp_{site}_{year}.npy")))
    assert(!r.isOk(DataRef("numpy", s"file://$dir/temp_north_2023.npy")))
    assert(r.read(spark, DataRef("numpy", s"file://$dir/temp_{site}_{year}.npy")).count() == 4)
  }
}
