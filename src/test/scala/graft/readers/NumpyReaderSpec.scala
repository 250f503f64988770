package graft.readers

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

class NumpyReaderSpec extends SparkSpec {
  import spark.implicits._

  test("NumpyWriter round-trips 1-D and 2-D long-form frames") {
    val dir = Files.createTempDirectory("npyw")
    val oneD = Seq((0L, 1.5), (1L, -2.25), (2L, 8.0)).toDF("idx", "value")
    val ref = graft.output.NumpyWriter.write(oneD, s"file://$dir/v.npy")
    assert(ref.options("shape") == "3")
    val back = NumpyReader.read(spark, s"file://$dir/v.npy").as[(Long, Double)].collect().sortBy(_._1)
    assert(back.toSeq == Seq((0L, 1.5), (1L, -2.25), (2L, 8.0)))

    val twoD = Seq((0L, Seq(1.0, 2.0, 3.0)), (1L, Seq(4.0, 5.0, 6.0))).toDF("idx", "row")
    graft.output.NumpyWriter.write(twoD, s"file://$dir/m.npy")
    val back2 = NumpyReader.read(spark, s"file://$dir/m.npy").as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(back2(0)._2 == Seq(1.0, 2.0, 3.0) && back2(1)._2 == Seq(4.0, 5.0, 6.0))

    // int32 dtype
    graft.output.NumpyWriter.write(oneD, s"file://$dir/i.npy", dtype = "<i4")
    val back3 = NumpyReader.read(spark, s"file://$dir/i.npy").as[(Long, Double)].collect().sortBy(_._1)
    assert(back3.map(_._2).toSeq == Seq(1.0, -2.0, 8.0))
  }

  /** Hand-built NPY v1: C-order little-endian. */
  private def npyBytes(dtype: String, shape: Seq[Int], data: Seq[Double], fortran: Boolean = false): Array[Byte] = {
    val header = s"{'descr': '$dtype', 'fortran_order': ${if (fortran) "True" else "False"}, 'shape': (${shape.mkString(", ")}${if (shape.length == 1) "," else ""}), }"
    val pad = 64 - ((10 + header.length + 1) % 64)
    val h = header + (" " * pad) + "\n"
    val body = ByteBuffer.allocate(data.size * 8).order(ByteOrder.LITTLE_ENDIAN)
    dtype match {
      case "<f8" => data.foreach(body.putDouble)
      case "<i4" => data.foreach(d => body.putInt(d.toInt))
    }
    val used = dtype match { case "<f8" => data.size * 8; case "<i4" => data.size * 4 }
    val out = ByteBuffer.allocate(10 + h.length + used)
    out.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1")).put(1.toByte).put(0.toByte)
    out.order(ByteOrder.LITTLE_ENDIAN).putShort(h.length.toShort)
    out.put(h.getBytes("ISO-8859-1")).put(body.array(), 0, used)
    out.array()
  }

  test("1-D and 2-D npy files decode with C and Fortran order") {
    val dir = Files.createTempDirectory("npy")
    Files.write(dir.resolve("v.npy"), npyBytes("<f8", Seq(3), Seq(1.5, 2.5, 3.5)))
    val v = NumpyReader.read(spark, s"file://$dir/v.npy").as[(Long, Double)].collect().sortBy(_._1)
    assert(v.toSeq == Seq((0L, 1.5), (1L, 2.5), (2L, 3.5)))

    val dir2 = Files.createTempDirectory("npy2")
    // 2x3 C-order: rows (1,2,3) and (4,5,6)
    Files.write(dir2.resolve("m.npy"), npyBytes("<f8", Seq(2, 3), Seq(1, 2, 3, 4, 5, 6)))
    val m = NumpyReader.read(spark, s"file://$dir2/m.npy").as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(m(0)._2 == Seq(1.0, 2.0, 3.0) && m(1)._2 == Seq(4.0, 5.0, 6.0))

    val dir3 = Files.createTempDirectory("npy3")
    // same logical matrix stored Fortran-order: column-major (1,4,2,5,3,6)
    Files.write(dir3.resolve("f.npy"), npyBytes("<f8", Seq(2, 3), Seq(1, 4, 2, 5, 3, 6), fortran = true))
    val f = NumpyReader.read(spark, s"file://$dir3/f.npy").as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(f(0)._2 == Seq(1.0, 2.0, 3.0) && f(1)._2 == Seq(4.0, 5.0, 6.0))
  }

  test("npz zip of members decodes with member names") {
    val dir = Files.createTempDirectory("npz")
    val zout = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(s"$dir/d.npz"))
    zout.putNextEntry(new java.util.zip.ZipEntry("a.npy"))
    zout.write(npyBytes("<f8", Seq(2), Seq(7, 8))); zout.closeEntry()
    zout.putNextEntry(new java.util.zip.ZipEntry("b.npy"))
    zout.write(npyBytes("<f8", Seq(1, 2), Seq(9, 10))); zout.closeEntry()
    zout.close()
    val df = NumpyReader.readNpz(spark, s"file://$dir/d.npz")
    val rows = df.as[(String, Long, Seq[Double])].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(("a", 0L, Seq(7.0)), ("a", 1L, Seq(8.0)), ("b", 0L, Seq(9.0, 10.0))))
  }

  test("raw buffers decode with the caller's dtype; misaligned sizes refuse") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("raw")
    val bb = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(1.5f).putFloat(-2.0f).putFloat(3.25f)
    java.nio.file.Files.write(dir.resolve("block.raw"), bb.array())
    val df = NumpyReader.readRaw(spark, s"file://$dir/block.raw", "<f4")
    assert(df.select("idx", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq ==
      Seq((0L, 1.5), (1L, -2.0), (2L, 3.25)))
    // 12 bytes is not a multiple of 8 — refuse, never misread
    val e = intercept[org.apache.spark.SparkException](
      NumpyReader.readRaw(spark, s"file://$dir/block.raw", "f8").collect())
    assert(e.getMessage.contains("multiple") || e.getCause != null)
  }
}
