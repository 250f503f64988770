package graft.readers

import graft.SparkSpec
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** LAS fixture hand-encoded from the ASPRS 1.2 spec (format 1 records
  * with GPS time); PDB fixture uses the documented fixed columns.
  */
class PointCloudSpec extends SparkSpec {
  import spark.implicits._

  test("LAS format-1 points decode with scale/offset and gps time") {
    val recLen = 28
    val nPts = 3
    val dataAt = 227
    val bb = ByteBuffer.allocate(dataAt + recLen * nPts).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("LASF".getBytes("ISO-8859-1"))
    bb.put(24, 1.toByte); bb.put(25, 2.toByte) // version 1.2
    bb.putInt(96, dataAt)
    bb.put(104, 1.toByte)                      // point format 1
    bb.putShort(105, recLen.toShort)
    bb.putInt(107, nPts)
    bb.putDouble(131, 0.01); bb.putDouble(139, 0.01); bb.putDouble(147, 0.001) // scales
    bb.putDouble(155, 100.0); bb.putDouble(163, 200.0); bb.putDouble(171, 0.0) // offsets
    val pts = Seq(
      (1000, 2000, 3000, 77, 2, 100.5),
      (-500, 0, 250, 0, 1, 101.0),
      (0, 12345, -1000, 65535, 9, 102.25))
    pts.zipWithIndex.foreach { case ((x, y, z, i, c, t), k) =>
      val p = dataAt + k * recLen
      bb.putInt(p, x); bb.putInt(p + 4, y); bb.putInt(p + 8, z)
      bb.putShort(p + 12, i.toShort)
      bb.put(p + 15, c.toByte)
      bb.putDouble(p + 20, t)
    }
    val dir = Files.createTempDirectory("las")
    Files.write(dir.resolve("pts.las"), bb.array())

    val rows = LasReader.read(spark, s"file://$dir/pts.las")
      .as[(Long, Double, Double, Double, Int, Int, Double)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0) == ((0L, 110.0, 220.0, 3.0, 77, 2, 100.5)))
    assert(rows(1) == ((1L, 95.0, 200.0, 0.25, 0, 1, 101.0)))
    assert(rows(2)._5 == 65535 && rows(2)._4 == -1.0)
  }

  test("PDB atoms parse by fixed columns") {
    val dir = Files.createTempDirectory("pdb")
    Files.writeString(dir.resolve("mol.pdb"),
      """HEADER    HYDROLASE               01-JAN-26   XXXX
        |ATOM      1  N   MET A   1      11.104  13.207   2.100  1.00 20.00           N
        |ATOM      2  CA  MET A   1      12.560  13.329   2.300  1.00 20.00           C
        |HETATM    3  O   HOH B   2       0.000  -1.500   3.750  1.00 30.00           O
        |END
        |""".stripMargin)
    val df = PdbReader.read(spark, s"file://$dir/mol.pdb")
    assert(df.count() == 3)
    val n = df.filter($"serial" === 1).head()
    assert(n.getAs[String]("atom") == "N" && n.getAs[String]("residue") == "MET" &&
      n.getAs[String]("chain") == "A" && n.getAs[Double]("x") == 11.104 && n.getAs[String]("element") == "N")
    val het = df.filter($"record" === "HETATM").head()
    assert(het.getAs[String]("residue") == "HOH" && het.getAs[Double]("y") == -1.5)
  }
}
