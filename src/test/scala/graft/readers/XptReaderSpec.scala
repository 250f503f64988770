package graft.readers

import graft.SparkSpec
import graft.datatypes.{DataRef, Detect}
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files

/** Fixture hand-encoded from the published SAS TS-140 XPORT v5 layout:
  * 80-byte header records, big-endian NAMESTR structs, IBM hex-float
  * numerics with a truncated-width column, '.'-missing and blank tail
  * padding.
  */
class XptReaderSpec extends SparkSpec {
  import spark.implicits._

  private def rec(s: String): Array[Byte] = s.padTo(80, ' ').getBytes("ISO-8859-1")

  /** double → IBM 64-bit hex float (exact for binary-representable values). */
  private def ibm(d: Double, len: Int = 8): Array[Byte] = {
    val out = new Array[Byte](len)
    if (d == 0.0) return out
    val sign = if (d < 0) 0x80 else 0
    var m = math.abs(d)
    var e = 0
    while (m >= 1.0) { m /= 16.0; e += 1 }
    while (m < 1.0 / 16.0) { m *= 16.0; e -= 1 }
    val full = new Array[Byte](8)
    full(0) = (sign | (e + 64)).toByte
    var frac = m
    (1 until 8).foreach { i =>
      frac *= 256.0
      val b = frac.toInt
      full(i) = b.toByte
      frac -= b
    }
    System.arraycopy(full, 0, out, 0, len)
    out
  }

  private def namestr(ntype: Int, nlng: Int, name: String, pos: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(140) // big-endian
    b.putShort(0, ntype.toShort)
    b.putShort(4, nlng.toShort)
    name.padTo(8, ' ').getBytes("ISO-8859-1").zipWithIndex.foreach { case (c, i) => b.put(8 + i, c) }
    b.putInt(84, pos)
    b.array()
  }

  private lazy val url: String = {
    val out = new ByteArrayOutputStream()
    out.write(rec("HEADER RECORD*******LIBRARY HEADER RECORD!!!!!!!000000000000000000000000000000"))
    out.write(rec("SAS     SAS     SASLIB  9.4     Linux"))
    out.write(rec("22AUG12:00:00:00"))
    out.write(rec("HEADER RECORD*******MEMBER  HEADER RECORD!!!!!!!000000000000000001600000000140"))
    out.write(rec("HEADER RECORD*******DSCRPTR HEADER RECORD!!!!!!!000000000000000000000000000000"))
    out.write(rec("SAS     FIX     SASDATA 9.4     Linux"))
    out.write(rec("22AUG12:00:00:00"))
    out.write(rec("HEADER RECORD*******NAMESTR HEADER RECORD!!!!!!!000000000300000000000000000000"))
    // 3 variables: id f8 @0, name char8 @8, score IBM width 4 @16 -> row 20
    val ns = new ByteArrayOutputStream()
    ns.write(namestr(1, 8, "ID", 0))
    ns.write(namestr(2, 8, "NAME", 8))
    ns.write(namestr(1, 4, "SCORE", 16))
    val nsPadded = ns.toByteArray ++ new Array[Byte]((80 - ns.size() % 80) % 80)
    out.write(nsPadded)
    out.write(rec("HEADER RECORD*******OBS     HEADER RECORD!!!!!!!000000000000000000000000000000"))
    def row(id: Double, name: String, score: Option[Double]): Unit = {
      out.write(ibm(id))
      out.write(name.padTo(8, ' ').getBytes("ISO-8859-1"))
      score match {
        case Some(v) => out.write(ibm(v, 4))
        case None => out.write('.'.toInt); out.write(new Array[Byte](3))
      }
    }
    row(1.0, "alpha", Some(9.5))
    row(2.0, "beta", Some(-2.5))
    row(3.0, "", None)
    row(100.25, "edge", Some(0.0))
    // TS-140 special missing '.A': sentinel byte 'A' + all-zero tail
    out.write(ibm(4.0))
    out.write("gamma".padTo(8, ' ').getBytes("ISO-8859-1"))
    out.write('A'.toInt); out.write(new Array[Byte](3))
    // pad the data section to an 80-byte boundary with blanks (spec tail)
    val dataLen = 5 * 20
    out.write(Array.fill((80 - dataLen % 80) % 80)(' '.toByte))
    val dir = Files.createTempDirectory("xpt")
    Files.write(dir.resolve("fix.xpt"), out.toByteArray)
    s"file://$dir/fix.xpt"
  }

  test("ibm hex float converts exactly for binary-representable values") {
    assert(XptReader.ibmToDouble(ibm(1.0), 0, 8) == 1.0)
    assert(XptReader.ibmToDouble(ibm(-2.5), 0, 8) == -2.5)
    assert(XptReader.ibmToDouble(ibm(100.25), 0, 8) == 100.25)
    assert(XptReader.ibmToDouble(ibm(9.5, 4), 0, 4) == 9.5)
    assert(XptReader.ibmToDouble(ibm(1e-10), 0, 8) == 1e-10)
  }

  test("meta parses namestrs, row length and observation count") {
    val m = XptReader.meta(url, spark.sparkContext.hadoopConfiguration)
    assert(m.vars.map(_.name) == Seq("ID", "NAME", "SCORE"))
    assert(m.vars.map(_.length) == Seq(8, 8, 4) && m.rowLength == 20)
  }

  test("observations read with IBM numerics, missing and padding handled") {
    val df = XptReader.read(spark, url)
    assert(df.columns.toSeq == Seq("ID", "NAME", "SCORE"))
    val rows = df.as[(Double, Option[String], Option[Double])].collect().sortBy(_._1)
    assert(rows.length == 5)
    assert(rows(0) == ((1.0, Some("alpha"), Some(9.5))))
    assert(rows(1) == ((2.0, Some("beta"), Some(-2.5))))
    assert(rows(2) == ((3.0, None, None)))
    assert(rows(3) == ((4.0, Some("gamma"), None))) // special missing '.A'
    assert(rows(4) == ((100.25, Some("edge"), Some(0.0))))
  }

  test("kind detection and registry routing split sas7bdat vs xpt") {
    assert(Detect.recommend("x.xpt", head = "HEADER RECORD*******LIBRARY".getBytes).head.kind.name == "sas")
    val r = SparkReaders.reader("xpt_reader").get
    assert(r.isOk(DataRef("sas", url)) && !r.isOk(DataRef("sas", "file:///x.sas7bdat")))
    assert(r.read(spark, DataRef("sas", url)).count() == 5)
  }
}
