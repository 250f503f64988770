package graft.readers

import graft.SparkSpec
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Fixtures encoded by hand from the published SPSS/PSPP system-file
  * spec: variables AGE (numeric), NAME (8-char string), CITY (12-char
  * string → one continuation record), in both uncompressed and
  * bytecode-compressed data layouts.
  */
class SpssReaderSpec extends SparkSpec {

  private def le(n: Int): Array[Byte] = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def d8(v: Double): Array[Byte] = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
  private def pad8(s: String): Array[Byte] = s.padTo(8, ' ').getBytes("ISO-8859-1")

  private def varRecord(typ: Int, name: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(le(2)); out.write(le(typ)); out.write(le(0)); out.write(le(0))
    out.write(le(0x050800)); out.write(le(0x050800)) // print/write formats (arbitrary)
    out.write(name.padTo(8, ' ').getBytes("ISO-8859-1"))
    out.toByteArray
  }

  /** File header + dictionary for AGE / NAME(8) / CITY(12). */
  private def dictionary(compression: Int, bias: Double): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val header = ByteBuffer.allocate(176).order(ByteOrder.LITTLE_ENDIAN)
    header.put("$FL2".getBytes("ISO-8859-1"))
    header.position(4); header.put("@(#) SPSS DATA FILE test fixture".padTo(60, ' ').getBytes("ISO-8859-1"))
    header.putInt(64, 2)            // layout code (reveals byte order)
    header.putInt(68, 4)            // nominal case size (elements per case)
    header.putInt(72, compression)
    header.putInt(76, 0)            // weight index
    header.putInt(80, 3)            // ncases
    header.putDouble(84, bias)
    header.position(92); header.put("01 Jan 26".getBytes); header.put("12:00:00".getBytes)
    out.write(header.array())
    out.write(varRecord(0, "AGE"))
    out.write(varRecord(8, "NAME"))
    out.write(varRecord(12, "CITY"))
    out.write(varRecord(-1, "CITY2")) // continuation for CITY's 2nd segment
    out.write(le(999)); out.write(le(0)) // dictionary terminator
    out.toByteArray
  }

  test("uncompressed layout decodes numerics, strings and continuations") {
    val out = new ByteArrayOutputStream()
    out.write(dictionary(compression = 0, bias = 100.0))
    // 3 cases x 4 elements (AGE, NAME, CITY, CITY2)
    out.write(d8(34.0)); out.write(pad8("ada")); out.write(pad8("amsterda")); out.write(pad8("m"))
    out.write(d8(-java.lang.Double.MAX_VALUE)); out.write(pad8("bob")); out.write(pad8("berlin")); out.write(pad8(""))
    out.write(d8(27.5)); out.write(pad8("cyd")); out.write(pad8("christch")); out.write(pad8("urch"))
    val dir = Files.createTempDirectory("sav")
    Files.write(dir.resolve("u.sav"), out.toByteArray)

    val df = SpssReader.read(spark, s"file://$dir/u.sav")
    assert(df.columns.toSeq == Seq("AGE", "NAME", "CITY"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows(0).getDouble(0) == 34.0 && rows(0).getString(1) == "ada" && rows(0).getString(2) == "amsterdam")
    assert(rows(1).isNullAt(0) && rows(1).getString(2) == "berlin") // sysmis → null
    assert(rows(2).getString(2) == "christchurch")
  }

  test("bytecode-compressed layout: bias codes, literals, sysmis, spaces") {
    val out = new ByteArrayOutputStream()
    out.write(dictionary(compression = 1, bias = 100.0))
    // case 1: AGE=34 via bias code (134), NAME/CITY via literals
    // case 2: AGE sysmis (255), NAME spaces (254), CITY via literals
    // commands: [134, 253, 253, 253,  255, 254, 253, 253] + literals
    out.write(Array[Byte](134.toByte, 253.toByte, 253.toByte, 253.toByte,
      255.toByte, 254.toByte, 253.toByte, 253.toByte))
    out.write(pad8("ada")); out.write(pad8("amsterda")); out.write(pad8("m"))
    out.write(pad8("berlin")); out.write(pad8(""))
    // trailing block: end-of-data
    out.write(Array[Byte](252.toByte, 0, 0, 0, 0, 0, 0, 0))
    val dir = Files.createTempDirectory("savc")
    Files.write(dir.resolve("c.sav"), out.toByteArray)

    val df = SpssReader.read(spark, s"file://$dir/c.sav")
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(0) == 34.0 && rows(0).getString(1) == "ada" && rows(0).getString(2) == "amsterdam")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).getString(2) == "berlin")
  }

  test("non-sav bytes are rejected") {
    intercept[IllegalArgumentException](SpssReader.dictProbe("nope".getBytes ++ new Array[Byte](250)))
  }
}
