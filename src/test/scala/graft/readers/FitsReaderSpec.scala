package graft.readers

import graft.SparkSpec
import graft.datatypes.DataRef
import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.Files

/** Fixtures hand-encoded from the FITS standard: 80-char cards in
  * 2880-byte blocks, big-endian data with BZERO/BSCALE scaling.
  */
class FitsReaderSpec extends SparkSpec {
  import spark.implicits._

  private def card(k: String, v: String): Array[Byte] =
    (k.padTo(8, ' ') + "= " + v).padTo(80, ' ').getBytes("ISO-8859-1")

  private def fits(cards: Seq[Array[Byte]], data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    cards.foreach(out.write)
    out.write("END".padTo(80, ' ').getBytes("ISO-8859-1"))
    while (out.size() % 2880 != 0) out.write(' ')
    out.write(data)
    while (out.size() % 2880 != 0) out.write(0)
    out.toByteArray
  }

  test("2-D int16 image with BZERO/BSCALE reads long-form") {
    // 2x3 (NAXIS1=3, NAXIS2=2) int16, value = 1000 + 2*raw
    val data = ByteBuffer.allocate(12)
    Seq(1, 2, 3, 4, 5, 6).foreach(v => data.putShort(v.toShort))
    val bytes = fits(Seq(
      card("SIMPLE", "T"), card("BITPIX", "16"), card("NAXIS", "2"),
      card("NAXIS1", "3"), card("NAXIS2", "2"),
      card("BZERO", "1000.0"), card("BSCALE", "2.0")), data.array())
    val dir = Files.createTempDirectory("fits")
    Files.write(dir.resolve("img.fits"), bytes)

    val m = FitsReader.read(spark, s"file://$dir/img.fits")
      .as[(Long, Long, Double)].collect().map { case (i, j, v) => (i, j) -> v }.toMap
    assert(m.size == 6)
    assert(m((0L, 0L)) == 1002.0 && m((0L, 2L)) == 1006.0 && m((1L, 0L)) == 1008.0 && m((1L, 2L)) == 1012.0)
  }

  test("1-D float32 spectrum reads and detection sees the magic") {
    val data = ByteBuffer.allocate(12)
    Seq(0.5f, -1.5f, 2.25f).foreach(data.putFloat)
    val bytes = fits(Seq(
      card("SIMPLE", "T"), card("BITPIX", "-32"), card("NAXIS", "1"), card("NAXIS1", "3")), data.array())
    val dir = Files.createTempDirectory("fits1")
    Files.write(dir.resolve("spec.fits"), bytes)

    val m = FitsReader.read(spark, s"file://$dir/spec.fits").as[(Long, Double)].collect().toMap
    assert(m == Map(0L -> 0.5, 1L -> -1.5, 2L -> 2.25))
    assert(graft.datatypes.Detect.recommend(s"file://$dir/spec.fits",
      head = "SIMPLE  =                    T".getBytes).head.kind.name == "fits")
    val df = SparkReaders.reader("fits_reader").get.read(spark, DataRef("fits", s"file://$dir/spec.fits"))
    assert(df.count() == 3)
  }
}
