package graft.readers

import graft.datatypes.DataRef
import java.net.URI
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native FITS reader (published FITS standard; reference
  * datatypes.py:549 FITS, read there via astropy). Primary-HDU image
  * arrays: the header is 2880-byte blocks of 80-char cards (SIMPLE,
  * BITPIX, NAXIS*, BZERO/BSCALE, END), the data a big-endian array of
  * |BITPIX|/8-byte elements with BZERO + BSCALE * raw scaling. 1-D and
  * 2-D arrays emit the long-form `(dim0[, dim1], value)` frame shared
  * by the chunked-array readers; NAXIS1 is the fastest-varying axis per
  * the standard.
  *
  * The data section is fixed-width, so row ranges split exactly across
  * executor tasks via positioned reads — the NetCDF3 distribution
  * shape; the driver reads only header blocks.
  */
object FitsReader {

  private case class Header(bitpix: Int, axes: Seq[Long], bzero: Double, bscale: Double, dataAt: Long)

  private def header(url: String, conf: Configuration): Header = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = fs.open(new Path(url))
    try {
      val cards = scala.collection.mutable.Map[String, String]()
      var block = 0
      var ended = false
      val buf = new Array[Byte](2880)
      while (!ended) {
        in.readFully(block.toLong * 2880, buf)
        var i = 0
        while (i < 36 && !ended) {
          val card = new String(buf, i * 80, 80, "ISO-8859-1")
          val key = card.substring(0, 8).trim
          if (key == "END") ended = true
          else if (card.length > 10 && card.charAt(8) == '=') {
            val value = card.substring(10).split("/")(0).trim
            cards(key) = value
          }
          i += 1
        }
        block += 1
      }
      require(cards.get("SIMPLE").exists(_.startsWith("T")), s"not a standard FITS file: $url")
      val bitpix = cards("BITPIX").toInt
      val naxis = cards("NAXIS").toInt
      require(naxis >= 1 && naxis <= 2, s"supported NAXIS: 1, 2; got $naxis")
      val axes = (1 to naxis).map(i => cards(s"NAXIS$i").toLong)
      Header(bitpix, axes,
        cards.get("BZERO").map(_.toDouble).getOrElse(0.0),
        cards.get("BSCALE").map(_.toDouble).getOrElse(1.0),
        block.toLong * 2880)
    } finally in.close()
  }

  def read(spark: SparkSession, url: String): DataFrame = {
    val h = header(url, spark.sparkContext.hadoopConfiguration)
    val esz = math.abs(h.bitpix) / 8
    // NAXIS1 varies fastest; for 2-D treat NAXIS2 as the outer (task-
    // split) axis, NAXIS1 as the inner
    val (outerN, innerN) = if (h.axes.length == 2) (h.axes(1), h.axes(0)) else (h.axes(0), 1L)
    val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (outerN * p / parts, outerN * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (bitpix, bzero, bscale, dataAt, twoD) = (h.bitpix, h.bzero, h.bscale, h.dataAt, h.axes.length == 2)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * innerN * esz).toInt)
      try in.readFully(dataAt + lo * innerN * esz, buf) finally in.close()
      val bb = ByteBuffer.wrap(buf) // FITS data is always big-endian
      val n = ((hi - lo) * innerN).toInt
      (0 until n).iterator.map { k =>
        val raw = bitpix match {
          case 8   => (buf(k) & 0xff).toDouble
          case 16  => bb.getShort(k * 2).toDouble
          case 32  => bb.getInt(k * 4).toDouble
          case 64  => bb.getLong(k * 8).toDouble
          case -32 => bb.getFloat(k * 4).toDouble
          case -64 => bb.getDouble(k * 8)
          case other => throw new UnsupportedOperationException(s"BITPIX $other")
        }
        val v = bzero + bscale * raw
        val outer = lo + k / innerN
        if (twoD) Row(outer, (k % innerN).toLong, v) else Row(outer, v)
      }
    }
    val schema =
      if (twoD) StructType(Seq(
        StructField("dim0", LongType, nullable = false),
        StructField("dim1", LongType, nullable = false),
        StructField("value", DoubleType, nullable = false)))
      else StructType(Seq(
        StructField("dim0", LongType, nullable = false),
        StructField("value", DoubleType, nullable = false)))
    spark.createDataFrame(rowsRdd, schema)
  }
}

class FitsReaderImpl extends Reader {
  val name = "fits_reader"
  val implementsKinds = Set("fits")
  def read(spark: SparkSession, ref: DataRef): DataFrame = FitsReader.read(spark, ref.url)
}
