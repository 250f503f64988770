package graft.readers

import graft.datatypes.DataRef
import graft.inspect.Hdf5Inspect
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** HDF5 dataset reader for CONTIGUOUS-layout numeric datasets, built on
  * [[Hdf5Inspect]]'s object-header walk (reference readers.py:1340
  * XArrayDatasetReader h5netcdf engine; datatypes.py:426). The metadata
  * walk runs on the driver over a size-capped read (HDF5 metadata is
  * interleaved through the file, so a structural walk needs the file
  * body — the cap keeps the driver safe and suits the many-files
  * world); the DATA then decodes on executors with positioned reads
  * over exact row ranges of the contiguous block, so large datasets
  * never sit on the driver. Chunked-layout datasets are listed by
  * `Hdf5Inspect.listing` but not readable here — the honest boundary,
  * stated loudly.
  */
object Hdf5Reader {

  def datasets(url: String, conf: Configuration = new Configuration(), maxMetaBytes: Int = 64 << 20): Seq[Hdf5Inspect.DatasetInfo] = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val len = fs.getFileStatus(new Path(url)).getLen
    require(len <= maxMetaBytes, s"hdf5 metadata walk capped at $maxMetaBytes bytes, file is $len")
    val in = fs.open(new Path(url))
    val bytes = try in.readAllBytes() finally in.close()
    Hdf5Inspect.datasets(bytes)
  }

  def read(spark: SparkSession, url: String, dataset: Option[String] = None): DataFrame = {
    val all = datasets(url, spark.sparkContext.hadoopConfiguration)
    require(all.nonEmpty, s"no contiguous-layout numeric datasets in $url (chunked layouts unsupported)")
    val d = dataset.map(p => all.find(_.path == p).getOrElse(
        throw new NoSuchElementException(s"dataset $p not in ${all.map(_.path).mkString(", ")}")))
      .getOrElse(all.head)
    require(d.dims.nonEmpty && d.dims.length <= 2, s"supported ranks 1-2, got ${d.dims.length}")
    require(Seq("float", "fixed").contains(d.dtypeClass) && Seq(1, 2, 4, 8).contains(d.dtypeSize),
      s"unsupported dataset type ${d.dtypeClass}${d.dtypeSize * 8}")

    val (outerN, innerN) = if (d.dims.length == 2) (d.dims(0), d.dims(1)) else (d.dims(0), 1L)
    val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (outerN * p / parts, outerN * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (cls, esz, le, dataAddr, twoD) = (d.dtypeClass, d.dtypeSize, d.littleEndian, d.dataAddr, d.dims.length == 2)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), new Configuration())
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * innerN * esz).toInt)
      try in.readFully(dataAddr + lo * innerN * esz, buf) finally in.close()
      val bb = ByteBuffer.wrap(buf).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val n = ((hi - lo) * innerN).toInt
      (0 until n).iterator.map { k =>
        val v = (cls, esz) match {
          case ("float", 8) => bb.getDouble(k * 8)
          case ("float", 4) => bb.getFloat(k * 4).toDouble
          case ("fixed", 8) => bb.getLong(k * 8).toDouble
          case ("fixed", 4) => bb.getInt(k * 4).toDouble
          case ("fixed", 2) => bb.getShort(k * 2).toDouble
          case ("fixed", 1) => buf(k).toDouble
          case other        => throw new UnsupportedOperationException(s"hdf5 type $other")
        }
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

class Hdf5ReaderImpl extends Reader {
  val name = "hdf5_reader"
  val implementsKinds = Set("hdf5")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    Hdf5Reader.read(spark, ref.url, ref.options.get("dataset"))
}
