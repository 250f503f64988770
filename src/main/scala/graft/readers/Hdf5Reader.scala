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

  def datasets(url: String, conf: Configuration = graft.core.SerializableHadoopConf.sessionConf(), maxMetaBytes: Int = 64 << 20): Seq[Hdf5Inspect.DatasetInfo] = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val len = fs.getFileStatus(new Path(url)).getLen
    require(len <= maxMetaBytes, s"hdf5 metadata walk capped at $maxMetaBytes bytes, file is $len")
    val in = fs.open(new Path(url))
    val bytes = try in.readAllBytes() finally in.close()
    Hdf5Inspect.datasets(bytes)
  }

  private def decodeValue(bb: ByteBuffer, buf: Array[Byte], k: Int, cls: String, esz: Int): Double =
    (cls, esz) match {
      case ("float", 8) => bb.getDouble(k * 8)
      case ("float", 4) => bb.getFloat(k * 4).toDouble
      case ("fixed", 8) => bb.getLong(k * 8).toDouble
      case ("fixed", 4) => bb.getInt(k * 4).toDouble
      case ("fixed", 2) => bb.getShort(k * 2).toDouble
      case ("fixed", 1) => buf(k).toDouble
      case other        => throw new UnsupportedOperationException(s"hdf5 type $other")
    }

  private def schemaFor(twoD: Boolean): StructType =
    if (twoD) StructType(Seq(
      StructField("dim0", LongType, nullable = false),
      StructField("dim1", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    else StructType(Seq(
      StructField("dim0", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false)))

  /** Chunked datasets: the driver's capped metadata read also walks the
    * chunk b-tree (index entries only); executors fetch + inflate their
    * own chunks — the Zarr distribution shape.
    */
  private def readChunked(spark: SparkSession, url: String, d: Hdf5Inspect.DatasetInfo): DataFrame = {
    val fs = FileSystem.get(new URI(url).resolve("/"), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(url))
    val bytes = try in.readAllBytes() finally in.close()
    val chunks = d.indexKind match {
      case "btree1" => Hdf5Inspect.chunkIndex(bytes, d.chunkBtree, d.dims.length)
      case kind => Hdf5Inspect.modernChunks(bytes, kind, d.chunkBtree, d.dims, d.chunkDims, d.dtypeSize)
    }
    // vet the pipeline on the driver: unknown filters refuse up front,
    // never decode garbage (1=deflate, 2=shuffle — the h5py defaults)
    d.filters.foreach(id => require(id == 1 || id == 2,
      s"hdf5 filter id $id outside the supported profile (deflate=1, shuffle=2)"))
    val (cls, esz, le, filters, cdims, dims, twoD) =
      (d.dtypeClass, d.dtypeSize, d.littleEndian, d.filters, d.chunkDims, d.dims, d.dims.length == 2)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext
      .parallelize(chunks, math.max(1, math.min(chunks.size, spark.sparkContext.defaultParallelism)))
      .flatMap { case (coords, addr, storedSize) =>
        val fsEx = FileSystem.get(new URI(url).resolve("/"), sconf.value)
        val inEx = fsEx.open(new Path(url))
        val stored = new Array[Byte](storedSize)
        try inEx.readFully(addr, stored) finally inEx.close()
        // invert the filter pipeline in reverse application order
        // (write order shuffle→deflate ⇒ read order inflate→unshuffle)
        val raw = filters.reverse.foldLeft(stored) {
          case (b, 1) =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(b)
            val out = new java.io.ByteArrayOutputStream()
            val b2 = new Array[Byte](8192)
            while (!inf.finished()) {
              val n = inf.inflate(b2)
              if (n == 0 && inf.needsInput()) throw new IllegalStateException("truncated hdf5 chunk")
              out.write(b2, 0, n)
            }
            inf.end(); out.toByteArray
          case (b, 2) => // byte unshuffle: planes-of-bytes → interleaved
            val n = b.length / esz
            val out = new Array[Byte](b.length)
            var i = 0
            while (i < n) {
              var bix = 0
              while (bix < esz) { out(i * esz + bix) = b(bix * n + i); bix += 1 }
              i += 1
            }
            // trailing bytes (length not a multiple of typesize) copy as-is
            System.arraycopy(b, n * esz, out, n * esz, b.length - n * esz)
            out
          case (b, other) => throw new IllegalStateException(s"hdf5 filter $other") // vetted above
        }
        val bb = ByteBuffer.wrap(raw).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        val n = raw.length / esz
        val cw = if (twoD) cdims(1).toLong else 1L
        (0 until n).iterator.flatMap { k =>
          val v = decodeValue(bb, raw, k, cls, esz)
          if (twoD) {
            val i = coords(0) + k / cw
            val j = coords(1) + k % cw
            if (i < dims(0) && j < dims(1)) Some(Row(i, j, v)) else None // edge-chunk trim
          } else {
            val i = coords(0) + k
            if (i < dims(0)) Some(Row(i, v)) else None
          }
        }
      }
    spark.createDataFrame(rowsRdd, schemaFor(twoD))
  }

  def read(spark: SparkSession, url: String, dataset: Option[String] = None): DataFrame = {
    val all = datasets(url, spark.sparkContext.hadoopConfiguration)
    require(all.nonEmpty, s"no readable numeric datasets in $url")
    val d = dataset.map(p => all.find(_.path == p).getOrElse(
        throw new NoSuchElementException(s"dataset $p not in ${all.map(_.path).mkString(", ")}")))
      .getOrElse(all.head)
    require(d.dims.nonEmpty && d.dims.length <= 2, s"supported ranks 1-2, got ${d.dims.length}")
    require(Seq("float", "fixed").contains(d.dtypeClass) && Seq(1, 2, 4, 8).contains(d.dtypeSize),
      s"unsupported dataset type ${d.dtypeClass}${d.dtypeSize * 8}")
    if (d.isChunked) return readChunked(spark, url, d)

    val (outerN, innerN) = if (d.dims.length == 2) (d.dims(0), d.dims(1)) else (d.dims(0), 1L)
    val parts = math.max(1, math.min(outerN, spark.sparkContext.defaultParallelism.toLong)).toInt
    val ranges = (0 until parts).map { p =>
      (outerN * p / parts, outerN * (p + 1) / parts)
    }.filter { case (lo, hi) => hi > lo }

    val (cls, esz, le, dataAddr, twoD) = (d.dtypeClass, d.dtypeSize, d.littleEndian, d.dataAddr, d.dims.length == 2)
    val sconf = graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val rowsRdd = spark.sparkContext.parallelize(ranges, math.max(1, ranges.size)).flatMap { case (lo, hi) =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val in = fs.open(new Path(url))
      val buf = new Array[Byte](((hi - lo) * innerN * esz).toInt)
      try in.readFully(dataAddr + lo * innerN * esz, buf) finally in.close()
      val bb = ByteBuffer.wrap(buf).order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val n = ((hi - lo) * innerN).toInt
      (0 until n).iterator.map { k =>
        val v = decodeValue(bb, buf, k, cls, esz)
        val outer = lo + k / innerN
        if (twoD) Row(outer, (k % innerN).toLong, v) else Row(outer, v)
      }
    }
    spark.createDataFrame(rowsRdd, schemaFor(twoD))
  }
}

class Hdf5ReaderImpl extends Reader {
  val name = "hdf5_reader"
  val implementsKinds = Set("hdf5")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    Hdf5Reader.read(spark, ref.url, ref.options.get("dataset"))
}
