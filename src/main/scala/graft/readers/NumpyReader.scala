package graft.readers

import graft.datatypes.DataRef
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native NPY/NPZ reader (NumPy binary format spec v1/v2, public
  * numpy.lib.format documentation): magic \x93NUMPY, version, header
  * length, Python-dict header with descr/fortran_order/shape, then raw
  * C-order data. 1-D arrays become (idx, value) rows; 2-D arrays become
  * (idx, values array) rows. NPZ is a zip of .npy members, each becoming
  * its own (name-prefixed) arrays. Files decode on the executors via a
  * binaryFile scan (reference NumpyReader readers.py:1323, NPZReader
  * :3169 — there via numpy itself).
  */
object NumpyReader {

  private[readers] case class Header(dtype: String, fortran: Boolean, shape: Seq[Int], dataOffset: Int)

  private[readers] def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length > 10 && (bytes(0) & 0xff) == 0x93 &&
      new String(bytes, 1, 5, "ISO-8859-1") == "NUMPY", "not NPY")
    val major = bytes(6)
    val (headerLen, headerStart) =
      if (major == 1) ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8), 10)
      else (ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt, 12)
    val header = new String(bytes, headerStart, headerLen, "ISO-8859-1")
    val dtype = "'descr'\\s*:\\s*'([^']+)'".r.findFirstMatchIn(header).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("npy: no descr"))
    val fortran = "'fortran_order'\\s*:\\s*(True|False)".r.findFirstMatchIn(header).exists(_.group(1) == "True")
    val shape = "'shape'\\s*:\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    Header(dtype, fortran, shape, headerStart + headerLen)
  }

  private[readers] def values(bytes: Array[Byte], h: Header): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes, h.dataOffset, bytes.length - h.dataOffset).order(
      if (h.dtype.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    val n = h.shape.product
    h.dtype.stripPrefix("<").stripPrefix(">").stripPrefix("=") match {
      case "f8" => Array.tabulate(n)(_ => bb.getDouble)
      case "f4" => Array.tabulate(n)(_ => bb.getFloat.toDouble)
      case "i8" => Array.tabulate(n)(_ => bb.getLong.toDouble)
      case "i4" => Array.tabulate(n)(_ => bb.getInt.toDouble)
      case "i2" => Array.tabulate(n)(_ => bb.getShort.toDouble)
      case "b1" | "i1" => Array.tabulate(n)(_ => bb.get.toDouble)
      case other => throw new UnsupportedOperationException(s"npy dtype $other")
    }
  }

  /** Decode one .npy payload to rows: 1-D → (idx, value); 2-D → row-major
    * (idx, array of row values), transposing Fortran-order data.
    */
  private[readers] def npyRows(bytes: Array[Byte]): (Int, Iterator[Row]) = {
    val h = parseHeader(bytes)
    require(h.shape.nonEmpty && h.shape.length <= 2, s"supported ranks 1-2, got ${h.shape}")
    val vals = values(bytes, h)
    if (h.shape.length == 1)
      (1, vals.iterator.zipWithIndex.map { case (v, i) => Row(i.toLong, v) })
    else {
      val (rows, cols) = (h.shape(0), h.shape(1))
      val get: (Int, Int) => Double =
        if (h.fortran) (i, j) => vals(j * rows + i) else (i, j) => vals(i * cols + j)
      (2, (0 until rows).iterator.map(i => Row(i.toLong, (0 until cols).map(j => get(i, j)))))
    }
  }

  def read(spark: SparkSession, pathOrGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npy")
      .load(pathOrGlob)
      .select("content")
    val first = files.limit(1).collect()
    require(first.nonEmpty, s"no npy files at $pathOrGlob")
    val rank = parseHeader(first.head.getAs[Array[Byte]](0)).shape.length
    val schema =
      if (rank == 1) StructType(Seq(StructField("idx", LongType), StructField("value", DoubleType)))
      else StructType(Seq(StructField("idx", LongType), StructField("values", ArrayType(DoubleType))))
    val rdd = files.rdd.flatMap(r => npyRows(r.getAs[Array[Byte]](0))._2)
    spark.createDataFrame(rdd, schema)
  }

  /** Raw C/FORTRAN array buffer without metadata (reference
    * datatypes.py RawBuffer `.raw` / readers.py RawBufferToNumpy
    * `np.fromfile(url, dtype)`): a flat typed buffer whose dtype the
    * CALLER supplies — the file carries none, so there is nothing to
    * infer. Decodes executor-side via binaryFile into the long
    * (path, idx, value) form the NPY reader uses. */
  def readRaw(spark: SparkSession, pathOrGlob: String, dtype: String): DataFrame = {
    val width = dtype.stripPrefix("<").stripPrefix(">").stripPrefix("=") match {
      case "f8" | "i8" => 8
      case "f4" | "i4" => 4
      case "i2"        => 2
      case "b1" | "i1" => 1
      case other => throw new UnsupportedOperationException(s"raw buffer dtype $other")
    }
    val files = spark.read.format("binaryFile").load(pathOrGlob).select("path", "content")
    val schema = StructType(Seq(StructField("path", StringType),
      StructField("idx", LongType), StructField("value", DoubleType)))
    val dt = dtype
    val rdd = files.rdd.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](1)
      require(bytes.length % width == 0,
        s"raw buffer ${r.getString(0)}: ${bytes.length} bytes is not a multiple of $dt width $width")
      val h = Header(dt, fortran = false, Seq(bytes.length / width), 0)
      values(bytes, h).iterator.zipWithIndex.map { case (v, i) => Row(r.getString(0), i.toLong, v) }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** NPZ: zip of named .npy members → (member, idx, value/values). */
  def readNpz(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npz")
      .load(path)
      .select("content")
    val schema = StructType(Seq(
      StructField("member", StringType),
      StructField("idx", LongType),
      StructField("values", ArrayType(DoubleType))))
    val rdd = files.rdd.flatMap { r =>
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0)))
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).flatMap { e =>
        val name = e.getName.stripSuffix(".npy")
        val bytes = zin.readAllBytes()
        val (rank, rows) = npyRows(bytes)
        rows.map { row =>
          val vals = if (rank == 1) Seq(row.getDouble(1)) else row.getSeq[Double](1)
          Row(name, row.getLong(0), vals)
        }
      }.toList
    }
    spark.createDataFrame(rdd, schema)
  }
}

class NumpyReaderImpl extends Reader {
  val name = "numpy_reader"
  val implementsKinds = Set("numpy", "npz")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    if (ref.url.endsWith(".npz")) NumpyReader.readNpz(spark, ref.url)
    else NumpyReader.read(spark, ref.url)
}

class RawBufferReaderImpl extends Reader {
  val name = "raw_buffer_reader"
  val implementsKinds = Set("raw_buffer")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    NumpyReader.readRaw(spark, ref.url, ref.options.getOrElse("dtype",
      throw new IllegalArgumentException(
        "raw_buffer needs a dtype option (f8/f4/i8/i4/i2/i1 [+ </> endian prefix]) — " +
          "the file carries no metadata, matching the reference RawBuffer's required dtype")))
}
