package graft.output

import graft.datatypes.DataRef
import java.net.URI
import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NPY v1 writer (reference output.py:117 NumpyToNumpyFile): the inverse
  * of [[graft.readers.NumpyReader]]. Accepts the reader's long-form
  * shapes — `(idx, value)` for 1-D, `(idx, array<double>)` row-major for
  * 2-D — and writes one `.npy` object, C-order little-endian.
  *
  * A single .npy is one sequential stream, so the write is one task
  * (off the driver); shard large arrays into multiple files upstream if
  * parallel writes matter.
  */
object NumpyWriter {

  private def header(shape: Seq[Long], dtype: String): Array[Byte] = {
    val shapeTxt = if (shape.length == 1) s"(${shape.head},)" else s"(${shape.mkString(", ")})"
    val dict = s"{'descr': '$dtype', 'fortran_order': False, 'shape': $shapeTxt, }"
    val pad = 64 - ((10 + dict.length + 1) % 64)
    val h = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(10 + h.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1")).put(1.toByte).put(0.toByte)
    out.putShort(h.length.toShort)
    out.put(h.getBytes("ISO-8859-1"))
    out.array()
  }

  def write(df: DataFrame, url: String, dtype: String = "<f8"): DataRef = {
    require(dtype == "<f8" || dtype == "<i4", s"supported dtypes: <f8, <i4 (got $dtype)")
    val cols = df.columns
    require(cols.length == 2, s"expected (idx, value|array) columns, got ${cols.mkString(",")}")
    val is2d = df.schema(cols(1)).dataType.isInstanceOf[ArrayType]
    val n = df.count()
    // null value rows would NPE mid-write AFTER the file is created —
    // reject them up front with the shape checks
    require(df.filter(col(cols(1)).isNull).limit(1).count() == 0,
      s"null rows in value column '${cols(1)}' — NPY cells cannot be null")
    val inner: Long =
      if (!is2d) 1L
      else if (n == 0) 0L
      else {
        // NPY is rectangular: reject ragged input up front instead of
        // writing a header whose shape disagrees with the payload
        val mm = df.agg(min(size(col(cols(1)))), max(size(col(cols(1))))).head()
        val (lo, hi) = (mm.getInt(0), mm.getInt(1))
        require(lo == hi, s"ragged array column: row lengths range $lo..$hi — NPY requires a rectangular shape")
        hi.toLong
      }
    val shape = if (is2d) Seq(n, inner) else Seq(n)
    val hdr = header(shape, dtype)

    val sconf = graft.core.SerializableHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    val ordered =
      if (is2d) df.select(col(cols(0)).cast("long"), col(cols(1)).cast("array<double>"))
      else df.select(col(cols(0)).cast("long"), col(cols(1)).cast("double"))
    ordered.orderBy(cols(0)).coalesce(1).rdd.foreachPartition { it =>
      val fs = FileSystem.get(new URI(url).resolve("/"), sconf.value)
      val out = fs.create(new Path(url), true)
      try {
        out.write(hdr)
        val buf = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        def flushIfFull(need: Int): Unit =
          if (buf.position() + need > buf.capacity()) { out.write(buf.array(), 0, buf.position()); buf.clear() }
        def putVal(v: Double): Unit = {
          if (dtype == "<f8") { flushIfFull(8); buf.putDouble(v) }
          else { flushIfFull(4); buf.putInt(v.toInt) }
        }
        it.foreach { r =>
          if (is2d) r.getSeq[Double](1).foreach(putVal) else putVal(r.getDouble(1))
        }
        out.write(buf.array(), 0, buf.position())
      } finally out.close()
    }
    DataRef("numpy", url, Map("dtype" -> dtype, "shape" -> shape.mkString("x")))
  }
}
