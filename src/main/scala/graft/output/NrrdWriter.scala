package graft.output

import java.net.URI

import graft.datatypes.DataRef
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NRRD sink (reference intake/readers/output.py:414 SimpleITKToNRRD,
  * there via SimpleITK.WriteImage): the long-form array frame
  * (`dim0..dimN, value`) every array reader here emits, written back as
  * NRRD0004 raw little-endian doubles — first axis fastest, exactly the
  * layout [[graft.readers.NrrdReader]] reads, so the sink round-trips
  * through the repo's own reader.
  *
  * Same boundedness contract as the NetCDF3/HDF5 sinks: NRRD is a
  * small-artifact format (one header + one raw blob, no chunking), so
  * this is a documented driver-side single-file writer with a hard cell
  * cap — past it, write zarr.
  */
object NrrdWriter {

  def write(df: DataFrame, url: String, cellCap: Long = 50L * 1000 * 1000): DataRef = {
    val cols = df.columns
    require(cols.length >= 2 && cols.last == "value" && cols.dropRight(1).forall(_.startsWith("dim")),
      s"expected long-form (dim0..dimN, value) columns, got ${cols.mkString(",")}")
    val dims = cols.dropRight(1)
    val rowCap = cellCap.min(Int.MaxValue - 8L).toInt
    val rows = df.select((dims.map(c => col(c).cast("long")) :+ col("value").cast("double")): _*)
      .limit(rowCap + 1).collect()
    require(rows.length <= rowCap,
      s"nrrd is a small-artifact sink; frame exceeds $rowCap cells — write zarr/parquet instead")
    require(rows.nonEmpty, "empty frame")
    val sizes = dims.indices.map(d => rows.iterator.map(_.getLong(d)).max + 1)
    val n = sizes.product
    require(n <= rowCap, s"dense shape ${sizes.mkString("x")} exceeds the $rowCap-cell cap")
    // dense buffer, first axis fastest (the NrrdReader unflatten order)
    val data = new Array[Double](n.toInt)
    rows.foreach { r =>
      var flat = 0L
      var mult = 1L
      dims.indices.foreach { d => flat += r.getLong(d) * mult; mult *= sizes(d) }
      data(flat.toInt) = r.getDouble(dims.length)
    }
    val header =
      s"""NRRD0004
         |# written by graft NrrdWriter
         |type: double
         |dimension: ${sizes.length}
         |sizes: ${sizes.mkString(" ")}
         |encoding: raw
         |endian: little
         |
         |""".stripMargin
    val bb = java.nio.ByteBuffer.allocate(data.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    data.foreach(bb.putDouble)
    val fs = FileSystem.get(new URI(url).resolve("/"), df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(url), true)
    try { out.write(header.getBytes("ISO-8859-1")); out.write(bb.array()) } finally out.close()
    DataRef("nrrd", url, metadata = Map("sizes" -> sizes.mkString("x")))
  }
}
