package graft.output

import graft.datatypes.DataRef
import java.net.URI
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** NetCDF classic (CDF-1) writer — the mirror of
  * [[graft.readers.NetCDF3Reader]], closing the array round-trip the
  * reference covers with XarrayToNetCDF (reference
  * intake/readers/output.py:85). Input is the long-form layout every
  * chunked-array reader/writer here speaks: `(dim0[, dim1], value)`
  * rows; output is a classic-format file (big-endian, fixed dims, one
  * data variable) that any NetCDF stack opens.
  *
  * Scale shape: classic NetCDF is a SINGLE contiguous file with no
  * parallel-write story, so rows collect on the driver under an
  * explicit `maxCells` bound — it is a small-artifact export
  * (model grids, summaries); the scale sinks are parquet and the
  * executor-parallel Zarr writer. Absent cells take `fillValue`.
  */
object NetCDF3Writer {

  private def pad4(n: Int): Int = (n + 3) & ~3

  private def name(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val out = new Array[Byte](4 + pad4(b.length))
    val bb = ByteBuffer.wrap(out)
    bb.putInt(b.length)
    bb.put(b)
    out
  }

  /** Serialize a long-form frame as CDF-1 bytes. Exposed for specs. */
  def serialize(
      df: DataFrame,
      varName: String,
      shape: Seq[Int] = Nil,
      dtype: String = "double",
      fillValue: Double = 0.0,
      maxCells: Long = 50L * 1000 * 1000): Array[Byte] = {
    val cols = df.columns
    require(cols.length >= 2, s"expected (dim..., value) columns, got ${cols.mkString(",")}")
    val rank = cols.length - 1
    require(rank <= 2, s"supported ranks: 1, 2; got $rank")
    val dimNames = cols.take(rank)

    val (ncType, esz): (Int, Int) = dtype match {
      case "double" => (6, 8)
      case "float"  => (5, 4)
      case "int"    => (4, 4)
      case other    => throw new UnsupportedOperationException(s"netcdf3 dtype $other (double/float/int)")
    }

    // CDF-1 is a single in-memory artifact: the whole file is built in
    // one byte array, so cells are double-bounded by maxCells AND the
    // 2 GiB JVM array limit (header offsets are also 4-byte in CDF-1).
    val headerRoom = 4096L
    val cellCap = math.min(maxCells, (Int.MaxValue.toLong - headerRoom) / esz)
    if (shape.nonEmpty) {
      val n = shape.map(_.toLong).product
      require(n <= cellCap,
        s"netcdf classic is a small-artifact sink; $n cells exceeds bound $cellCap — write zarr/parquet instead")
    }
    // One row per cell in a well-formed long-form frame, so the cell cap
    // also bounds the row count. limit() enforces it BEFORE the driver
    // materializes anything — a billion-row frame fails cleanly instead
    // of OOMing the collect (mirrors Hdf5Writer's limit(capped + 1)).
    val rowCap = cellCap.min(Int.MaxValue - 8L).toInt
    val rows = df.limit(rowCap + 1).collect()
    require(rows.length <= rowCap,
      s"netcdf classic is a small-artifact sink; frame exceeds $rowCap rows — write zarr/parquet instead")

    // Dim columns are accepted as any integral type (the documented
    // contract says "integer dims", not LongType specifically).
    def dim(r: org.apache.spark.sql.Row, d: Int): Long = {
      val n = r.getAs[Number](d)
      require(n != null, s"null in dim column ${dimNames(d)}")
      n.longValue()
    }
    val actualShape: Seq[Int] =
      if (shape.nonEmpty) shape
      else (0 until rank).map(d => rows.iterator.map(dim(_, d)).foldLeft(-1L)(math.max).toInt + 1)
    require(actualShape.forall(_ > 0), s"empty or unknown shape $actualShape — pass shape explicitly")
    val nCells = actualShape.map(_.toLong).product
    require(nCells <= cellCap,
      s"netcdf classic is a small-artifact sink; $nCells cells exceeds bound $cellCap — write zarr/parquet instead")

    // header: magic, numrecs, dim list, global atts (ABSENT), var list
    val header = new java.io.ByteArrayOutputStream()
    header.write(Array[Byte]('C', 'D', 'F', 1))
    header.write(be32(0)) // numrecs
    header.write(be32(0x0A)); header.write(be32(rank)) // NC_DIMENSION
    dimNames.zip(actualShape).foreach { case (dn, len) =>
      header.write(name(dn)); header.write(be32(len))
    }
    header.write(be32(0)); header.write(be32(0)) // global atts ABSENT
    header.write(be32(0x0B)); header.write(be32(1)) // NC_VARIABLE, 1 var
    val varHead = new java.io.ByteArrayOutputStream()
    varHead.write(name(varName))
    varHead.write(be32(rank))
    (0 until rank).foreach(d => varHead.write(be32(d)))
    varHead.write(be32(0)); varHead.write(be32(0)) // var atts ABSENT
    varHead.write(be32(ncType))
    val vsize = pad4((nCells * esz).toInt)
    varHead.write(be32(vsize))
    // begin (4 bytes in CDF-1) = header length; compute with the field
    // itself included
    val begin = header.size() + varHead.size() + 4
    header.write(varHead.toByteArray)
    header.write(be32(begin))

    // data: row-major cells, fill first, then scatter the present rows.
    // A row whose dim indices fall outside an explicitly-passed shape is
    // a contract violation, not data to silently drop — fail with the
    // count so the caller can widen the shape or filter first.
    val cells = new Array[Double](nCells.toInt)
    java.util.Arrays.fill(cells, fillValue)
    val innerLen = if (rank == 2) actualShape(1).toLong else 1L
    var outOfShape = 0L
    rows.foreach { r =>
      val inBounds = (0 until rank).forall(d => dim(r, d) >= 0 && dim(r, d) < actualShape(d))
      if (!inBounds) outOfShape += 1
      else {
        val flat =
          if (rank == 1) dim(r, 0)
          else dim(r, 0) * innerLen + dim(r, 1)
        cells(flat.toInt) = r.get(rank) match {
          case n: java.lang.Number => n.doubleValue()
          case null => fillValue
        }
      }
    }
    require(outOfShape == 0L,
      s"$outOfShape rows fall outside shape ${actualShape.mkString("x")} — widen shape or filter the frame first")
    val data = ByteBuffer.allocate(vsize) // big-endian by default
    ncType match {
      case 6 => cells.foreach(data.putDouble)
      case 5 => cells.foreach(v => data.putFloat(v.toFloat))
      case 4 => cells.foreach(v => data.putInt(v.toInt))
    }
    header.write(data.array())
    header.toByteArray
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def write(
      df: DataFrame,
      url: String,
      varName: String = "data",
      shape: Seq[Int] = Nil,
      dtype: String = "double",
      fillValue: Double = 0.0): DataRef = {
    val bytes = serialize(df, varName, shape, dtype, fillValue)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val os = fs.create(new Path(url), true)
    try os.write(bytes) finally os.close()
    DataRef("netcdf3", url, Map("variable" -> varName))
  }
}
