package graft.readers

import graft.datatypes.DataRef
import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** MatrixMarket reader (published NIST format; reference datatypes.py:515
  * MatrixMarket, read via `scipy.io.mmread`): sparse `coordinate` and
  * dense `array` layouts, `real`/`integer`/`pattern` fields,
  * `general`/`symmetric` symmetry — to the long-form `(row, col, value)`
  * frame every array reader here emits.
  *
  * The driver reads only the two header lines; data lines parse
  * distributed (`textFile` + zipWithIndex to drop the size line, which
  * can be token-identical to a data line).
  */
object MatrixMarketReader {

  private case class Header(coordinate: Boolean, field: String, symmetric: Boolean, rows: Long, cols: Long)

  private def header(url: String, conf: Configuration): Header = {
    val fs = FileSystem.get(new URI(url).resolve("/"), conf)
    val in = new BufferedReader(new InputStreamReader(fs.open(new Path(url)), "UTF-8"))
    try {
      val banner = in.readLine()
      require(banner != null && banner.startsWith("%%MatrixMarket"), s"not MatrixMarket: $url")
      val toks = banner.trim.split("\\s+")
      require(toks.length >= 5 && toks(1) == "matrix", s"unsupported MatrixMarket object in: $banner")
      val coordinate = toks(2) == "coordinate"
      val field = toks(3)
      require(Seq("real", "integer", "pattern", "double").contains(field), s"unsupported field $field")
      val symmetric = toks(4) == "symmetric"
      var size = in.readLine()
      while (size != null && (size.startsWith("%") || size.trim.isEmpty)) size = in.readLine()
      val dims = size.trim.split("\\s+")
      Header(coordinate, field, symmetric, dims(0).toLong, dims(1).toLong)
    } finally in.close()
  }

  val schema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  def read(spark: SparkSession, url: String): DataFrame = {
    val h = header(url, spark.sparkContext.hadoopConfiguration)
    val data = spark.sparkContext.textFile(url)
      .filter(l => !l.startsWith("%") && l.trim.nonEmpty)
      .zipWithIndex()
      .filter(_._2 > 0) // drop the size line
      .map(_._1)
    val rowsN = h.rows
    val pattern = h.field == "pattern"
    val symmetric = h.symmetric
    // symmetric dense files store a triangle with per-column heights —
    // not worth the index gymnastics for a layout scipy itself rarely
    // sees; symmetric+coordinate (the common case) is fully supported
    require(h.coordinate || !h.symmetric, "symmetric dense array layout unsupported")
    val rdd =
      if (h.coordinate) data.flatMap { l =>
        val t = l.trim.split("\\s+")
        val (i, j) = (t(0).toLong - 1, t(1).toLong - 1)
        val v = if (pattern) 1.0 else t(2).toDouble
        if (symmetric && i != j) Seq(Row(i, j, v), Row(j, i, v)) else Seq(Row(i, j, v))
      }
      else data.zipWithIndex().map { case (l, k) =>
        // dense array: one value per line, column-major over (rows, cols)
        Row(k % rowsN, k / rowsN, l.trim.toDouble)
      }
    spark.createDataFrame(rdd, schema)
  }
}

class MatrixMarketReaderImpl extends Reader {
  val name = "matrixmarket_reader"
  val implementsKinds = Set("matrixmarket")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    MatrixMarketReader.read(spark, ref.url)
}
