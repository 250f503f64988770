package graft.readers

import graft.datatypes.DataRef
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Minimal native Excel reader: an .xlsx file is a zip holding sheet XML
  * plus a shared-string table (ECMA-376 / OOXML spec). This parses the
  * first worksheet with the JVM's zip support and scala-xml — no POI —
  * covering the tabular core (shared/inline strings, numbers, booleans,
  * header row, sparse cells). Legacy `.xls` (BIFF8) payloads are
  * detected by their CFB magic and routed to [[BiffReader]]. Files are
  * distributed as binary blobs and parsed on the executors (reference
  * delegates to pandas/openpyxl and xlrd, reference
  * intake/readers/readers.py:319 PandasExcel).
  */
object ExcelReader {

  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory && (e.getName.startsWith("xl/worksheets/") || e.getName == "xl/sharedStrings.xml"))
        out(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.toMap
  }

  /** "BC" in "BC12" → 0-based column index. */
  private[readers] def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1

  /** Parse one Excel payload to (rows of cells by position) — OOXML
    * zips here, legacy CFB (.xls BIFF8) through [[BiffReader]]. */
  private[readers] def parse(bytes: Array[Byte]): Seq[Seq[String]] = {
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf)
      return BiffReader.parse(bytes)
    val entries = zipEntries(bytes)
    // .xlsb (Excel binary OOXML) is a zip like .xlsx but with BIFF12
    // `.bin` parts — neither the XML path nor BiffReader reads those;
    // refuse explicitly instead of failing with "no worksheet in xlsx"
    require(!entries.keys.exists(_.endsWith(".bin")),
      "xlsb (Excel binary OOXML) outside the supported profile (xlsx XML and xls BIFF8 only)")
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml") match {
      case Some(b) =>
        val xml = scala.xml.XML.load(new ByteArrayInputStream(b))
        (xml \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq
      case None => IndexedSeq.empty
    }
    val sheetName = entries.keys.filter(_.startsWith("xl/worksheets/sheet")).toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException("no worksheet in xlsx"))
    val sheet = scala.xml.XML.load(new ByteArrayInputStream(entries(sheetName)))
    (sheet \\ "row").map { row =>
      val cells = (row \ "c").map { c =>
        val ref = (c \ "@r").text
        val t = (c \ "@t").text
        val v = (c \ "v").map(_.text).headOption.getOrElse((c \\ "t").map(_.text).mkString)
        val value = t match {
          case "s"                => shared.lift(v.trim.toInt).getOrElse("")
          case "b"                => if (v.trim == "1") "true" else "false"
          case "inlineStr" | "str" => v
          case _                  => v
        }
        (if (ref.nonEmpty) colIndex(ref) else -1) -> value
      }
      val width = cells.map(_._1).maxOption.getOrElse(-1) + 1
      val arr = Array.fill(width)("")
      cells.zipWithIndex.foreach { case ((i, v), pos) => arr(if (i >= 0) i else pos) = v }
      arr.toSeq
    }
  }

  /** Read one or many .xlsx files into a DataFrame. Header row (default
    * on) names the columns; columns whose every data cell parses as a
    * number become DoubleType.
    */
  def read(spark: SparkSession, pathOrGlob: String, header: Boolean = true): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xls*")
      .load(pathOrGlob)
      .select("content")
    val first = files.limit(1).collect()
    require(first.nonEmpty, s"no xlsx/xls files at $pathOrGlob")
    val sample = parse(first.head.getAs[Array[Byte]](0))
    require(sample.nonEmpty, "empty worksheet")
    val width = sample.map(_.length).max
    val names =
      if (header) sample.head.padTo(width, "").zipWithIndex.map { case (n, i) => if (n.nonEmpty) n else s"_c$i" }
      else (0 until width).map(i => s"_c$i")
    val dataSample = if (header) sample.tail else sample
    def numeric(s: String): Boolean = s.isEmpty || s.trim.toDoubleOption.isDefined
    val types = (0 until width).map { i =>
      val col = dataSample.map(_.padTo(width, "")(i))
      if (col.nonEmpty && col.exists(_.nonEmpty) && col.forall(numeric)) DoubleType else StringType
    }
    val schema = StructType(names.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
    val hdr = header
    val w = width
    val tpes = types
    val rowsRdd = files.rdd.flatMap { r =>
      val rows = parse(r.getAs[Array[Byte]](0))
      val data = if (hdr) rows.drop(1) else rows
      data.map { cells =>
        val padded = cells.padTo(w, "")
        Row.fromSeq(padded.zip(tpes).map {
          // types are inferred from the FIRST file only; a non-numeric cell
          // in another file of the glob must null out, not kill the task
          case (v, DoubleType) => if (v.trim.isEmpty) null else v.trim.toDoubleOption.orNull
          case (v, _)          => v
        })
      }
    }
    spark.createDataFrame(rowsRdd, schema)
  }
}

/** Registry wrapper: routes the `excel` datatype. */
class ExcelReaderImpl extends Reader {
  val name = "excel_reader"
  val implementsKinds = Set("excel")
  def read(spark: SparkSession, ref: DataRef): DataFrame =
    ExcelReader.read(spark, ref.url, header = ref.options.getOrElse("header", "true").toBoolean)
}
