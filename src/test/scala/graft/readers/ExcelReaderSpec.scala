package graft.readers

import graft.SparkSpec
import graft.pipeline.Pipeline
import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class ExcelReaderSpec extends SparkSpec {

  /** Hand-built minimal OOXML workbook: shared strings + one sheet. */
  private def writeXlsx(path: String): Unit = {
    val shared =
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>name</t></si><si><t>score</t></si><si><t>ada</t></si><si><t>grace</t></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>9.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>12</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin
    val zout = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    put("xl/sharedStrings.xml", shared)
    put("xl/worksheets/sheet1.xml", sheet)
    zout.close()
  }

  test("xlsx reads with header, shared strings, and numeric inference") {
    import spark.implicits._
    val dir = Files.createTempDirectory("xlsx").toString
    writeXlsx(s"$dir/t.xlsx")
    val df = ExcelReader.read(spark, s"file://$dir/t.xlsx")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(("name", "string"), ("score", "double")))
    assert(df.as[(String, Double)].collect().sortBy(_._1).toSeq == Seq(("ada", 9.5), ("grace", 12.0)))
  }

  test("colIndex maps A/Z/AA correctly") {
    assert(ExcelReader.colIndex("A1") == 0)
    assert(ExcelReader.colIndex("Z9") == 25)
    assert(ExcelReader.colIndex("AA3") == 26)
  }

  test("detection routes .xlsx to the excel reader") {
    val dir = Files.createTempDirectory("xlsx2").toString
    writeXlsx(s"$dir/u.xlsx")
    val p = Pipeline.auto(s"file://$dir/u.xlsx")
    assert(p.source.name == "excel_reader")
    assert(p.read(spark).count() == 2)
  }
}
