package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  test("htmlToText strips tags, scripts, entities; keeps visible text") {
    val html =
      """<html><head><style>p {color:red}</style><script>var x = "<p>";</script></head>
        |<body><!-- hidden --><h1>Title</h1><p>Hello &amp; welcome to <b>Spark</b>.</p>
        |<div>Second&nbsp;line</div></body></html>""".stripMargin
    val out = Seq(html).toDF("h").select(TextExtract.htmlToText(col("h"))).as[String].head()
    assert(out.contains("Title"))
    assert(out.contains("Hello & welcome to Spark"))
    assert(out.contains("Second line"))
    assert(!out.contains("color:red"))
    assert(!out.contains("var x"))
    assert(!out.contains("<"))
  }

  test("markdownToText strips fences, links, emphasis, bullets") {
    val md =
      """# Heading
        |Some *emphasis* and **bold** text with `inline code`.
        |
        |- item one
        |- [a link](http://example.com) here
        |
        |```scala
        |val secret = 1
        |```
        |> quoted line
        |""".stripMargin
    val out = Seq(md).toDF("m").select(TextExtract.markdownToText(col("m"))).as[String].head()
    assert(out.contains("Heading"))
    assert(out.contains("emphasis and bold text with inline code"))
    assert(out.contains("a link here"))
    assert(out.contains("quoted line"))
    assert(!out.contains("secret"))
    assert(!out.contains("#"))
    assert(!out.contains("```"))
  }

  test("htmlTables extracts table rows as cell arrays") {
    val html =
      """<html><body><table>
        |<tr><th>name</th><th>score</th></tr>
        |<tr><td><b>ada</b></td><td>9.5</td></tr>
        |<tr><td>grace</td><td>12</td></tr>
        |</table></body></html>""".stripMargin
    val out = TextExtract.htmlTables(Seq(html).toDF("h"), "h")
      .select("row_index", "cells").as[(Int, Seq[String])].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0)._2 == Seq("name", "score"))
    assert(out(1)._2 == Seq("ada", "9.5"))
  }

  private def zipBytes(entries: (String, String)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("docxToText extracts paragraph runs from OOXML") {
    val docx = zipBytes(
      "[Content_Types].xml" -> "<Types/>",
      "word/document.xml" ->
        """<?xml version="1.0"?>
          |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
          |<w:body>
          |<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t xml:space="preserve">graft &amp; Spark</w:t></w:r></w:p>
          |<w:p><w:r><w:t>second paragraph</w:t></w:r></w:p>
          |</w:body></w:document>""".stripMargin
    )
    val dir = Files.createTempDirectory("docx")
    Files.write(dir.resolve("doc.docx"), docx)
    val df = spark.read.format("binaryFile").load(s"file://$dir/doc.docx")
    val text = TextExtract.docxToText(df).select("text").as[String].head()
    assert(text == "Hello graft & Spark\nsecond paragraph")
  }

  test("epubToText follows container -> OPF spine -> chapters in order") {
    val epub = zipBytes(
      "mimetype" -> "application/epub+zip",
      "META-INF/container.xml" ->
        """<container><rootfiles>
          |<rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
          |</rootfiles></container>""".stripMargin,
      "OEBPS/content.opf" ->
        """<package><manifest>
          |<item id="ch2" href="ch2.xhtml" media-type="application/xhtml+xml"/>
          |<item id="ch1" href="ch1.xhtml" media-type="application/xhtml+xml"/>
          |</manifest>
          |<spine><itemref idref="ch1"/><itemref idref="ch2"/></spine></package>""".stripMargin,
      "OEBPS/ch1.xhtml" -> "<html><body><p>chapter one text</p></body></html>",
      "OEBPS/ch2.xhtml" -> "<html><body><p>chapter two text</p></body></html>"
    )
    val dir = Files.createTempDirectory("epub")
    Files.write(dir.resolve("book.epub"), epub)
    val df = spark.read.format("binaryFile").load(s"file://$dir/book.epub")
    val text = TextExtract.epubToText(df).select("text").as[String].head()
    // spine order (ch1 before ch2) wins over manifest order
    assert(text == "chapter one text\n\nchapter two text")
  }

  test("pdfText reads uncompressed and FlateDecode text objects") {
    def pdfWith(stream: Array[Byte], dict: String): Array[Byte] = {
      val head = s"%PDF-1.4\n1 0 obj\n<< $dict /Length ${stream.length} >>\nstream\n"
        .getBytes("ISO-8859-1")
      val tail = "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
      head ++ stream ++ tail
    }
    val ops = "BT /F1 12 Tf (Hello) Tj [ (wor) -20 (ld \\(x\\)) ] TJ ET"
    val plain = pdfWith(ops.getBytes("ISO-8859-1"), "")
    assert(TextExtract.pdfText(plain) == "Hello world (x)")

    val deflater = new java.util.zip.Deflater()
    deflater.setInput(ops.getBytes("ISO-8859-1")); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    val flate = pdfWith(buf.take(n), "/Filter /FlateDecode")
    assert(TextExtract.pdfText(flate) == "Hello world (x)")

    // image-only / unparseable payloads degrade to empty, not an error
    assert(TextExtract.pdfText("%PDF-1.4 no streams %%EOF".getBytes("ISO-8859-1")) == "")
  }

  test("documentsFromFiles routes extraction by extension and feeds TextOps") {
    val dir = Files.createTempDirectory("docs")
    Files.writeString(dir.resolve("a.html"), "<html><body><p>the quick brown fox</p></body></html>")
    Files.writeString(dir.resolve("b.md"), "# Notes\nthe *lazy* dog sleeps")
    Files.writeString(dir.resolve("c.txt"), "plain text content here")
    Files.write(dir.resolve("d.docx"), zipBytes(
      "word/document.xml" -> "<w:document><w:body><w:p><w:r><w:t>ooxml body words</w:t></w:r></w:p></w:body></w:document>"))
    val docs = TextExtract.documentsFromFiles(spark, s"file://$dir")
    assert(docs.count() == 4)
    val texts = docs.select("text").as[String].collect()
    assert(texts.exists(_.contains("the quick brown fox")))
    assert(texts.exists(_ == "ooxml body words"))
    assert(texts.exists(t => t.contains("the lazy dog sleeps") && !t.contains("*")))
    // composes with the analysis ops
    val toks = docs.select(TextOps.tokenCount(col("text"))).as[Int].collect()
    assert(toks.forall(_ >= 3))
  }
}
