package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text extraction from document formats — the front half of the LLM
  * document pipeline (reference intake/readers/readers.py:1980
  * MarkdownReader, :2086 HTMLTableReader, :2100 PDFTextReader, :2136
  * EPUB, :2150 DOCX). HTML/Markdown are pure Column expressions;
  * DOCX/EPUB are zip+XML parsed with the JDK alone; PDF gets a
  * best-effort native parser (uncompressed + FlateDecode text objects).
  */
object TextExtract {

  /** Strip an HTML document to visible text: drop script/style subtrees,
    * strip tags, decode common entities, collapse whitespace. Pure
    * Column pipeline (regexp_replace chain — codegen'd, streams through
    * the scan).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noComments = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val blockBreaks = regexp_replace(noComments, "(?i)</(p|div|br|li|h[1-6]|tr)>|<br\\s*/?>", "\n")
    val noTags = regexp_replace(blockBreaks, "<[^>]+>", " ")
    val entities = Seq(
      "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " "
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(entities, "[ \\t\\x0B\\f\\r]+", " "))
  }

  /** Strip Markdown syntax to plain text: code fences, inline code
    * markers, links/images (keep the label), emphasis, headings, list
    * bullets, blockquotes, tables pipes.
    */
  def markdownToText(md: Column): Column = {
    val noFence = regexp_replace(md, "(?s)```.*?```", " ")
    val noInline = regexp_replace(noFence, "`([^`]*)`", "$1")
    val noImg = regexp_replace(noInline, "!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noHead = regexp_replace(noLink, "(?m)^#{1,6}\\s*", "")
    val noEmph = regexp_replace(noHead, "(\\*\\*|__|\\*|_)([^*_]+)\\1", "$2")
    val noBullet = regexp_replace(noEmph, "(?m)^\\s*([-*+]|\\d+\\.)\\s+", "")
    val noQuote = regexp_replace(noBullet, "(?m)^>\\s?", "")
    val noPipes = regexp_replace(noQuote, "(?m)^\\|[-| :]+\\|$", "")
    trim(regexp_replace(regexp_replace(noPipes, "\\|", " "), "[ \\t]+", " "))
  }

  /** Extract rows from the first well-formed <table> in each HTML
    * payload, executor-side (reference HTMLTableReader). Returns
    * (path, row_index, cells array).
    */
  def htmlTables(df: DataFrame, htmlCol: String): DataFrame = {
    val extract = udf { (html: String) =>
      if (html == null) Seq.empty[Seq[String]]
      else {
        val table = "(?is)<table[^>]*>.*?</table>".r.findFirstIn(html)
        table.toSeq.flatMap { t =>
          "(?is)<tr[^>]*>(.*?)</tr>".r.findAllMatchIn(t).map { tr =>
            "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r.findAllMatchIn(tr.group(1))
              .map(_.group(1).replaceAll("<[^>]+>", " ").replaceAll("\\s+", " ").trim)
              .toSeq
          }.toSeq
        }
      }
    }
    df.withColumn("_rows", extract(col(htmlCol)))
      .select(col("*"), posexplode(col("_rows")).as(Seq("row_index", "cells")))
      .drop("_rows")
  }

  // ---- zip helpers (DOCX/EPUB are zip+XML; pure JVM, executor-side) ----

  /** All entries of an in-memory zip as name -> bytes. */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.toMap
  }

  private def decodeEntities(s: String): String =
    Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(s) { case (acc, (e, r)) => acc.replace(e, r) }

  private def stripHtml(html: String): String = {
    val noScript = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noComments = noScript.replaceAll("(?s)<!--.*?-->", " ")
    val blockBreaks = noComments.replaceAll("(?i)</(p|div|br|li|h[1-6]|tr)>|<br\\s*/?>", "\n")
    val noTags = blockBreaks.replaceAll("<[^>]+>", " ")
    decodeEntities(noTags).replaceAll("[ \\t\\x0B\\f\\r]+", " ").trim
  }

  /** DOCX text (reference readers.py:2150 DocumentToText): the payload is
    * a zip whose `word/document.xml` holds runs in `<w:t>` elements;
    * paragraphs (`</w:p>`) become newlines. No codec library — OOXML is
    * XML in a zip, parsed here with the JDK alone.
    */
  private[ops] def docxText(content: Array[Byte]): String = {
    val doc = zipEntries(content).get("word/document.xml")
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
      .getOrElse(return "")
    val paras = doc.split("</w:p>").toSeq.map { p =>
      "(?s)<w:t[^>]*>(.*?)</w:t>".r.findAllMatchIn(p).map(m => decodeEntities(m.group(1))).mkString
    }
    paras.filter(_.nonEmpty).mkString("\n").trim
  }

  /** EPUB text (reference readers.py:2136): follow
    * `META-INF/container.xml` to the OPF package, read the spine's
    * itemrefs in order, resolve their hrefs through the manifest, and
    * strip each XHTML chapter to text.
    */
  private[ops] def epubText(content: Array[Byte]): String = {
    val entries = zipEntries(content)
    def text(name: String): Option[String] =
      entries.get(name).map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
    val container = text("META-INF/container.xml").getOrElse(return "")
    val opfPath = "full-path=\"([^\"]+)\"".r.findFirstMatchIn(container).map(_.group(1)).getOrElse(return "")
    val opf = text(opfPath).getOrElse(return "")
    val opfDir = opfPath.lastIndexOf('/') match { case -1 => ""; case i => opfPath.substring(0, i + 1) }
    val manifest = "(?s)<item\\b[^>]*>".r.findAllIn(opf).toSeq.flatMap { item =>
      for {
        id <- "\\bid=\"([^\"]+)\"".r.findFirstMatchIn(item).map(_.group(1))
        href <- "\\bhref=\"([^\"]+)\"".r.findFirstMatchIn(item).map(_.group(1))
      } yield id -> href
    }.toMap
    val spine = "<itemref\\b[^>]*\\bidref=\"([^\"]+)\"".r.findAllMatchIn(opf).map(_.group(1)).toSeq
    spine
      .flatMap(id => manifest.get(id))
      .flatMap(href => text(opfDir + href))
      .map(stripHtml)
      .filter(_.nonEmpty)
      .mkString("\n\n")
      .trim
  }

  /** Best-effort PDF text: walks `stream` objects (inflating
    * /FlateDecode bodies with the JDK Inflater), then collects the
    * strings shown by Tj/TJ/' /" operators inside BT..ET text blocks —
    * enough for the common text-first PDFs; image-only or exotically
    * encoded files yield "". (reference readers.py:2100 PDFTextReader
    * delegates to pdftotext; this is a minimal JVM-native reading of the
    * published PDF spec instead.)
    */
  private[ops] def pdfText(content: Array[Byte]): String = {
    val raw = new String(content, java.nio.charset.StandardCharsets.ISO_8859_1)
    val streams = "(?s)<<(.*?)>>\\s*stream\r?\n(.*?)\r?\nendstream".r.findAllMatchIn(raw).toSeq
    val decoded = streams.map { m =>
      val dict = m.group(1)
      val body = m.group(2).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      if (dict.contains("/FlateDecode")) {
        try {
          val inf = new java.util.zip.Inflater()
          inf.setInput(body)
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!inf.finished() && !inf.needsInput()) out.write(buf, 0, inf.inflate(buf))
          inf.end()
          new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
        } catch { case _: Exception => "" }
      } else new String(body, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    def unescape(s: String): String = s
      .replace("\\n", "\n").replace("\\r", "\r").replace("\\t", "\t")
      .replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
    val pieces = decoded.flatMap { s =>
      "(?s)BT(.*?)ET".r.findAllMatchIn(s).flatMap { bt =>
        // (text) Tj | (text) ' | [ (a) -120 (b) ] TJ
        "\\(((?:[^()\\\\]|\\\\.)*)\\)\\s*(?:Tj|')|\\[((?:[^\\]\\\\]|\\\\.)*)\\]\\s*TJ".r
          .findAllMatchIn(bt.group(1))
          .map { m =>
            if (m.group(1) != null) unescape(m.group(1))
            else "\\(((?:[^()\\\\]|\\\\.)*)\\)".r.findAllMatchIn(m.group(2)).map(x => unescape(x.group(1))).mkString
          }
      }
    }
    pieces.mkString(" ").replaceAll("\\s+", " ").trim
  }

  /** DOCX rows (binaryFile frame) → adds `text`. */
  def docxToText(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte]) => if (content == null) null else docxText(content) }
    df.withColumn("text", u(col(contentCol)))
  }

  /** EPUB rows (binaryFile frame) → adds `text`. */
  def epubToText(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte]) => if (content == null) null else epubText(content) }
    df.withColumn("text", u(col(contentCol)))
  }

  /** PDF rows (binaryFile frame) → adds `text` (best-effort native
    * parser; see [[pdfText]]).
    */
  def pdfToText(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val u = udf { (content: Array[Byte]) => if (content == null) null else pdfText(content) }
    df.withColumn("text", u(col(contentCol)))
  }

  /** End-to-end: directory of document files → (path, text) frame ready
    * for TextOps/Dedup/LlmOps. Text formats route through the Column
    * strippers (codegen'd); DOCX/EPUB/PDF through the executor-side
    * native parsers.
    */
  def documentsFromFiles(spark: SparkSession, url: String): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    val binText = udf { (path: String, content: Array[Byte]) =>
      if (content == null) null
      else if (path.endsWith(".docx")) docxText(content)
      else if (path.endsWith(".epub")) epubText(content)
      else if (path.endsWith(".pdf")) pdfText(content)
      else null
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{html,htm,md,markdown,txt,docx,epub,pdf}")
      .load(url)
      .withColumn(
        "text",
        when(c("path").rlike("\\.(html?|htm)$"), htmlToText(c("content").cast("string")))
          .when(c("path").rlike("\\.(md|markdown)$"), markdownToText(c("content").cast("string")))
          .when(c("path").rlike("\\.(docx|epub|pdf)$"), binText(c("path"), c("content")))
          .otherwise(trim(c("content").cast("string")))
      )
      .select(c("path"), c("text"))
  }
}
