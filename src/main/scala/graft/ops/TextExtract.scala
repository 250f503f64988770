package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text extraction from document formats — the front half of the LLM
  * document pipeline (reference intake/readers/readers.py:1980
  * MarkdownReader, :2086 HTMLTableReader, :2100 PDFTextReader, :2150
  * DOCX). HTML/Markdown extraction is real (pure Column expressions or
  * executor-side parsing); PDF/DOCX text needs a codec library absent
  * here, so those stay clearly-stubbed with the production plumbing in
  * place, mirroring the Multimodal decode stubs.
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

  /** STUB PDF text extraction: no PDF codec in this environment. The
    * plumbing (binaryFile rows → per-row text) is production-shaped;
    * swap the body for a real extractor. Returns a deterministic
    * placeholder derived from the payload so pipelines stay testable.
    */
  def pdfToTextStub(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val stub = udf { (content: Array[Byte]) =>
      if (content == null) null
      // ??? real PDF text extraction goes here
      else s"[pdf ${content.length} bytes sha=${java.util.Arrays.hashCode(content)}]"
    }
    df.withColumn("text", stub(col(contentCol)))
  }

  /** End-to-end: directory of .html/.md files → (path, text) document
    * frame ready for TextOps/Dedup/LlmOps.
    */
  def documentsFromFiles(spark: SparkSession, url: String): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{html,htm,md,markdown,txt}")
      .load(url)
      .select(c("path"), c("content").cast("string").as("raw"))
      .withColumn(
        "text",
        when(c("path").rlike("\\.(html?|htm)$"), htmlToText(c("raw")))
          .when(c("path").rlike("\\.(md|markdown)$"), markdownToText(c("raw")))
          .otherwise(c("raw"))
      )
      .drop("raw")
  }
}
