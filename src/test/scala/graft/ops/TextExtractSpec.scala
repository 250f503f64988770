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

  test("documentsFromFiles routes extraction by extension and feeds TextOps") {
    val dir = Files.createTempDirectory("docs")
    Files.writeString(dir.resolve("a.html"), "<html><body><p>the quick brown fox</p></body></html>")
    Files.writeString(dir.resolve("b.md"), "# Notes\nthe *lazy* dog sleeps")
    Files.writeString(dir.resolve("c.txt"), "plain text content here")
    val docs = TextExtract.documentsFromFiles(spark, s"file://$dir")
    assert(docs.count() == 3)
    val texts = docs.select("text").as[String].collect()
    assert(texts.exists(_.contains("the quick brown fox")))
    assert(texts.exists(t => t.contains("the lazy dog sleeps") && !t.contains("*")))
    // composes with the analysis ops
    val toks = docs.select(TextOps.tokenCount(col("text"))).as[Int].collect()
    assert(toks.forall(_ >= 3))
  }
}
