package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity pins for the round-19 fused token-stat expressions
  * (NonEmptyStrings / CountInSet / SumCharLengths): each must reproduce
  * its interpreted-HOF predecessor bit-for-bit — q45/q46/q52 are
  * hash-checked against DuckDB over exactly these semantics, so any
  * drift (null handling included) would show up as an oracle mismatch.
  */
class TextStatsExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // literal token arrays covering the adversarial shapes: plain, with
  // empties, with nulls, all-empty, empty array, unicode
  private def arrays: Seq[(Long, Column)] = Seq(
    1L -> array(lit("the"), lit("quick"), lit("fox")),
    2L -> array(lit(""), lit("a"), lit(""), lit("and")),
    3L -> array(lit("x"), lit(null.asInstanceOf[String]), lit("the")),
    4L -> array(lit(""), lit("")),
    5L -> array().cast("array<string>"),
    6L -> array(lit("naïve"), lit("北京"), lit("the"))
  )

  private val words = Seq("the", "and", "of", "is")

  test("NonEmptyStrings equals filter(length > 0) on every shape") {
    arrays.foreach { case (id, arr) =>
      val (fused, hof) = Seq(1).toDF("x")
        .select(TextFunctions.nonEmptyStrings(arr).as("f"),
          filter(arr, t => length(t) > 0).as("h"))
        .as[(Seq[String], Seq[String])].head()
      assert(fused == hof, s"case $id: fused=$fused hof=$hof")
    }
  }

  test("CountInSet equals size(filter(isin)) on every shape") {
    arrays.foreach { case (id, arr) =>
      val (fused, hof) = Seq(1).toDF("x")
        .select(TextFunctions.countInSet(arr, words).as("f"),
          size(filter(arr, t => t.isin(words.map(lit): _*))).as("h"))
        .as[(Int, Int)].head()
      assert(fused == hof, s"case $id: fused=$fused hof=$hof")
    }
  }

  test("SumCharLengths equals the aggregate fold, including null-element null-out") {
    arrays.foreach { case (id, arr) =>
      val (fused, hof) = Seq(1).toDF("x")
        .select(TextFunctions.sumCharLengths(arr).as("f"),
          aggregate(arr, lit(0L), (acc, t) => acc + length(t)).as("h"))
        .as[(Option[Long], Option[Long])].head()
      assert(fused == hof, s"case $id: fused=$fused hof=$hof")
      if (id == 3L) assert(fused.isEmpty, "null element must null the sum")
      if (id == 6L) assert(fused.contains(10L), s"numChars must count codepoints: $fused")
    }
  }

  test("null input array gives null through all three") {
    val nul = lit(null).cast("array<string>")
    val row = Seq(1).toDF("x")
      .select(TextFunctions.nonEmptyStrings(nul).as("a"),
        TextFunctions.countInSet(nul, words).as("b"),
        TextFunctions.sumCharLengths(nul).as("c"))
      .as[(Option[Seq[String]], Option[Int], Option[Long])].head()
    assert(row == ((None, None, None)), s"got $row")
  }

  test("tokens() end-to-end parity with the pre-fusion HOF formulation") {
    val texts = Seq(
      "the quick  brown fox",
      "",
      "   ",
      "a\tb\nc",
      "\t leading and trailing \r\n",
      "ab\fc\rd",                  // every ASCII \s class member
      "non breaking space stays",   // U+00A0 is NOT regex \s — must not split
      "mixé 北京\t東京 çà",               // multibyte token bytes
      "x",
      null.asInstanceOf[String]
    ).toDF("text")
    val rows = texts.select(
      col("text"),
      graft.ops.TextOps.tokens(col("text")).as("fused"),
      filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0).as("hof"))
      .as[(Option[String], Option[Seq[String]], Option[Seq[String]])].collect()
    assert(rows.length == 10)
    rows.foreach { case (t, fused, hof) => assert(fused == hof, s"text=$t: fused=$fused hof=$hof") }
    // the U+00A0 case explicitly: one token containing the NBSP
    val nbsp = rows.collectFirst { case (Some(t), f, _) if t.contains(" ") => f }.flatten.get
    assert(nbsp.head == "non breaking", s"NBSP must not split: $nbsp")
  }

  test("CountAsciiPunct equals length(regexp_replace non-punct removal) on every shape") {
    val texts = Seq(
      "Hello, world! (test) [ok]; {x} — em-dash stays non-punct",
      "", "no punct here", "!!!...???", "mixé? 北京。", // 。 is U+3002, NOT \p{Punct}
      "a\tb\nc", null.asInstanceOf[String]
    ).toDF("text")
    val rows = texts.select(col("text"),
      TextFunctions.countAsciiPunct(col("text")).as("fused"),
      length(regexp_replace(col("text"), "[^\\p{Punct}]", "")).as("hof"))
      .as[(Option[String], Option[Int], Option[Int])].collect()
    assert(rows.length == 7)
    rows.foreach { case (t, fused, hof) => assert(fused == hof, s"text=$t: fused=$fused hof=$hof") }
  }

  test("NonBlankLines equals filter(split \\n, length(trim) > 0) on every shape") {
    val texts = Seq(
      "line one\nline two",
      "\n\nx\n\n",            // leading/trailing/consecutive newlines
      "   \nreal\n   ",        // space-only lines drop
      "\t\nkeep tab line",    // tab-only line is NON-blank (trim strips only spaces)
      "single",
      "",
      "\n",
      "mixé\n北京",
      null.asInstanceOf[String]
    ).toDF("text")
    val rows = texts.select(col("text"),
      TextFunctions.nonBlankLines(col("text")).as("fused"),
      filter(split(col("text"), "\n"), l => length(trim(l)) > 0).as("hof"))
      .as[(Option[String], Option[Seq[String]], Option[Seq[String]])].collect()
    assert(rows.length == 9)
    rows.foreach { case (t, fused, hof) =>
      assert(fused == hof, s"text=${t.map(_.replace("\n", "\\n"))}: fused=$fused hof=$hof")
    }
  }

  test("WhitespaceTokens interpreted eval matches codegen and the split+filter tree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val s = "  hello\t\tworld \r\n mixé x  "
    val interpreted = WhitespaceTokens(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    val viaDf = Seq(s).toDF("t")
      .select(TextFunctions.whitespaceTokens(col("t"))).as[Seq[String]].head()
    val hof = Seq(s).toDF("t")
      .select(filter(split(col("t"), "\\s+"), t => length(t) > 0)).as[Seq[String]].head()
    assert(interpreted == viaDf, s"interpreted=$interpreted codegen=$viaDf")
    assert(viaDf == hof, s"fused=$viaDf hof=$hof")
  }
}
