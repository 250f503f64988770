package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases, splits on whitespace, drops empties") {
    val out = Seq("  The Quick\t brown\n FOX  ").toDF("t")
      .select(TextOps.tokens(col("t"))).as[Seq[String]].head()
    assert(out == Seq("the", "quick", "brown", "fox"))
  }

  test("tokenCount and meanTokenLen") {
    val (n, m) = Seq("one two three").toDF("t")
      .select(TextOps.tokenCount(col("t")), TextOps.meanTokenLen(col("t")))
      .as[(Int, Double)].head()
    assert(n == 3)
    assert(math.abs(m - 11.0 / 3) < 1e-9)
  }

  test("stopwordRatio and punctRatio") {
    val (s, p) = Seq("the cat and the hat!!").toDF("t")
      .select(TextOps.stopwordRatio(col("t")), TextOps.punctRatio(col("t")))
      .as[(Double, Double)].head()
    assert(math.abs(s - 3.0 / 5) < 1e-9) // the, and, the
    assert(math.abs(p - 2.0 / 21) < 1e-9)
    val empty = Seq("").toDF("t").select(TextOps.stopwordRatio(col("t"))).as[Double].head()
    assert(empty == 0.0)
  }

  test("langId heuristic picks dominant stopword language; CJK wins") {
    val out = Seq(
      ("the cat is on the mat and it was good", "en"),
      ("el gato es la casa que los perros", "es"),
      ("le chat est une maison et les chiens", "fr"),
      ("der hund und die katze ist ein haus", "de"),
      ("你好世界", "zh"),
      ("xyzzy plugh quux", "und")
    ).toDF("t", "expected")
    val rows = out.select(TextOps.langId(col("t")), col("expected")).as[(String, String)].collect()
    rows.foreach { case (got, exp) => assert(got == exp, s"got $got want $exp") }
  }

  test("fingerprint is order-insensitive; rollingHash is order-sensitive") {
    val df = Seq(("a b c", "c b a")).toDF("t1", "t2")
    val (f1, f2, r1, r2) = df.select(
      TextOps.fingerprint(col("t1")),
      TextOps.fingerprint(col("t2")),
      TextOps.rollingHash(col("t1")),
      TextOps.rollingHash(col("t2"))
    ).as[(String, String, Long, Long)].head()
    assert(f1 == f2)
    assert(r1 != r2)
  }

  test("qualityScore rewards normal prose over degenerate strings") {
    val (good, bad) = Seq(("the quick brown fox jumps over the lazy dog and runs away", "!!!! ???? ;;;; aa"))
      .toDF("g", "b")
      .select(TextOps.qualityScore(col("g")), TextOps.qualityScore(col("b")))
      .as[(Double, Double)].head()
    assert(good > bad)
    assert(good >= 0.75)
  }

  test("repetition signals: duplicate lines and top bigram share") {
    val doc = "spam spam\nham eggs\nspam spam\n\n  \nspam spam"
    val df = Seq((1L, doc), (2L, "all lines differ\nno repeats here"), (3L, "one")).toDF("id", "text")
    val dup = df.select(col("id"), TextOps.duplicateLineFraction(col("text")))
      .as[(Long, Double)].collect().toMap
    // doc 1: 4 non-empty lines, 2 distinct -> 0.5 duplicated
    assert(math.abs(dup(1L) - 0.5) < 1e-9)
    assert(dup(2L) == 0.0 && dup(3L) == 0.0)

    val top = TextOps.topBigramFraction(df, "id", "text")
      .as[(Long, Double)].collect().toMap
    // doc 1 tokens: spam spam ham eggs spam spam spam spam → bigrams:
    // (spam,spam) x4 of 7 total
    assert(math.abs(top(1L) - 4.0 / 7) < 1e-9)
    // doc 3 has one token -> no bigrams -> absent
    assert(!top.contains(3L))
  }

  test("piiCount and redactPii find and scrub emails, phones, IPs, SSNs") {
    val txt = "mail a.smith+x@corp.example.org or 555-867-5309; host 192.168.1.10, ssn 078-05-1120 end"
    val df = Seq(txt).toDF("t")
    val counts = df.select(
      TextOps.piiCount(col("t"), "email"),
      TextOps.piiCount(col("t"), "phone"),
      TextOps.piiCount(col("t"), "ipv4"),
      TextOps.piiCount(col("t"), "ssn")
    ).as[(Int, Int, Int, Int)].head()
    assert(counts == ((1, 1, 1, 1)))
    val red = df.select(TextOps.redactPii(col("t"))).as[String].head()
    assert(red == "mail [PII] or [PII]; host [PII], ssn [PII] end")
    // clean text untouched
    val clean = "no personal data here 12.5 degrees v1.2.3.4x"
    assert(Seq(clean).toDF("t").select(TextOps.redactPii(col("t"))).as[String].head() == clean)
  }

  test("c4 cleaning: every published line rule fires; page keep needs 3 sentences") {
    val page = Seq(
      "This line has enough words and ends well.",   // kept
      "Too short.",                                  // < 5 words
      "This line has no terminal punctuation at all",// no [.!?"]
      "Enable javascript to view this fancy page!",  // javascript line drops
      "A perfectly reasonable second sentence here!",// kept
      "And a third good sentence finishes the page." // kept
    ).mkString("\n")
    val df = Seq(page).toDF("t")
    assert(df.select(size(filter(TextOps.lines(col("t")),
      l => TextOps.c4KeepLine(l)))).as[Int].head() == 3)
    // a javascript LINE drops the line, not the page (C4's page-level
    // removals are lorem ipsum and braces only)
    assert(df.select(TextOps.c4Keep(col("t"))).as[Boolean].head())
    // cleaned text contains only the survivors, in order
    val cleaned = df.select(TextOps.c4Clean(col("t"))).as[String].head()
    assert(cleaned.split("\n").length == 3 && !cleaned.contains("javascript"))
    // two sentences only -> page dropped
    val two = Seq(Seq(
      "This line has enough words and ends well.",
      "A perfectly reasonable second sentence here!").mkString("\n")).toDF("t")
    assert(!two.select(TextOps.c4Keep(col("t"))).as[Boolean].head())
    // a single brace or lorem ipsum ANYWHERE condemns the page
    assert(!Seq(page + "\nvar x = { y: 1 } and more words here.").toDF("t")
      .select(TextOps.c4Keep(col("t"))).as[Boolean].head())
    assert(!Seq(page + "\nsome Lorem Ipsum trailing filler words here.").toDF("t")
      .select(TextOps.c4Keep(col("t"))).as[Boolean].head())
  }

  test("duplicateSpans finds cross-doc repeated windows; hash and string paths agree") {
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"prefix words here $shared suffix tail"),
      (2L, s"$shared completely different ending part"),
      (3L, s"unrelated text with no repeats at all in sight today ok")
    ).toDF("doc_id", "text")
    val str = Dedup.duplicateSpans(docs, "doc_id", "text", n = 10, minDocs = 2, hashSpans = false)
      .as[(String, Long, Long, Long)].collect()
    assert(str.nonEmpty)
    assert(str.exists(_._1 == shared), s"the planted shared 10-gram must surface: ${str.map(_._1).mkString("; ")}")
    val planted = str.find(_._1 == shared).get
    assert(planted._2 == 2L && planted._3 == 2L && planted._4 == 1L)
    // scale path: same (n_docs, n_occurrences, first_id) multiset
    val hashed = Dedup.duplicateSpans(docs, "doc_id", "text", n = 10, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(hashed.map(t => (t._2, t._3, t._4)).sorted.toSeq ==
      str.map(t => (t._2, t._3, t._4)).sorted.toSeq)

    // per-doc exposure + the removal policy over it
    val stats = Dedup.dupSpanStats(docs, "doc_id", "text", n = 10, minDocs = 2)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    // the oracle path (string spans) must agree row-for-row with the
    // scale path (64-bit gram-hash spans)
    val statsStr = Dedup.dupSpanStats(docs, "doc_id", "text", n = 10, minDocs = 2,
        hashSpans = false)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(statsStr == stats, s"hash/string dupSpanStats diverged: $statsStr vs $stats")
    assert(stats(3L)._3 == 0L && stats(3L)._4 == 0.0)       // clean doc
    assert(stats(1L)._3 > 0L && stats(2L)._3 > 0L)          // both carriers flagged
    assert(stats(1L)._4 > 0.0 && stats(1L)._4 <= 1.0)
    val kept = Dedup.dropSpanDuplicatedDocs(docs, "doc_id", "text", maxDupFraction = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))                                  // any exposure drops
    val keepAll = Dedup.dropSpanDuplicatedDocs(docs, "doc_id", "text", maxDupFraction = 1.0)
      .count()
    assert(keepAll == 3L)
  }

  test("duplicateSpans ignores NULL doc ids in n_docs (countDistinct semantics)") {
    // the (span, doc) pre-aggregate keeps a NULL id as its own group;
    // the outer count must skip it — a span shared by one real doc and
    // one NULL-id row is NOT a cross-doc duplicate (round-17 review catch)
    val shared = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (Some(1L), s"prefix words $shared end bits"),
      (Option.empty[Long], s"$shared other trailing words here")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", n = 10, minDocs = 2, hashSpans = false)
      .as[(String, Long, Long, Long)].collect()
    assert(!out.exists(_._1 == shared),
      s"NULL-id occurrence must not count toward n_docs: ${out.mkString("; ")}")
  }

  test("c4Clean is idempotent over the real corpus derivation") {
    // cleaning a cleaned page changes nothing: every surviving line
    // still satisfies every line rule — a regression here means a rule
    // inspects cross-line state it shouldn't
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("replace(text, ' table ', concat('.', chr(10)))").as("t"))
    val once = docs.select(TextOps.c4Clean(col("t")).as("c1"))
    val twice = once.select(col("c1"), TextOps.c4Clean(col("c1")).as("c2"))
    assert(twice.where(col("c1") =!= col("c2")).count() == 0)
  }
}
