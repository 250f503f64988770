package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // A benchmark question leaked verbatim into doc 10, partially into 11.
  private val probes = Seq(
    (100L, "what is the capital of france and when was it founded"),
    (101L, "explain the theory of general relativity in simple terms")
  ).toDF("probe_id", "ptext")

  private val docs = Seq(
    (10L, "trivia dump: what is the capital of france and when was it founded nobody knows"),
    (11L, "the capital of france and when it rains there"),
    (12L, "an unrelated essay on growing tomatoes in winter greenhouses"),
    (13L, "explain the theory of general relativity in simple terms for students")
  ).toDF("doc_id", "text")

  test("ngramOverlap finds leaked n-grams with correct counts and fractions") {
    val out = Decontam
      .ngramOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5)
      .as[(Long, Long, Long, Long, Double)]
      .collect()
      .map { case (d, p, sh, tot, c) => (d, p) -> ((sh, tot, c)) }
      .toMap

    // probe 100 has 11 tokens -> 7 distinct 5-grams; all 7 appear in doc 10
    assert(out((10L, 100L)) == ((7L, 7L, 1.0)))
    // doc 13 contains probe 101 (9 tokens -> 5 grams) verbatim
    assert(out((13L, 101L)) == ((5L, 5L, 1.0)))
    // doc 11 shares exactly 2 grams ("the capital of france and",
    // "capital of france and when")
    assert(out((11L, 100L)) == ((2L, 7L, 2.0 / 7)))
    // doc 12 is clean
    assert(!out.keys.exists(_._1 == 12L))
  }

  test("hashed and string gram joins agree") {
    val hashed = Decontam
      .ngramOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5, hashGrams = true)
      .select("doc_id", "probe_id", "n_shared").as[(Long, Long, Long)].collect().toSet
    val strings = Decontam
      .ngramOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5, hashGrams = false)
      .select("doc_id", "probe_id", "n_shared").as[(Long, Long, Long)].collect().toSet
    assert(hashed == strings)
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val clean = Decontam
      .decontaminate(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(12L)) // 10/13 leak whole probes; 11 shares 2 grams
    // with minShared high enough, partial overlaps survive
    val lax = Decontam
      .decontaminate(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5, minShared = 3L)
      .select("doc_id").as[Long].collect().toSet
    assert(lax.contains(12L) && lax.contains(11L) && !lax.contains(10L) && !lax.contains(13L))
  }

  test("crossSourceOverlap counts distinct shared grams per source pair") {
    val corpus = Seq(
      ("web", "alpha beta gamma delta epsilon zeta"),      // grams: a b g d e, b g d e z
      ("web", "alpha beta gamma delta epsilon zeta"),      // duplicate doc: no new grams
      ("books", "alpha beta gamma delta epsilon eta"),     // shares "a b g d e" with web
      ("forums", "one two three four five six")            // disjoint
    ).toDF("source", "text")
    val out = Decontam.crossSourceOverlap(corpus, "source", "text", n = 5)
      .as[(String, String, Long)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    // books<web share exactly the one 5-gram "alpha beta gamma delta epsilon"
    assert(out == Map(("books", "web") -> 1L))
    // hashed and string joins agree
    val str = Decontam.crossSourceOverlap(corpus, "source", "text", n = 5, hashGrams = false)
      .as[(String, String, Long)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(str == out)
    // the knownSources bitmask path (the 100 TB shape: primitive bit_or
    // shuffle, no ObjectHashAggregate) produces the identical matrix
    val mask = Decontam.crossSourceOverlap(corpus, "source", "text", n = 5,
      knownSources = Some(Seq("web", "books", "forums")))
      .as[(String, String, Long)].collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(mask == out)
    // a source missing from the dictionary fails loudly, never silently
    // drops out of the matrix
    val e = intercept[Exception] {
      Decontam.crossSourceOverlap(corpus, "source", "text", n = 5,
        knownSources = Some(Seq("web", "books"))).collect()
    }
    assert(e.getMessage.contains("source not in knownSources") ||
      Option(e.getCause).exists(_.getMessage.contains("source not in knownSources")))
  }

  test("broadcast probe side appears in the plan") {
    val plan = Decontam
      .ngramOverlap(docs, "doc_id", "text", probes, "probe_id", "ptext", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
