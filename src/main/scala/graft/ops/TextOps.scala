package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale document pipelines: tokenizing,
  * language-ID heuristics, quality scoring, fingerprinting. All are pure
  * Column expressions (whole-stage-codegen'd built-ins, no UDFs) so they
  * stay in the scan pipeline and never force a shuffle on their own.
  *
  * The reference only ships text *extraction* (PDF/DOCX/Markdown readers,
  * readers.py:2100-2160); the analysis surface here is the Spark-native
  * extension the pipeline needs at the 100 TB design point.
  */
object TextOps {

  /** Lower-cased whitespace tokens, empties removed. One fused byte
    * scan ([[graft.functions.WhitespaceTokens]], round 19) replacing
    * `filter(split(lower(trim(text)), "\\s+"), length > 0)`: the regex
    * engine and the interpreted ArrayFilter both leave the pipeline,
    * and `trim` is subsumed (edge spaces are separators — the leading
    * empty string it pre-empted dies in the empty-drop anyway). Parity
    * with the HOF formulation pinned in TextStatsExpressionsSpec; this
    * is the tokenizer under every text operator and the DuckDB
    * `duckTokens` twin, so the contract is frozen.
    */
  def tokens(text: Column): Column =
    graft.functions.TextFunctions.whitespaceTokens(lower(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token estimate: words plus punctuation runs counted
    * separately (a cheap stand-in for a real tokenizer's piece count).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[\\s]+|(?=[\\p{Punct}])|(?<=[\\p{Punct}])"), t => length(t) > 0))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as", "this"
  )

  /** Fraction of tokens that are (English) stopwords — a quality signal. */
  def stopwordRatio(text: Column): Column = stopwordRatioFromTokens(tokens(text))

  /** Fraction of characters that are punctuation — the fused
    * [[graft.functions.CountAsciiPunct]] byte scan (round 19; the
    * regexp_replace form materialized the filtered string per row just
    * to take its length; parity pinned in TextStatsExpressionsSpec).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      graft.functions.TextFunctions.countAsciiPunct(text).cast("double") / length(text)
    )

  /** Mean token length — degenerate values flag boilerplate/garbage. */
  def meanTokenLen(text: Column): Column = meanTokenLenFromTokens(tokens(text))

  /** [[meanTokenLen]] over an already-tokenized array column: total
    * chars via the fused [[graft.functions.SumCharLengths]] pass
    * (round 19 — the `aggregate` HOF fold ran interpreted per token;
    * parity incl. null-element null-out pinned in
    * TextStatsExpressionsSpec).
    */
  def meanTokenLenFromTokens(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      graft.functions.TextFunctions.sumCharLengths(toks).cast("double") / size(toks)
    )

  /** Composite [0,1] quality score from length/stopword/punct signals,
    * mirroring the C4/Gopher-style heuristic filters.
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(20, 100000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.05, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.3, 1.0).otherwise(0.0)
    val tokOk = when(meanTokenLen(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    (lenOk + stopOk + punctOk + tokOk) / 4.0
  }

  /** PII patterns for detection/redaction, ordered (redaction applies
    * them in sequence; the patterns are mutually non-overlapping on the
    * classes they target). Deliberately restricted to syntax with
    * identical semantics in java.util.regex and RE2 (no backrefs, no
    * lookaround) so a DuckDB oracle replicates them exactly.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b",
    "ipv4" -> "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  )

  /** Count of matches of one PII class. */
  def piiCount(text: Column, kind: String): Column =
    regexp_count(text, lit(piiPatterns.toMap.apply(kind)))

  /** Replace every PII match with `token`, applying [[piiPatterns]] in
    * order — the pre-training scrub pass (emails/SSNs/phones/IPs out,
    * text shape preserved). Pure codegen'd regexp_replace chain: no UDF,
    * no shuffle, scan-pipelined.
    */
  def redactPii(text: Column, token: String = "[PII]"): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p)) => regexp_replace(c, p, token) }

  /** Character/stopword-heuristic language ID over a closed tag set
    * (en/es/fr/de/zh/und). Deliberately expressible in plain SQL so the
    * oracle can replicate it exactly; scores are stopword hit counts.
    *
    * Prefer tokenizing once into a column and calling [[langIdFromTokens]]
    * — HOFs are interpreted, and inlining `tokens(text)` here would
    * re-tokenize the text for every language's score.
    */
  def langId(text: Column): Column = langIdFromTokens(text, tokens(text))

  /** [[langId]] over an already-tokenized array column. Word-list hit
    * counts run through the fused [[graft.functions.CountInSet]] hash
    * probe (round 19) — the `isin` HOF walked the token array once per
    * language with an interpreted O(words) chain per token.
    */
  def langIdFromTokens(text: Column, toks: Column): Column = {
    def hits(words: Seq[String]): Column =
      graft.functions.TextFunctions.countInSet(toks, words)
    val en = hits(Seq("the", "and", "of", "is", "was", "with"))
    val es = hits(Seq("el", "la", "los", "las", "que", "es"))
    val fr = hits(Seq("le", "les", "des", "est", "une", "et"))
    val de = hits(Seq("der", "die", "und", "das", "ist", "ein"))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(en >= es && en >= fr && en >= de && en > 0, "en")
      .when(es >= fr && es >= de && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** [[stopwordRatio]] over an already-tokenized array column
    * (fused [[graft.functions.CountInSet]] stopword probe). */
  def stopwordRatioFromTokens(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      graft.functions.TextFunctions.countInSet(toks, stopwords).cast("double") / size(toks)
    )

  /** Order-insensitive document fingerprint: md5 of the sorted token bag.
    * Identical token multisets collide deliberately (near-dup precursor).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  /** 57-bit rolling polynomial fingerprint over tokens (Rabin-style):
    * h = (h*31 + hash(token)) mod 2^57. Kept under 2^57 so the multiply
    * never overflows a Long under ANSI arithmetic. Sensitive to token
    * order, unlike [[fingerprint]].
    */
  def rollingHash(text: Column): Column = {
    val p = 1L << 57
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(xxhash64(t), lit(p)), lit(p))
    )
  }

  /** Non-empty lines of a document — the fused
    * [[graft.functions.NonBlankLines]] byte scan (round 19; parity
    * with `filter(split(text, "\n"), length(trim(l)) > 0)` — original
    * untrimmed lines kept, space-only lines dropped, tab-only kept —
    * pinned in TextStatsExpressionsSpec).
    */
  def lines(text: Column): Column =
    graft.functions.TextFunctions.nonBlankLines(text)

  /** Fraction of non-empty lines that are duplicates of an earlier
    * line — the Gopher/MassiveText repetition rule's line form. Pure
    * Column expressions, per-row.
    */
  def duplicateLineFraction(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** C4-style line keep predicate (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning", §2.2 cleaning rules): a line survives
    * when it ends in terminal punctuation (. ! ? "), has at least
    * `minWords` words, and mentions neither "lorem ipsum", "javascript",
    * nor a curly brace. Pure Column predicate over one line.
    */
  def c4KeepLine(line: Column, minWords: Int = 5): Column = {
    val t = trim(line)
    t.rlike("[.!?\"]$") &&
      size(graft.functions.TextFunctions.whitespaceTokens(t)) >= minWords &&
      !lower(t).contains("lorem ipsum") &&
      !lower(t).contains("javascript") &&
      !t.contains("{")
  }

  /** C4 line cleaning: drop non-surviving lines, re-join with \n. */
  def c4Clean(text: Column, minWords: Int = 5): Column =
    array_join(filter(lines(text), l => c4KeepLine(l, minWords)), "\n")

  /** C4 page keep: the CLEANED page still has >= `minSentences`
    * sentences (terminal-punctuation count), and the ORIGINAL page
    * contains neither "lorem ipsum" nor "{" (page-level removals in the
    * C4 recipe — a single policy line condemns the page, not the line).
    */
  def c4Keep(text: Column, minWords: Int = 5, minSentences: Int = 3): Column = {
    val cleaned = c4Clean(text, minWords)
    val sentences = size(split(cleaned, "[.!?]")) - 1
    sentences >= minSentences &&
      !lower(text).contains("lorem ipsum") &&
      !text.contains("{")
  }

  /** Adjacent-token bigrams ("a b") of the normalized token stream —
    * the fused [[graft.functions.SpanGrams]] 2-windows (one compiled
    * pass) behind a size guard: SpanGrams emits one whole-sequence gram
    * for shorter-than-n arrays, but a <2-token doc has NO bigram, so
    * the guard keeps this function's empty-array convention.
    */
  def bigrams(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(graft.functions.TextFunctions.spanGrams(toks, 2))
  }

  /** Per-document share of the single most frequent bigram — the other
    * MassiveText repetition signal. This one genuinely needs a group-by
    * (a per-row HOF would be quadratic in bigram count), so it is a
    * DataFrame op: explode → count per (id, bigram) → max/sum ratio.
    * One shuffle on (id, bigram), map-side combined — scales.
    */
  def topBigramFraction(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val exploded = df.select(col(idCol), explode(bigrams(col(textCol))).as("_bg"))
    exploded.groupBy(col(idCol), col("_bg")).agg(count(lit(1)).as("_n"))
      .groupBy(col(idCol))
      .agg((max("_n").cast("double") / sum("_n")).as("top_bigram_frac"))
  }
}
