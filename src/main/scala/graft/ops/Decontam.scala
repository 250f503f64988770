package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark/test-set decontamination: flag training documents that share
  * word n-grams with a (small) probe corpus — the standard "13-gram
  * overlap" hygiene pass an LLM training pipeline runs before training so
  * eval benchmarks aren't leaked into the corpus.
  *
  * The reference has no such operator (it is a catalog/dispatch layer);
  * this is part of the Spark-native training-data surface, alongside
  * [[Dedup]] and [[TextOps]].
  *
  * Scale design (100 TB corpus, bounded probe set):
  *  - the probe side (a benchmark suite) is tiny relative to the corpus —
  *    its distinct n-grams are broadcast, so the corpus side is a map-only
  *    explode + broadcast hash join; the only shuffle is the final
  *    (doc, probe) count aggregation, which is bounded by the number of
  *    *matches*, not the corpus size;
  *  - with `hashGrams=true` the join key is the 64-bit xxhash64 of the
  *    n-gram, so no n-gram strings are materialized through the join
  *    (collision odds across G distinct probe grams are ~G²/2⁶⁴ —
  *    negligible for any real benchmark suite, and acceptable for a
  *    flagging pass); `hashGrams=false` joins on the exact string and is
  *    the DuckDB-oracle path.
  */
object Decontam {

  /** Distinct word n-grams of `textCol` per row of `df`, exploded to
    * (idCol, gram) rows. Texts shorter than `n` tokens contribute their
    * whole token sequence as one gram (same convention as
    * [[Dedup.shingles]]).
    */
  private def explodedGrams(df: DataFrame, idCol: String, textCol: String, n: Int) =
    Dedup.explodeShingles(df, idCol, textCol, n, outCol = "_gram", perRowDistinct = true)

  /** The hashGrams fast path: 64-bit gram hashes per row, exploded —
    * gram strings never materialize ([[Dedup.gramHashes]]); the string
    * path above stays for `hashGrams=false` oracle runs. `perRowDistinct`
    * stays ON for [[ngramOverlap]], whose n_shared semantics REQUIRE one
    * count per distinct gram per doc. The set-valued consumer
    * ([[crossSourceOverlap]]) turns it OFF: collect_set / bit_or absorb
    * duplicate gram rows anyway, and since grams became hashed longs the
    * per-row array_distinct hash-walk costs more than shuffling the dup
    * longs (round-17 A/B at sf0.1 warm serial: 0.56 s without vs 0.73 s
    * with — the inverse of the round-15 gram-STRING measurement this doc
    * previously recorded). At 100 TB the trade tilts back for highly
    * repetitive corpora (shuffle bytes beat local CPU), which is what
    * [[crossSourceOverlap]]'s `perRowDistinct` knob is for. */
  private def explodedGramHashes(df: DataFrame, idCol: String, textCol: String, n: Int,
      perRowDistinct: Boolean = true) =
    Dedup.explodeGramHashes(df, idCol, textCol, n, perRowDistinct)

  /** Per-(document, probe) n-gram overlap: one row for each training doc
    * sharing at least one word n-gram with a probe document, with the
    * shared-gram count and the contaminated fraction of the probe's grams.
    *
    * Output: (idCol, probeIdCol, n_shared, probe_grams, contamination)
    * where contamination = n_shared / probe_grams ∈ (0, 1].
    */
  def ngramOverlap(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTextCol: String,
      n: Int = 13,
      hashGrams: Boolean = true,
      broadcastProbes: Boolean = true,
      repartitionTo: Option[Int] = None
  ): DataFrame = {
    // A 100 TB corpus arrives in thousands of scan partitions; a local
    // single-parquet-file scan arrives in ONE, serializing the gram
    // pipeline — spread it before the compute-heavy shingling stage.
    val base = repartitionTo.map(docs.repartition(_)).getOrElse(docs)
    def grams(df: DataFrame, id: String, text: String): DataFrame =
      if (hashGrams) explodedGramHashes(df, id, text, n).withColumnRenamed("_g", "_k")
      else explodedGrams(df, id, text, n).select(col(id), col("_gram").as("_k"))
    val docGrams = grams(base, idCol, textCol)
    val probeGramsRaw = grams(probes, probeIdCol, probeTextCol)
    val probeSizes = probeGramsRaw.groupBy(probeIdCol).agg(count(lit(1)).as("probe_grams"))
    val probeGrams = {
      val p = probeGramsRaw.join(probeSizes, Seq(probeIdCol))
      if (broadcastProbes) broadcast(p) else p
    }
    docGrams
      .join(probeGrams, Seq("_k"))
      .groupBy(col(idCol), col(probeIdCol), col("probe_grams"))
      .agg(count(lit(1)).as("n_shared"))
      .select(
        col(idCol),
        col(probeIdCol),
        col("n_shared"),
        col("probe_grams"),
        (col("n_shared").cast("double") / col("probe_grams")).as("contamination")
      )
  }

  /** Cross-source contamination matrix: for every unordered source pair,
    * the count of DISTINCT word n-grams both sources contain — the
    * corpus-audit view of [[ngramOverlap]] (which crawl/benchmark
    * sources leak into which). Scale shape: ONE shuffle — grams group
    * straight to a per-gram source summary, so the per-source `distinct`
    * + gram-keyed self-join the round-15 profile flagged at 4.0x DuckDB
    * never happens. Two summary shapes:
    *  - default: per-gram source SET (`collect_set`, map-side partial
    *    agg) + map-side pair double-explode — measured FASTER at bench
    *    scale (no extra job);
    *  - `knownSources` (<=62 of them — sources are crawls/datasets, a
    *    catalog-level fact the caller usually has): a source-id BITMASK
    *    folded with `bit_or` — the shuffle carries (long, long) rows,
    *    the aggregate stays primitive inside whole-stage codegen
    *    (collect_set is an ObjectHashAggregate and breaks the span),
    *    and pair counts come from grouping the handful of distinct
    *    masks and expanding bit pairs weighted by mask count. THE
    *    100 TB shape — at bench scale its advantage is smaller than a
    *    discovery job would cost, which is why the dictionary must
    *    arrive from the caller rather than be collected here (A/B:
    *    0.78 s set vs 1.18 s mask+dict-job at sf0.1 serial).
    * The join key is the 64-bit gram hash when `hashGrams` (no strings
    * through the shuffle); output is O(sources²) rows, never O(docs).
    * `perRowDistinct` (default off): both summary shapes absorb
    * within-row duplicate grams in the aggregate, so the per-row
    * array_distinct walk is pure overhead at bench scale (A/B in
    * [[explodedGramHashes]]'s doc); switch it on for highly repetitive
    * corpora where shuffle bytes dominate local CPU.
    */
  def crossSourceOverlap(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      n: Int = 5,
      hashGrams: Boolean = true,
      repartitionTo: Option[Int] = None,
      knownSources: Option[Seq[String]] = None,
      perRowDistinct: Boolean = false
  ): DataFrame = {
    val base = repartitionTo.map(docs.repartition(_)).getOrElse(docs)
    val sourceGrams =
      if (hashGrams) explodedGramHashes(base, sourceCol, textCol, n, perRowDistinct)
      else explodedGrams(base, sourceCol, textCol, n).select(col(sourceCol), col("_gram").as("_g"))
    val sources = knownSources.map(_.distinct.map(String.valueOf(_)).sorted.toArray).getOrElse(Array.empty)
    if (knownSources.isDefined && sources.length <= 62) {
      val srcArr = array(sources.map(lit): _*)
      // chained CASE over the bounded dictionary: a plain literal-table
      // lookup that codegens to a switch (the Scala shiftleft builder
      // wants a literal bit count anyway)
      val bitOf = sources.zipWithIndex.tail
        .foldLeft(when(col(sourceCol) === lit(sources.head), lit(1L))) {
          case (acc, (s, i)) => acc.when(col(sourceCol) === lit(s), lit(1L << i))
        }
        // a source missing from the caller's dictionary must fail the
        // job, not silently drop out of the matrix
        .otherwise(assert_true(lit(false),
          concat(lit("source not in knownSources: "), col(sourceCol))).cast("long"))
      val byMask = sourceGrams
        .groupBy(col("_g")).agg(bit_or(bitOf).as("_mask"))
        .where(bit_count(col("_mask")) >= 2)
        .groupBy(col("_mask")).agg(count(lit(1)).as("_n"))
      // expand each mask's present-bit pairs, weighted by its gram count
      // — byMask is at most 2^|sources| rows and in practice a handful
      // SQL-side lambda: the Scala shiftleft/shiftright builders take a
      // literal Int bit count, but here the bit index is the lambda var
      val bitsOf = expr(
        s"filter(sequence(0, ${sources.length - 1}), b -> (shiftleft(CAST(1 AS BIGINT), b) & _mask) != 0)")
      byMask
        .select(col("_n"), explode(bitsOf).as("_i"), col("_mask"))
        .select(col("_n"), col("_i"), explode(bitsOf).as("_j"))
        .where(col("_i") < col("_j"))
        .select(
          element_at(srcArr, col("_i").cast("int") + 1).as("source_a"),
          element_at(srcArr, col("_j").cast("int") + 1).as("source_b"),
          col("_n"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(sum(col("_n")).as("shared_grams"))
    } else {
      val bySources = sourceGrams
        .groupBy(col("_g")).agg(collect_set(col(sourceCol)).as("_ss"))
        .where(size(col("_ss")) >= 2)
      bySources
        .select(explode(col("_ss")).as("source_a"), col("_ss"))
        .select(col("source_a"), explode(col("_ss")).as("source_b"))
        .where(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("shared_grams"))
    }
  }

  /** Remove contaminated documents: drop every doc whose shared-gram count
    * with ANY probe reaches `minShared`. Anti-join on the flagged id set —
    * the flagged set is small (matches only), so AQE broadcasts it.
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTextCol: String,
      n: Int = 13,
      minShared: Long = 1L
  ): DataFrame = {
    val flagged = ngramOverlap(docs, idCol, textCol, probes, probeIdCol, probeTextCol, n)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
      .distinct()
    docs.join(flagged, Seq(idCol), "left_anti")
  }
}
