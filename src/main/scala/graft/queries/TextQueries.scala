package graft.queries

import graft.functions.VectorFunctions
import graft.ops.{Chunking, Decontam, Dedup, Mixing, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Training-data-pipeline surface over `documents` and `embeddings`:
  * dedup (exact, MinHash-LSH, SimHash, exact Jaccard), similarity search,
  * text analysis. SQL oracles replicate the deterministic operators
  * exactly; the approximate/sketch operators (engine-specific hashes) get
  * rows-only checks plus ScalaTest ground-truth specs.
  */
object TextQueries {

  // DuckDB expression equivalent of TextOps.tokens (lower, split on \s+,
  // drop empties), reused across the oracles below.
  private def duckTokens(c: String) =
    s"list_filter(string_split_regex(lower(trim($c)), '\\s+'), t -> length(t) > 0)"

  val entries: Seq[(String, QFn, Option[String])] = Seq(
    (
      "q40_dedup_exact",
      (s, dir) => {
        Dedup.exactDedup(table(s, dir, "documents"), "text", "doc_id")
      },
      Some("""
        SELECT sha256(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
      """)
    ),
    (
      "q41_jaccard_pairs",
      // The synthetic corpus is one big near-dup clique (tiny shared
      // vocabulary): listing ALL pairs above any threshold is Θ(n²) in
      // output size, on any engine. Bound the listing to a deterministic
      // subset; the operator itself is unrestricted.
      (s, dir) => {
        Dedup.exactJaccardPairs(
          table(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", 0.55)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some(s"""
        WITH words AS (
          SELECT doc_id AS _id, unnest(list_distinct(${duckTokens("text")})) AS _w
          FROM documents WHERE doc_id < 200
        ), sizes AS (
          SELECT _id, count(*) AS _n FROM words GROUP BY _id
        ), inter AS (
          SELECT a._id AS id1, b._id AS id2, count(*) AS _inter
          FROM words a JOIN words b ON a._w = b._w AND a._id < b._id
          GROUP BY a._id, b._id
        )
        SELECT id1, id2,
               round(CAST(_inter AS DOUBLE) / (s1._n + s2._n - _inter), 6) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1._id = id1
        JOIN sizes s2 ON s2._id = id2
        WHERE CAST(_inter AS DOUBLE) / (s1._n + s2._n - _inter) >= 0.55
      """)
    ),
    (
      "q42_minhash_lsh",
      (s, dir) => {
        // xxhash64-based MinHash — not replicable in DuckDB SQL; rows-only
        // check here, ground truth vs exact Jaccard in the ScalaTest spec.
        // Same deterministic subset as q41 (see note there).
        Dedup.minhashNearDupPairs(
          table(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", shingleN = 1, k = 64, bands = 16, threshold = 0.35,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
          .select(col("id1"), col("id2"), round(col("est_jaccard"), 4).as("est_jaccard"))
      },
      None
    ),
    (
      "q63_neardup_clusters",
      // LSH pairs → connected components → canonical survivors. Hash-
      // dependent → rows-only; component semantics spec'd in DedupSpec.
      (s, dir) => {
        Dedup.dedupNearDups(
          table(s, dir, "documents").filter(col("doc_id") < 200).select("doc_id", "text"),
          // near-identical docs form cliques: every member is adjacent to
          // the minimum, so one propagation round labels the component
          "doc_id", "text", threshold = 0.6, shingleN = 1,
          repartitionTo = Some(s.sparkContext.defaultParallelism), ccRounds = 1,
          // clique graph: one blind round is the declared semantics; the
          // convergence action would serialize an extra job for nothing
          checkConvergence = false)
          .agg(count(lit(1)).as("n_canonical"), min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      },
      None
    ),
    (
      "q43_simhash",
      (s, dir) => {
        // xxhash64-based — rows-only check (deterministic; spec'd in tests).
        table(s, dir, "documents")
          .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
      },
      None
    ),
    (
      "q44_fingerprint",
      (s, dir) => {
        table(s, dir, "documents")
          .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      },
      Some(s"""
        SELECT doc_id,
               md5(array_to_string(list_sort(${duckTokens("text")}), ' ')) AS fp
        FROM documents
      """)
    ),
    (
      "q45_token_stats",
      (s, dir) => {
        val d = table(s, dir, "documents")
        d.select(
          col("source"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).as("n_chars_actual")
        ).groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            // avg at 6dp via exact integer micro-division: engines round the
            // same double differently at 6dp boundaries (BigDecimal HALF_UP
            // vs multiply/nearbyint), so keep the arithmetic integral until
            // the final exact double division by 1e6.
            (expr("(sum(n_tokens) * 1000000L) div count(1)").cast("double") / 1e6).as("avg_tokens"),
            (expr("(sum(n_chars_actual) * 1000000L) div count(1)").cast("double") / 1e6).as("avg_chars")
          )
      },
      Some(s"""
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_tokens) * 1000000 // count(*) AS DOUBLE) / 1000000 AS avg_tokens,
               CAST(sum(n_chars_actual) * 1000000 // count(*) AS DOUBLE) / 1000000 AS avg_chars
        FROM (SELECT source, len(${duckTokens("text")}) AS n_tokens,
                     length(text) AS n_chars_actual
              FROM documents)
        GROUP BY source
      """)
    ),
    (
      "q46_lang_quality",
      (s, dir) => {
        // tokenize once; the _toks column is multi-referenced so Catalyst
        // keeps it materialized instead of re-splitting per score
        table(s, dir, "documents")
          .withColumn("_toks", TextOps.tokens(col("text")))
          .select(
            col("doc_id"),
            TextOps.langIdFromTokens(col("text"), col("_toks")).as("lang_pred"),
            TextOps.stopwordRatioFromTokens(col("_toks")).as("stop_ratio")
          )
          .groupBy("lang_pred")
          .agg(count(lit(1)).as("n_docs"), round(avg("stop_ratio"), 6).as("avg_stop_ratio"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, ${duckTokens("text")} AS tk, text FROM documents
        ), scored AS (
          SELECT doc_id,
                 len(list_filter(tk, t -> list_contains(['the','and','of','is','was','with'], t))) AS en,
                 len(list_filter(tk, t -> list_contains(['el','la','los','las','que','es'], t))) AS es,
                 len(list_filter(tk, t -> list_contains(['le','les','des','est','une','et'], t))) AS fr,
                 len(list_filter(tk, t -> list_contains(['der','die','und','das','ist','ein'], t))) AS de,
                 CAST(len(list_filter(tk, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','this'], t))) AS DOUBLE)
                   / CASE WHEN len(tk) = 0 THEN 1 ELSE len(tk) END AS stop_ratio,
                 CASE WHEN len(tk) = 0 THEN 0.0 ELSE 1.0 END AS has_toks,
                 regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS zh
          FROM toks
        )
        SELECT CASE WHEN zh THEN 'zh'
                    WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
                    WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
                    WHEN fr >= de AND fr > 0 THEN 'fr'
                    WHEN de > 0 THEN 'de'
                    ELSE 'und' END AS lang_pred,
               count(*) AS n_docs,
               round(avg(stop_ratio * has_toks), 6) AS avg_stop_ratio
        FROM scored
        GROUP BY 1
      """)
    ),
    (
      "q47_wordcount",
      (s, dir) => {
        table(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("word"))
          .limit(20)
      },
      Some(s"""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(${duckTokens("text")}) AS word FROM documents)
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
      """)
    ),
    (
      "q48_vector_norms",
      (s, dir) => {
        table(s, dir, "embeddings")
          .select(
            col("vec_id"),
            col("label"),
            size(col("embedding")).as("dim"),
            round(VectorFunctions.l2Norm(col("embedding")), 4).as("l2_norm")
          )
      },
      Some("""
        SELECT vec_id, label, len(embedding) AS dim,
               round(sqrt(list_dot_product(embedding, embedding)), 4) AS l2_norm
        FROM embeddings
      """)
    ),
    (
      "q49_knn_cosine",
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        Similarity
          .bruteForceTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding", k = 3)
          .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
      },
      Some("""
        SELECT query_id, neighbor_id, round(cosine, 4) AS cosine
        FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(q.embedding, c.embedding) AS cosine,
                 row_number() OVER (PARTITION BY q.vec_id
                                    ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id) AS rn
          FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
          JOIN embeddings c ON c.vec_id <> q.vec_id
        )
        WHERE rn <= 3
      """)
    ),
    (
      "q50_embedding_neardup",
      (s, dir) => {
        Similarity
          .cosineNearDupPairs(table(s, dir, "embeddings"), "vec_id", "embedding", 0.8)
          .select(col("id1"), col("id2"), round(col("cosine"), 4).as("cosine"))
      },
      Some("""
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
      """)
    ),
    (
      "q51_lsh_knn",
      (s, dir) => {
        // Approximate ANN (hyperplane LSH) — recall measured against
        // q49's exact result in the ScalaTest spec; rows-only here.
        val emb = table(s, dir, "embeddings")
        val queries = emb.filter(col("vec_id") < 10)
        Similarity.lshTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 3, dim = 64, bitsPerGroup = 6, groups = 6)
      },
      None
    ),
    (
      "q52_quality_filter",
      (s, dir) => {
        table(s, dir, "documents")
          .withColumn("_toks", TextOps.tokens(col("text")))
          .select(
            col("doc_id"),
            col("lang"),
            size(col("_toks")).as("n_tokens"),
            round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
            round(TextOps.meanTokenLenFromTokens(col("_toks")), 6).as("mean_tok_len")
          )
          .filter(col("n_tokens") >= 5 && col("mean_tok_len") >= 2.0)
      },
      Some(s"""
        SELECT doc_id, lang, n_tokens, punct_ratio, mean_tok_len
        FROM (
          SELECT doc_id, lang,
                 len(${duckTokens("text")}) AS n_tokens,
                 round(CASE WHEN length(text) = 0 THEN 0.0
                       ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio,
                 round(CASE WHEN len(${duckTokens("text")}) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(${duckTokens("text")}, t -> length(t))) AS DOUBLE)
                            / len(${duckTokens("text")}) END, 6) AS mean_tok_len
          FROM documents
        )
        WHERE n_tokens >= 5 AND mean_tok_len >= 2.0
      """)
    ),
    (
      "q69_chunking",
      // 64-token windows with 16-token overlap (step 48) — the chunking
      // op is pure Column expressions; the oracle rebuilds the identical
      // windows with DuckDB list slicing over the same tokenization.
      (s, dir) => {
        Chunking.chunkByTokens(
          table(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", maxTokens = 64, overlap = 16)
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, ${duckTokens("text")} AS toks FROM documents
        ), c AS (
          SELECT doc_id, toks,
                 greatest(1, CAST(ceil((len(toks) - 16) / 48.0) AS BIGINT)) AS n
          FROM t
        ), u AS (
          SELECT doc_id, toks, UNNEST(range(0, n)) AS chunk_index FROM c
        )
        SELECT doc_id, chunk_index,
               array_to_string(toks[chunk_index*48+1 : chunk_index*48+64], ' ') AS chunk_text,
               len(toks[chunk_index*48+1 : chunk_index*48+64]) AS chunk_tokens
        FROM u
      """)
    ),
    (
      "q71_repetition",
      // Gopher-style repetition signals: duplicate-line fraction per doc
      (s, dir) => {
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            size(TextOps.lines(col("text"))).cast("long").as("n_lines"),
            round(TextOps.duplicateLineFraction(col("text")), 6).as("dup_line_frac"))
      },
      Some("""
        WITH l AS (
          SELECT doc_id,
                 list_filter(string_split(text, chr(10)), x -> length(trim(x)) > 0) AS ls
          FROM documents
        )
        SELECT doc_id,
               len(ls) AS n_lines,
               round(CASE WHEN len(ls) = 0 THEN 0.0
                     ELSE 1.0 - CAST(len(list_distinct(ls)) AS DOUBLE) / len(ls) END, 6) AS dup_line_frac
        FROM l
      """)
    ),
    (
      "q72_top_bigram",
      // most-frequent-bigram share per doc; explode + two-level agg
      (s, dir) => {
        TextOps.topBigramFraction(
          table(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
          .select(col("doc_id"), round(col("top_bigram_frac"), 6).as("top_bigram_frac"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, ${duckTokens("text")} AS toks FROM documents WHERE doc_id < 200
        ), b AS (
          SELECT doc_id,
                 UNNEST(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
          FROM t
          WHERE len(toks) >= 2
        ), c AS (
          SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg
        )
        SELECT doc_id, round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_bigram_frac
        FROM c GROUP BY doc_id
      """)
    ),
    (
      "q73_stratified_mix",
      // deterministic proportional mixture per source: keep 30% of each
      // stratum, rows chosen by md5(id) order — stable across engines,
      // no RNG (ops.Mixing.stratifiedSample)
      (s, dir) => {
        graft.ops.Mixing.stratifiedSample(
          table(s, dir, "documents").select("doc_id", "source"), "source", "doc_id", 0.30)
      },
      Some("""
        WITH r AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                 count(*) OVER (PARTITION BY source) AS n
          FROM documents
        )
        SELECT doc_id, source FROM r WHERE rn <= ceil(n * 0.30)
      """)
    ),
    (
      "q74_length_buckets",
      // curriculum buckets: quartiles over token counts with per-bucket
      // stats (ops.Mixing.lengthBuckets)
      (s, dir) => {
        val sized = table(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.ops.Mixing.lengthBuckets(sized, "n_tokens", "doc_id", 4)
      },
      Some(s"""
        WITH sized AS (
          SELECT doc_id, len(${duckTokens("text")}) AS n_tokens FROM documents
        ), b AS (
          SELECT doc_id, n_tokens, ntile(4) OVER (ORDER BY n_tokens, doc_id) AS bucket FROM sized
        )
        SELECT bucket, count(*) AS n_docs,
               min(n_tokens) AS min_size, max(n_tokens) AS max_size
        FROM b GROUP BY bucket
      """)
    ),
    (
      "q75_embedding_outliers",
      // centroid-distance outliers over the embeddings table, exact
      // integer arithmetic end to end (ops.Similarity.centroidOutliers)
      (s, dir) => {
        graft.ops.Similarity.centroidOutliers(
          s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", topK = 20)
      },
      Some("""
        WITH ex AS (
          SELECT vec_id,
                 unnest(range(1, len(embedding) + 1)) AS i,
                 CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1000) AS BIGINT) AS s
          FROM embeddings
        ), c AS (
          SELECT i, CAST(sum(s) AS BIGINT) AS m, count(*) AS n FROM ex GROUP BY i
        )
        SELECT ex.vec_id, CAST(sum((ex.s * c.n - c.m) * (ex.s * c.n - c.m)) AS BIGINT) AS d2_scaled
        FROM ex JOIN c USING (i)
        GROUP BY ex.vec_id
        ORDER BY d2_scaled DESC, ex.vec_id
        LIMIT 20
      """)
    ),
    (
      "q76_cc_exact",
      // Connected components oracle-checked: the alternating large-star/
      // small-star rewiring the near-dup clustering runs
      // (Dedup.connectedComponents), over the DuckDB-replicable
      // exact-Jaccard pair graph of q41. Both sides now compute TRUE
      // components (min reachable id, any diameter): the Spark side via
      // star convergence (fingerprint-checked, O(log d) rounds), the SQL
      // via a recursive label-closure CTE — a stronger contract than the
      // old matched-4-round unroll, and one that stays green at any SF.
      (s, dir) => {
        val pairs = Dedup.exactJaccardPairs(
          table(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", 0.55)
          .select(col("id1"), col("id2"))
        Dedup.connectedComponents(pairs)
          .select(col("id"), col("component"))
      },
      Some(s"""
        WITH RECURSIVE words AS (
          SELECT doc_id AS _id, unnest(list_distinct(${duckTokens("text")})) AS _w
          FROM documents WHERE doc_id < 200
        ), sizes AS (
          SELECT _id, count(*) AS _n FROM words GROUP BY _id
        ), inter AS (
          SELECT a._id AS a1, b._id AS a2, count(*) AS _inter
          FROM words a JOIN words b ON a._w = b._w AND a._id < b._id
          GROUP BY a._id, b._id
        ), pairs AS (
          SELECT a1 AS id1, a2 AS id2 FROM inter
          JOIN sizes s1 ON s1._id = a1
          JOIN sizes s2 ON s2._id = a2
          WHERE CAST(_inter AS DOUBLE) / (s1._n + s2._n - _inter) >= 0.55
        ), e AS (
          SELECT id1, id2 FROM pairs UNION ALL SELECT id2 AS id1, id1 AS id2 FROM pairs
        ), r(id, m) AS (
          -- label closure: every node starts as its own label; labels
          -- flow across edges until fixpoint (UNION dedups → terminates).
          -- Exact min-reachable-id at oracle scale (components are small).
          SELECT DISTINCT id1 AS id, id1 AS m FROM e
          UNION
          SELECT e.id1 AS id, r.m FROM e JOIN r ON r.id = e.id2
        )
        SELECT id, min(m) AS component FROM r GROUP BY id
      """)
    ),
    (
      "q70_packing",
      // Deterministic concat-then-split packing (packSequencesGlobal):
      // pack = exclusive-prefix-sum(n_tokens) div budget in doc_id order
      // — partitioning-independent, so it carries a value-exact oracle.
      // The strict-budget greedy variant (packSequences) keeps its
      // invariant checks in ChunkingSpec.
      (s, dir) => {
        val counts = table(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        Chunking.packSequencesGlobal(counts, "doc_id", "n_tokens", budget = 2048)
          .groupBy(col("pack_id"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            min("id").as("first_doc"),
            max("id").as("last_doc"))
      },
      Some(s"""
        WITH t AS (
          SELECT doc_id, CAST(len(${duckTokens("text")}) AS BIGINT) AS n_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT) AS prev
          FROM t
        )
        SELECT prev // 2048 AS pack_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM c
        GROUP BY 1
      """)
    ),
    (
      "q77_decontaminate",
      // Benchmark decontamination: 5-gram overlap between the train split
      // (doc_id % 97 != 0) and the probe/test split (doc_id % 97 == 0).
      // Runs the scale path (hashed gram join, broadcast probes); the
      // oracle joins the gram strings — identical output (64-bit hash
      // collisions across ~1e5 distinct grams are ~1e-9-probable).
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Decontam.ngramOverlap(
          docs.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 97 === 0)
            .select(col("doc_id").as("probe_id"), col("text")),
          "probe_id", "text", n = 5,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
          .select(col("doc_id"), col("probe_id"), col("n_shared"), col("probe_grams"),
            round(col("contamination"), 6).as("contamination"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk FROM documents),
        grams AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
                   ELSE list_transform(generate_series(1, len(tk) - 4),
                                       i -> array_to_string(tk[i:i+4], ' ')) END) AS g
          FROM toks),
        probe AS (SELECT doc_id AS probe_id, unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0),
        psize AS (SELECT probe_id, count(*) AS probe_grams FROM probe GROUP BY probe_id),
        train AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 97 <> 0),
        hits AS (SELECT t.doc_id, p.probe_id, count(*) AS n_shared
                 FROM train t JOIN probe p USING (gram) GROUP BY 1, 2)
        SELECT h.doc_id, h.probe_id, h.n_shared, s.probe_grams,
               round(CAST(h.n_shared AS DOUBLE) / s.probe_grams, 6) AS contamination
        FROM hits h JOIN psize s USING (probe_id)
      """)
    ),
    (
      "q85_source_overlap",
      // Cross-source contamination matrix: distinct shared 5-grams per
      // unordered source pair — the corpus-audit companion of q77. The
      // Spark side joins on the 64-bit gram hash (nothing but hashes
      // through the shuffle); the oracle joins the gram strings —
      // identical counts modulo ~1e-9 collision odds (the q77 argument).
      (s, dir) => {
        Decontam.crossSourceOverlap(
          table(s, dir, "documents"), "source", "text", n = 5,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
      },
      Some(s"""
        WITH toks AS (SELECT source, ${duckTokens("text")} AS tk FROM documents),
        grams AS (
          SELECT DISTINCT source,
                 unnest(CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
                   ELSE list_transform(generate_series(1, len(tk) - 4),
                                       i -> array_to_string(tk[i:i+4], ' ')) END) AS gram
          FROM toks)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS shared_grams
        FROM grams a JOIN grams b USING (gram)
        WHERE a.source < b.source
        GROUP BY 1, 2
      """)
    ),
    (
      "q78_minhash_portable",
      // Hash-exact MinHash-LSH verification: the portable twin of q42
      // (md5-based shingle hashes, literal band-slice buckets) so the
      // ENTIRE pipeline — shingles, affine signature mins, banding,
      // candidate join, estimated Jaccard — is value-checked against
      // DuckDB instead of rows-only. Unbounded: unlike word-SET Jaccard
      // (q41, where the tiny-vocabulary corpus is one clique), trigram
      // sequence similarity is high only for the planted dup groups, so
      // the est>=0.5 output stays linear in the corpus.
      (s, dir) => {
        Dedup.minhashNearDupPairsPortable(
          table(s, dir, "documents"),
          "doc_id", "text", shingleN = 3, k = 16, bands = 4, threshold = 0.5,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
          .select(col("id1"), col("id2"), round(col("est_jaccard"), 6).as("est_jaccard"))
      },
      Some {
        val (a, b) = Dedup.portableCoeffs(16, 42L)
        val sigExprs = (0 until 16)
          .map(i => s"list_min(list_transform(h, x -> (${a(i)} * x + ${b(i)}) % 2147483647))")
          .mkString(",\n                 ")
        s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk
                      FROM documents),
        sh AS (
          SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
            ELSE list_transform(generate_series(1, len(tk) - 2),
                                i -> array_to_string(tk[i:i+2], ' ')) END AS ss
          FROM toks),
        hs AS (SELECT doc_id,
                      list_transform(ss, s -> CAST(md5_number_upper(s) % 2147483647 AS BIGINT)) AS h
               FROM sh),
        sigs AS (SELECT doc_id, [$sigExprs] AS sig FROM hs),
        bandrows AS (
          SELECT doc_id, b, array_to_string(sig[(b*4+1):(b*4+4)], ',') AS bucket
          FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) bs),
        bsizes AS (SELECT b, bucket, count(*) AS c FROM bandrows GROUP BY b, bucket),
        bounded AS (
          SELECT br.doc_id, br.b, br.bucket FROM bandrows br
          JOIN bsizes USING (b, bucket) WHERE c <= 1000),
        cand AS (
          SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
          FROM bounded l JOIN bounded r
            ON l.b = r.b AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
        est AS (
          SELECT c.id1, c.id2,
                 CAST(len(list_filter(generate_series(1, 16), j -> s1.sig[j] = s2.sig[j])) AS DOUBLE) / 16
                   AS est_jaccard
          FROM cand c
          JOIN sigs s1 ON s1.doc_id = c.id1
          JOIN sigs s2 ON s2.doc_id = c.id2)
        SELECT id1, id2, round(est_jaccard, 6) AS est_jaccard
        FROM est WHERE est_jaccard >= 0.5
      """
      }
    ),
    (
      // q56's value-exact twin: the same per-source MinHash sketch UNION
      // (element-wise min over documents) computed on the portable
      // md5-based signature so DuckDB reproduces every sketch slot.
      // Output is long-form (source, sig_pos, sig_min) — directly
      // comparable without array cells, and the element-wise-min union
      // is a plain groupBy (map-side partial agg; scales).
      "q84_sketch_union_portable",
      (s, dir) => {
        Dedup.withPortableMinhashSignature(
          table(s, dir, "documents").select(col("source"), col("text")),
          "text", "_sig", shingleN = 1, k = 8)
          .select(col("source"), posexplode(col("_sig")).as(Seq("sig_pos", "sig_val")))
          .groupBy(col("source"), col("sig_pos"))
          .agg(min(col("sig_val")).as("sig_min"))
      },
      Some {
        val (a, b) = Dedup.portableCoeffs(8, 42L)
        val sigExprs = (0 until 8)
          .map(i => s"list_min(list_transform(h, x -> (${a(i)} * x + ${b(i)}) % 2147483647))")
          .mkString(",\n                 ")
        s"""
        WITH toks AS (SELECT source, ${duckTokens("text")} AS tk FROM documents),
        sh AS (SELECT source, CASE WHEN len(tk) < 1 THEN [array_to_string(tk, ' ')]
                 ELSE tk END AS ss
               FROM toks),
        hs AS (SELECT source,
                      list_transform(ss, s -> CAST(md5_number_upper(s) % 2147483647 AS BIGINT)) AS h
               FROM sh),
        sigs AS (SELECT source, [$sigExprs] AS sig FROM hs)
        SELECT source, i AS sig_pos, min(sig[i + 1]) AS sig_min
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS i) s
        GROUP BY source, i
        """
      }
    ),
    (
      "q79_simhash_portable",
      // Value-exact SimHash verification (q43's xxhash64 path is
      // rows-only): md5-vote signatures match DuckDB bit for bit,
      // including the sign of bit 63 via the two's-complement fold.
      (s, dir) => {
        table(s, dir, "documents")
          .select(col("doc_id"), Dedup.simhashPortable(col("text")).as("simhash"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk FROM documents),
        h AS (SELECT doc_id, list_transform(tk, t -> md5_number_upper(t)) AS hs FROM toks),
        sums AS (
          SELECT doc_id,
                 list_sum(list_transform(generate_series(0, 63), j ->
                   CASE WHEN list_sum(list_transform(hs, x -> CAST((x >> j) & 1 AS BIGINT) * 2 - 1)) > 0
                        THEN CAST(1 AS HUGEINT) << j ELSE 0 END)) AS s
          FROM h)
        SELECT doc_id,
               CAST(CASE WHEN s >= 9223372036854775808 THEN s - 18446744073709551616 ELSE s END AS BIGINT)
                 AS simhash
        FROM sums
      """)
    ),
    (
      "q80_pii_redact",
      // PII detection + redaction (TextOps.piiPatterns / redactPii): the
      // synthetic corpus carries no PII, so deterministic fake
      // emails/phones/IPs/SSNs are concatenated per doc_id and both
      // engines count and scrub them with the same RE2-safe patterns.
      // Output keeps the redacted text as an md5 so the gate checks the
      // full scrubbed string without shipping it.
      (s, dir) => {
        val piiText = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call 555-"), lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
              lit("-"), lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), (col("doc_id") % 200).cast("string"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" ssn 123-45-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))
        )
        table(s, dir, "documents")
          .withColumn("_t", piiText)
          .select(
            col("doc_id"),
            TextOps.piiCount(col("_t"), "email").cast("long").as("n_email"),
            TextOps.piiCount(col("_t"), "phone").cast("long").as("n_phone"),
            TextOps.piiCount(col("_t"), "ipv4").cast("long").as("n_ipv4"),
            TextOps.piiCount(col("_t"), "ssn").cast("long").as("n_ssn"),
            md5(TextOps.redactPii(col("_t"))).as("redacted_md5"))
      },
      Some {
        val p = TextOps.piiPatterns.toMap
        val redacted = TextOps.piiPatterns.foldLeft("t") { case (acc, (_, pat)) =>
          s"regexp_replace($acc, '$pat', '[PII]', 'g')"
        }
        s"""
        WITH base AS (
          SELECT doc_id, text ||
            ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ||
            CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
            CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.' || CAST(doc_id % 200 AS VARCHAR) ELSE '' END ||
            CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '${p("email")}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t, '${p("phone")}')) AS BIGINT) AS n_phone,
               CAST(len(regexp_extract_all(t, '${p("ipv4")}')) AS BIGINT) AS n_ipv4,
               CAST(len(regexp_extract_all(t, '${p("ssn")}')) AS BIGINT) AS n_ssn,
               md5($redacted) AS redacted_md5
        FROM base
      """
      }
    ),
    (
      "q81_shuffle_shards",
      // Deterministic epoch-order shuffle + content-hash shard
      // assignment (Mixing.deterministicShuffle/assignShards): per-shard
      // stats bind both the global order values and shard membership, so
      // the gate verifies the full reproducible-sharding pass.
      (s, dir) => {
        val shuffled = Mixing.deterministicShuffle(
          table(s, dir, "documents").select(col("doc_id")), "doc_id")
        Mixing.assignShards(shuffled, "doc_id", 8)
          .groupBy("shard")
          .agg(
            count(lit(1)).as("n_docs"),
            min("order").as("first_order"),
            max("order").as("last_order"),
            sum("order").cast("long").as("sum_order"))
      },
      Some("""
        WITH o AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS ord
          FROM documents),
        s AS (
          SELECT ord,
                 CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 2147483647 % 8 AS INT) AS shard
          FROM o)
        SELECT shard, count(*) AS n_docs,
               CAST(min(ord) AS BIGINT) AS first_order,
               CAST(max(ord) AS BIGINT) AS last_order,
               CAST(sum(ord) AS BIGINT) AS sum_order
        FROM s GROUP BY shard
      """)
    ),
    (
      "q86_lsh_knn_portable",
      // Hash-exact ANN twin of q51: integer hyperplanes (quantize to
      // floor(v*1000), coefficient (a_h*i+b_h) mod 2^31-1 shifted to be
      // signed) make every sign bit, band bucket, candidate pair, and
      // rounded cosine value-checkable against DuckDB — q51's recall
      // stays spec'd in RecallSweepSpec; THIS pins the pipeline.
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.portableLshTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 3, bitsPerGroup = 6, groups = 6, seed = 42L)
          .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
      },
      Some {
        val (a, b) = Dedup.portableCoeffs(36, 42L)
        def bucketExpr(g: Int): String = (0 until 6).map { j =>
          val h = g * 6 + j
          s"""(CASE WHEN list_sum(list_transform(qv, (x,i) -> x * ((${a(h)} * i + ${b(h)}) % 2147483647 - 1073741823))) > 0 THEN ${1L << j} ELSE 0 END)"""
        }.mkString("(", " + ", ")")
        val buckets = (0 until 6).map(bucketExpr).mkString(",\n                 ")
        s"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x*1000) AS BIGINT)) AS qv
          FROM embeddings
        ), bk AS (
          SELECT vec_id, unnest(range(0, 6)) AS band,
                 unnest([$buckets]) AS bucket
          FROM q
        ), cand AS (
          SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
          FROM (SELECT * FROM bk WHERE vec_id < 10) qb
          JOIN bk cb ON cb.band = qb.band AND cb.bucket = qb.bucket
                    AND cb.vec_id <> qb.vec_id
        ), scored AS (
          SELECT c.query_id, c.neighbor_id,
                 list_cosine_similarity(qe.embedding, ce.embedding) AS cos
          FROM cand c
          JOIN embeddings qe ON qe.vec_id = c.query_id
          JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 3
        """
      }
    ),
    (
      "q87_ivf_knn_portable",
      // Hash-exact IVF twin of q58: centroids are the FIRST 16 corpus
      // vectors (no sample, no Lloyd rounds), so assignment (argmax
      // cosine, ties to lower centroid id), probing (top-4 cells), and
      // scoring replicate in SQL — q58's k-means recall stays spec'd;
      // THIS pins the assign→probe→join→top-k machinery.
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        val centroids = Similarity.seedCentroids(emb, "vec_id", "embedding", 16)
        Similarity.ivfTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 3, centroids, nProbe = 4)
          .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"))
      },
      Some("""
        WITH cents AS (
          SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16
        ), assign AS (
          SELECT vec_id, cid AS cell FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1
        ), probes AS (
          SELECT vec_id AS query_id, cid AS cell FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_cosine_similarity(e.embedding, c.cvec) DESC, c.cid) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < 10) e CROSS JOIN cents c)
          WHERE rn <= 4
        ), cand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
          FROM probes p JOIN assign a USING (cell)
          WHERE a.vec_id <> p.query_id
        ), scored AS (
          SELECT c.query_id, c.neighbor_id,
                 list_cosine_similarity(qe.embedding, ce.embedding) AS cos
          FROM cand c
          JOIN embeddings qe ON qe.vec_id = c.query_id
          JOIN embeddings ce ON ce.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, round(cos, 4) AS cosine
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, neighbor_id) AS rn
              FROM scored)
        WHERE rn <= 3
      """)
    ),
    (
      "q88_duplicate_spans",
      // Exact duplicate-span detection (Lee et al. 2022): 10-token
      // windows shared by >=2 docs, with doc frequency / total
      // occurrences / smallest containing doc. hashSpans=false keys on
      // the literal span so the oracle joins strings; the scale path
      // (hashSpans=true) is spec'd equal in DedupSpec.
      (s, dir) => {
        Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text",
          n = 10, minDocs = 2, hashSpans = false,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) < 10 THEN [array_to_string(tk, ' ')]
                   ELSE list_transform(generate_series(1, len(tk) - 9),
                                       i -> array_to_string(tk[i:i+9], ' ')) END) AS span
          FROM toks)
        SELECT span, count(DISTINCT doc_id) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS first_id
        FROM g GROUP BY span
        HAVING count(DISTINCT doc_id) >= 2
      """)
    ),
    (
      "q91_temperature_weights",
      // XLM-R/mC4 temperature sampling weights at the canonical
      // alpha=0.5 (sqrt is IEEE correctly-rounded in both engines, so
      // the weights compare value-exact at 6dp).
      (s, dir) => {
        Mixing.temperatureWeights(table(s, dir, "documents"), "source", alpha = 0.5)
          .select(col("source"), col("n_rows"), round(col("weight"), 6).as("weight"))
      },
      Some("""
        WITH c AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY source)
        SELECT source, n_rows,
               round(sqrt(CAST(n_rows AS DOUBLE)) /
                     sum(sqrt(CAST(n_rows AS DOUBLE))) OVER (), 6) AS weight
        FROM c
      """)
    ),
    (
      "q92_temperature_threshold",
      // Map-only temperature-sample realization (the 100 TB path of
      // q91's weights): per-source hash-threshold keep, every step —
      // sqrt weights, rounded targets, frac, floor threshold, md5
      // hash — deterministic double/int math both engines share, so
      // the SAMPLED ROW SET is value-exact cross-engine.
      (s, dir) => {
        Mixing.temperatureSampleThreshold(
          table(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", alpha = 0.5, budgetRows = 200)
      },
      Some("""
        WITH c AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY source),
        w AS (SELECT source, n_rows,
                     sqrt(CAST(n_rows AS DOUBLE)) /
                       sum(sqrt(CAST(n_rows AS DOUBLE))) OVER () AS wt
              FROM c),
        t AS (SELECT source,
                     CAST(floor(least(1.0, round(wt * 200) / n_rows) * 2147483647) AS BIGINT) AS thr
              FROM w)
        SELECT d.doc_id, d.source
        FROM documents d JOIN t USING (source)
        WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) % 2147483647 < t.thr
      """)
    ),
    (
      "q90_dup_span_stats",
      // Per-doc duplicate-span exposure (the removal-policy view of
      // q88): n-token windows of each doc that are corpus-wide
      // duplicates, as count + fraction.
      (s, dir) => {
        Dedup.dupSpanStats(table(s, dir, "documents"), "doc_id", "text",
          n = 10, minDocs = 2, hashSpans = false,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) < 10 THEN [array_to_string(tk, ' ')]
                   ELSE list_transform(generate_series(1, len(tk) - 9),
                                       i -> array_to_string(tk[i:i+9], ' ')) END) AS span
          FROM toks),
        flagged AS (
          SELECT span FROM g GROUP BY span HAVING count(DISTINCT doc_id) >= 2)
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN f.span IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
               round(sum(CASE WHEN f.span IS NOT NULL THEN 1 ELSE 0 END) / count(*), 6) AS dup_fraction
        FROM g LEFT JOIN flagged f USING (span)
        GROUP BY g.doc_id
      """)
    ),
    (
      "q93_dup_spans_hash_portable",
      // Oracle twin for q88's PRODUCTION route: hashSpans=true keys the
      // exchange on the 64-bit gram hash (the 100 TB path — ~8 B keys
      // instead of ~65 B strings), whose hash column is engine-specific
      // — but the per-span COUNTS are value-identical to the string
      // path, so projecting the hash away leaves a multiset DuckDB can
      // check exactly (collision odds at this corpus: ~1e-11). The same
      // twin pattern as q78/q79/q82: the engine-specific operator gets
      // hash-green coverage of everything except its key encoding.
      (s, dir) => {
        Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text",
          n = 10, minDocs = 2, hashSpans = true,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
          .select(col("n_docs"), col("n_occurrences"), col("first_id"))
      },
      Some(s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk FROM documents),
        g AS (
          SELECT doc_id,
                 unnest(CASE WHEN len(tk) < 10 THEN [array_to_string(tk, ' ')]
                   ELSE list_transform(generate_series(1, len(tk) - 9),
                                       i -> array_to_string(tk[i:i+9], ' ')) END) AS span
          FROM toks)
        SELECT count(DISTINCT doc_id) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               min(doc_id) AS first_id
        FROM g GROUP BY span
        HAVING count(DISTINCT doc_id) >= 2
      """)
    ),
    (
      "q89_c4_clean",
      // C4 cleaning (Raffel et al. 2020 §2.2): line-level terminal-
      // punctuation / min-words / lorem-ipsum / javascript / brace
      // filters, page-level >=3-sentence + lorem/brace keeps — the
      // whole rule set value-checked per document. The synthetic corpus
      // has no newlines or punctuation (every rule would be vacuously
      // false), so BOTH engines first derive line structure with the
      // same deterministic rewrite: each " table " becomes ".\n", and
      // doc_id-keyed suffixes plant lorem-ipsum / brace pages.
      (s, dir) => {
        val t2 = expr("replace(text, ' table ', concat('.', chr(10)))")
        val t = when(col("doc_id") % 29 === 0, concat(t2, lit(" lorem ipsum here.")))
          .when(col("doc_id") % 31 === 0, concat(t2, lit(" { code }")))
          .otherwise(t2)
        table(s, dir, "documents").select(
          col("doc_id"),
          TextOps.c4Keep(t).as("kept"),
          size(filter(TextOps.lines(t), l => TextOps.c4KeepLine(l))).as("n_lines_kept"),
          length(TextOps.c4Clean(t)).as("clean_nchars"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 29 = 0 THEN t2 || ' lorem ipsum here.'
                      WHEN doc_id % 31 = 0 THEN t2 || ' { code }'
                      ELSE t2 END AS text
          FROM (SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS t2 FROM documents)
        ), l AS (
          SELECT doc_id, text,
                 list_filter(
                   list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0),
                   x -> regexp_matches(trim(x), '[.!?"]$')
                        AND len(list_filter(string_split_regex(trim(x), '\s+'), w -> len(w) > 0)) >= 5
                        AND NOT contains(lower(trim(x)), 'lorem ipsum')
                        AND NOT contains(lower(trim(x)), 'javascript')
                        AND NOT contains(trim(x), '{')) AS keptlines
          FROM d
        ), c AS (
          SELECT doc_id, text, len(keptlines) AS n_lines_kept,
                 coalesce(array_to_string(keptlines, chr(10)), '') AS clean
          FROM l
        )
        SELECT doc_id,
               (len(string_split_regex(clean, '[.!?]')) - 1 >= 3
                AND NOT contains(lower(text), 'lorem ipsum')
                AND NOT contains(text, '{')) AS kept,
               n_lines_kept,
               CAST(len(clean) AS INT) AS clean_nchars
        FROM c
      """)
    ),
    (
      "q94_incremental_dedup",
      // Incremental dedup probe, PRODUCTION path (xxhash64 signatures —
      // engine-specific, so rows-only; q95 is the hash-exact twin):
      // today's "batch" (doc_id % 3 = 0) probed against the persisted
      // "history" signature index (the other two thirds). The history
      // lineage is never exchanged: map-side banding, broadcast
      // semi-join on the batch's bucket keys, per-side skew bounds, and
      // signatures riding the collided rows (no re-attach join).
      (s, dir) => {
        val docs = table(s, dir, "documents")
        def sigsOf(side: org.apache.spark.sql.DataFrame) =
          Dedup.withMinhashSignature(side.select(col("doc_id"), col("text")),
            "text", "sig", shingleN = 3, k = 16,
            repartitionTo = Some(s.sparkContext.defaultParallelism))
            .select(col("doc_id"), col("sig"))
        Dedup.incrementalNearDupPairs(
          sigsOf(docs.filter(col("doc_id") % 3 === 0)), "doc_id", "sig",
          sigsOf(docs.filter(col("doc_id") % 3 =!= 0)), "doc_id", "sig",
          bands = 4, threshold = 0.5)
          .select(col("new_id"), col("hist_id"), round(col("est_jaccard"), 6).as("est_jaccard"))
      },
      None
    ),
    (
      "q95_incremental_portable",
      // Hash-exact twin of q94 (the q78 relationship): md5-based
      // signatures and literal band-slice buckets, so the ENTIRE
      // incremental probe — per-side bucket bounds, collided-subset
      // counting, cross-corpus candidate join, agreement scoring — is
      // value-checked against DuckDB rather than rows-only.
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.incrementalNearDupPairsPortable(
          docs.filter(col("doc_id") % 3 === 0),
          docs.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", shingleN = 3, k = 16, bands = 4, threshold = 0.5,
          repartitionTo = Some(s.sparkContext.defaultParallelism))
          .select(col("new_id"), col("hist_id"), round(col("est_jaccard"), 6).as("est_jaccard"))
      },
      Some {
        val (a, b) = Dedup.portableCoeffs(16, 42L)
        val sigExprs = (0 until 16)
          .map(i => s"list_min(list_transform(h, x -> (${a(i)} * x + ${b(i)}) % 2147483647))")
          .mkString(",\n                 ")
        s"""
        WITH toks AS (SELECT doc_id, ${duckTokens("text")} AS tk
                      FROM documents),
        sh AS (
          SELECT doc_id, CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
            ELSE list_transform(generate_series(1, len(tk) - 2),
                                i -> array_to_string(tk[i:i+2], ' ')) END AS ss
          FROM toks),
        hs AS (SELECT doc_id,
                      list_transform(ss, s -> CAST(md5_number_upper(s) % 2147483647 AS BIGINT)) AS h
               FROM sh),
        sigs AS (SELECT doc_id, [$sigExprs] AS sig FROM hs),
        bandrows AS (
          SELECT doc_id, b, array_to_string(sig[(b*4+1):(b*4+4)], ',') AS bucket
          FROM sigs CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) bs),
        batchrows AS (SELECT * FROM bandrows WHERE doc_id % 3 = 0),
        histrows  AS (SELECT * FROM bandrows WHERE doc_id % 3 <> 0),
        bsz AS (SELECT b, bucket, count(*) AS c FROM batchrows GROUP BY b, bucket),
        bkeep AS (
          SELECT br.* FROM batchrows br JOIN bsz USING (b, bucket) WHERE c <= 1000),
        bkeys AS (SELECT DISTINCT b, bucket FROM bkeep),
        coll AS (SELECT hr.* FROM histrows hr JOIN bkeys USING (b, bucket)),
        hsz AS (SELECT b, bucket, count(*) AS c FROM coll GROUP BY b, bucket),
        hkeep AS (SELECT coll.* FROM coll JOIN hsz USING (b, bucket) WHERE c <= 1000),
        cand AS (
          SELECT DISTINCT bk.doc_id AS new_id, hk.doc_id AS hist_id
          FROM bkeep bk JOIN hkeep hk USING (b, bucket)),
        est AS (
          SELECT c.new_id, c.hist_id,
                 CAST(len(list_filter(generate_series(1, 16), j -> s1.sig[j] = s2.sig[j])) AS DOUBLE) / 16
                   AS est_jaccard
          FROM cand c
          JOIN sigs s1 ON s1.doc_id = c.new_id
          JOIN sigs s2 ON s2.doc_id = c.hist_id)
        SELECT new_id, hist_id, round(est_jaccard, 6) AS est_jaccard
        FROM est WHERE est_jaccard >= 0.5
      """
      }
    ),
    (
      "q96_incremental_cosine",
      // Embedding-side incremental dedup, PRODUCTION path (float
      // hyperplane buckets — engine-specific, so rows-only; q97 is the
      // hash-exact twin): today's vectors (vec_id % 5 = 0) probed
      // against the persisted history corpus. Exact-cosine verify means
      // no false positives; history is never exchanged. The synthetic
      // embeddings top out near cosine 0.6, so the threshold sits at
      // 0.45 with wide banding (4 bits x 8 groups, ~0.8 recall) to keep
      // the output non-empty at both SFs — q50 keeps the 0.8 production
      // threshold (empty here) as the plan-cost benchmark.
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.incrementalCosinePairs(
          emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
          emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
          threshold = 0.45, bitsPerGroup = 4, groups = 8)
          .select(col("new_id"), col("hist_id"), round(col("cosine"), 4).as("cosine"))
      },
      None
    ),
    (
      "q97_incremental_cosine_portable",
      // Hash-exact twin of q96 (the q86 mold): integer hyperplanes over
      // quantized components make every sign bit, bucket, per-side
      // bound, candidate pair, and cosine DuckDB-replicable — the
      // incremental cosine probe is value-checked end to end.
      (s, dir) => {
        val emb = table(s, dir, "embeddings")
        Similarity.incrementalCosinePairsPortable(
          emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
          emb.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
          threshold = 0.45, bitsPerGroup = 4, groups = 8, seed = 42L)
          .select(col("new_id"), col("hist_id"), round(col("cosine"), 4).as("cosine"))
      },
      Some {
        val (a, b) = Dedup.portableCoeffs(32, 42L)
        def bucketExpr(g: Int): String = (0 until 4).map { j =>
          val h = g * 4 + j
          s"""(CASE WHEN list_sum(list_transform(qv, (x,i) -> x * ((${a(h)} * i + ${b(h)}) % 2147483647 - 1073741823))) > 0 THEN ${1L << j} ELSE 0 END)"""
        }.mkString("(", " + ", ")")
        val buckets = (0 until 8).map(bucketExpr).mkString(",\n                 ")
        s"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(floor(x*1000) AS BIGINT)) AS qv
          FROM embeddings
        ), bk AS (
          SELECT vec_id, unnest(range(0, 8)) AS band,
                 unnest([$buckets]) AS bucket
          FROM q
        ), batchrows AS (SELECT * FROM bk WHERE vec_id % 5 = 0),
        histrows  AS (SELECT * FROM bk WHERE vec_id % 5 <> 0),
        bsz AS (SELECT band, bucket, count(*) AS c FROM batchrows GROUP BY band, bucket),
        bkeep AS (
          SELECT br.* FROM batchrows br JOIN bsz USING (band, bucket) WHERE c <= 1000),
        bkeys AS (SELECT DISTINCT band, bucket FROM bkeep),
        coll AS (SELECT hr.* FROM histrows hr JOIN bkeys USING (band, bucket)),
        hsz AS (SELECT band, bucket, count(*) AS c FROM coll GROUP BY band, bucket),
        hkeep AS (SELECT coll.* FROM coll JOIN hsz USING (band, bucket) WHERE c <= 1000),
        cand AS (
          SELECT DISTINCT bk2.vec_id AS new_id, hk.vec_id AS hist_id
          FROM bkeep bk2 JOIN hkeep hk USING (band, bucket)),
        scored AS (
          SELECT c.new_id, c.hist_id,
                 list_cosine_similarity(be.embedding, he.embedding) AS cos
          FROM cand c
          JOIN embeddings be ON be.vec_id = c.new_id
          JOIN embeddings he ON he.vec_id = c.hist_id)
        SELECT new_id, hist_id, round(cos, 4) AS cosine
        FROM scored WHERE cos >= 0.45
      """
      }
    ),
    (
      "q98_incremental_clusters",
      // Day-2 cluster maintenance, PRODUCTION path (xxhash64 MinHash
      // pairs — engine-specific, so rows-only; q99 is the value-exact
      // twin): today's batch (doc_id % 3 = 0) is assigned to the
      // persisted corpus's EXISTING cluster labels via the incremental
      // probe's own outputs — within-batch CC, min-history-label
      // adoption, minted ids for batch-only clusters — without
      // re-clustering the corpus.
      (s, dir) => {
        val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
          .select("doc_id", "text")
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val hist = docs.filter(col("doc_id") % 3 =!= 0)
        val par = Some(s.sparkContext.defaultParallelism)
        // ONE signature frame per side (r21): the r20 shape computed each
        // side's MinHash signatures twice — once inside
        // minhashNearDupPairs (whose lshCandidatePairs caches its sig
        // projection) and once via a separate sigsOf lineage for the
        // cross probe that could never hit that cache. Feeding the SAME
        // (doc_id, sig) frame to both consumers makes the probe's
        // projection canonically equal to the cached one, so each side's
        // signature pipeline (repartition + fused MinHashSig) evaluates
        // once per query instead of twice. Identical recipe
        // (shingleN=1, k=64, seed 42, bands=16) → identical results.
        def sigsOf(side: org.apache.spark.sql.DataFrame) =
          Dedup.withMinhashSignature(side, "text", "sig", shingleN = 1, k = 64,
            repartitionTo = par).select(col("doc_id"), col("sig"))
        val batchSigs = sigsOf(batch)
        val histSigs = sigsOf(hist)
        def pairsOf(sigs: org.apache.spark.sql.DataFrame) =
          Dedup.lshCandidatePairs(sigs, "doc_id", "sig", bands = 16)
            .filter(col("est_jaccard") >= 0.6)
        // history CC runs eager jobs (checkpoint + bounded probe);
        // eagerOverlap runs it on a background thread and the await
        // lands in assign's BY-NAME history parameter, so it overlaps
        // the operator's own batch-CC + probe checkpoint chain instead
        // of serializing ahead of it (r21; guide §2.6 — the chains are
        // independent until the adopt join; r22 hardened the launch
        // with a cancellable job group), and a failure in assign's own
        // chain cancels the background jobs rather than orphaning them.
        val histLabelsH = Dedup.eagerOverlap(s, "q98: history CC")(
          Dedup.connectedComponents(pairsOf(histSigs),
            maxIter = 1, checkConvergence = false)) // clique graph (q63 convention)
        val batchPairs = pairsOf(batchSigs)
        val crossPairs = Dedup.incrementalNearDupPairs(
          batchSigs, "doc_id", "sig", histSigs, "doc_id", "sig",
          bands = 16, threshold = 0.6)
        try Dedup.assignIncrementalClusters(batch.select("doc_id"), "doc_id",
          batchPairs, crossPairs, histLabelsH.await())
        catch { case e: Throwable => histLabelsH.cancel(); throw e }
      },
      None
    ),
    (
      "q99_incremental_clusters_portable",
      // Value-exact twin of q98 (the q76 mold): the pair graph is the
      // DuckDB-replicable exact Jaccard of q41, history labels are the
      // recursive label closure, and the assignment — within-batch CC,
      // coalesce-to-self for unlabeled history docs, min-label
      // adoption per batch component, minted min-batch-id for
      // batch-only components — is replicated clause for clause, so
      // the day-2 maintenance semantics are verified against an
      // independent engine rather than rows-only.
      (s, dir) => {
        val docs = table(s, dir, "documents").filter(col("doc_id") < 200)
        val batch = docs.filter(col("doc_id") % 3 === 0)
        // THREE consumers read this quadratic subtree (hist CC, batch
        // CC, cross pairs) — materialize it once; the r20 serial A/B
        // measured the triple evaluation at ~2x the whole DuckDB wall
        val ap = Dedup.exactJaccardPairs(docs, "doc_id", "text", 0.55)
          .select(col("id1"), col("id2"))
          .localCheckpoint()
        val batchPairs = ap.filter(col("id1") % 3 === 0 && col("id2") % 3 === 0)
        val histPairs = ap.filter(col("id1") % 3 =!= 0 && col("id2") % 3 =!= 0)
        val crossPairs = ap.filter((col("id1") % 3 === 0) =!= (col("id2") % 3 === 0))
          .select(
            when(col("id1") % 3 === 0, col("id1")).otherwise(col("id2")).as("new_id"),
            when(col("id1") % 3 === 0, col("id2")).otherwise(col("id1")).as("hist_id"))
        // same overlapped launch + by-name await as q98: the history
        // CC's eager jobs run concurrently with assign's batch-CC/probe
        // chain (all three read the already-checkpointed shared pair
        // graph), under a cancellable job group
        val histLabelsH = Dedup.eagerOverlap(docs.sparkSession, "q99: history CC")(
          Dedup.connectedComponents(histPairs))
        try Dedup.assignIncrementalClusters(batch.select("doc_id"), "doc_id",
          batchPairs, crossPairs, histLabelsH.await())
        catch { case e: Throwable => histLabelsH.cancel(); throw e }
      },
      Some(s"""
        WITH RECURSIVE words AS (
          SELECT doc_id AS _id, unnest(list_distinct(${duckTokens("text")})) AS _w
          FROM documents WHERE doc_id < 200
        ), sizes AS (
          SELECT _id, count(*) AS _n FROM words GROUP BY _id
        ), inter AS (
          SELECT a._id AS a1, b._id AS a2, count(*) AS _inter
          FROM words a JOIN words b ON a._w = b._w AND a._id < b._id
          GROUP BY a._id, b._id
        ), pairs AS (
          SELECT a1 AS id1, a2 AS id2 FROM inter
          JOIN sizes s1 ON s1._id = a1
          JOIN sizes s2 ON s2._id = a2
          WHERE CAST(_inter AS DOUBLE) / (s1._n + s2._n - _inter) >= 0.55
        ), bp AS (
          SELECT id1, id2 FROM pairs WHERE id1 % 3 = 0 AND id2 % 3 = 0
        ), hp AS (
          SELECT id1, id2 FROM pairs WHERE id1 % 3 <> 0 AND id2 % 3 <> 0
        ), cp AS (
          SELECT CASE WHEN id1 % 3 = 0 THEN id1 ELSE id2 END AS new_id,
                 CASE WHEN id1 % 3 = 0 THEN id2 ELSE id1 END AS hist_id
          FROM pairs WHERE (id1 % 3 = 0) <> (id2 % 3 = 0)
        ), he AS (
          SELECT id1, id2 FROM hp UNION ALL SELECT id2 AS id1, id1 AS id2 FROM hp
        ), hr(id, m) AS (
          SELECT DISTINCT id1 AS id, id1 AS m FROM he
          UNION
          SELECT he.id1 AS id, hr.m FROM he JOIN hr ON hr.id = he.id2
        ), hlab AS (
          SELECT id, min(m) AS component FROM hr GROUP BY id
        ), be AS (
          SELECT id1, id2 FROM bp UNION ALL SELECT id2 AS id1, id1 AS id2 FROM bp
        ), br(id, m) AS (
          SELECT DISTINCT id1 AS id, id1 AS m FROM be
          UNION
          SELECT be.id1 AS id, br.m FROM be JOIN br ON br.id = be.id2
        ), bcc AS (
          SELECT id, min(m) AS comp FROM br GROUP BY id
        ), batchdocs AS (
          SELECT doc_id FROM documents WHERE doc_id < 200 AND doc_id % 3 = 0
        ), blab AS (
          SELECT d.doc_id AS id, coalesce(b.comp, d.doc_id) AS bcomp
          FROM batchdocs d LEFT JOIN bcc b ON b.id = d.doc_id
        ), adoptper AS (
          SELECT cp.new_id AS id, coalesce(h.component, cp.hist_id) AS hcomp
          FROM cp LEFT JOIN hlab h ON h.id = cp.hist_id
        ), adopt AS (
          SELECT bl.bcomp, min(a.hcomp) AS ad
          FROM adoptper a JOIN blab bl ON bl.id = a.id GROUP BY bl.bcomp
        )
        SELECT bl.id AS doc_id, coalesce(ad.ad, bl.bcomp) AS component
        FROM blab bl LEFT JOIN adopt ad USING (bcomp)
      """)
    )
  )
}
