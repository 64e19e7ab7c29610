package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.operators._

/** Driver-contract registry, text-analysis tier (t*) — split from the monolithic
  * SparkEntry in round 9 (pure mechanical move, entries verbatim).
  * `queries` holds the Spark-side fns, `oracleSql` the DuckDB
  * referee SQL; both are merged into the driver contract by
  * [[graft.SparkEntry]]. Contract rules (same-name aliasing, total
  * ORDER BY, CAST(SUM(..) AS BIGINT) on the oracle side) are
  * documented on SparkEntry and linted by tools/oraclelint.py.
  */
private[graft] object RegistryText {

  /** Unrolled k-round BPE training chain (the t26/t27 merge loop replayed
    * in SQL: same doubled-separator greedy `replace`, same (count desc,
    * pair asc) argmax — floats never appear, so training replays
    * bit-for-bit). Ends at vocabulary `w{k}` (word, segmentation, count).
    */
  private def bpeChainSql(k: Int): String = {
    def stage(i: Int): String = s""",
      |sym$i AS (
      |  SELECT list_filter(string_split(s, '||'), x -> x <> '') AS sa, wc FROM w${i - 1}
      |), p$i AS (
      |  SELECT p.a AS a, p.b AS b, SUM(wc) AS c FROM (
      |    SELECT unnest([struct_pack(a := sa[i], b := sa[i+1])
      |                   for i in generate_series(1, len(sa) - 1)]) AS p, wc
      |    FROM sym$i WHERE len(sa) >= 2)
      |  GROUP BY 1, 2
      |), t$i AS (
      |  SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1
      |), w$i AS (
      |  SELECT w, replace(w${i - 1}.s, '|' || t$i.a || '||' || t$i.b || '|',
      |                 '|' || t$i.a || t$i.b || '|') AS s, wc
      |  FROM w${i - 1}, t$i
      |)"""
    s"""WITH w0 AS (
      |  SELECT w,
      |         '||' || array_to_string(regexp_split_to_array(w, ''), '||') || '||' AS s,
      |         COUNT(*) AS wc
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE regexp_full_match(w, '[a-z]+')
      |  GROUP BY 1, 2
      |)${(1 to k).map(stage).mkString}""".stripMargin
  }

  private def bpeOracleSql(k: Int): String = {
    val finalSelect = (1 to k)
      .map(i => s"SELECT $i AS rank, a AS lhs, b AS rhs, CAST(c AS BIGINT) AS pair_count FROM t$i")
      .mkString("  ", "\n  UNION ALL ", "")
    s"""${bpeChainSql(k)}
SELECT * FROM (
$finalSelect
) ORDER BY rank"""
  }

  private def bpeEncodeOracleSql(k: Int): String =
    s"""${bpeChainSql(k)},
seg AS (
  SELECT w, list_filter(string_split(s, '||'), x -> x <> '') AS toks FROM w$k
), dw AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
       CAST(SUM(list_sum(list_transform(toks,
              t -> CASE WHEN length(t) > 1 THEN length(t) ELSE 0 END)))
            AS BIGINT) AS n_chars_coded
FROM dw JOIN seg USING (w)
GROUP BY doc_id ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t5_explode_tokens" -> ((s, dir) => TextOps.explodeTokens(Tables.documents(s, dir))),
    "t6_array_ops" -> ((s, dir) => TextOps.arrayOps(Tables.documents(s, dir))),
    // Gopher-style repetition quality: per-doc 2-gram totals / distincts /
    // top-count / duplicated instances, computed shuffle-free per row.
    "t14_repetition" -> ((s, dir) => TextOps.repetitionStats(Tables.documents(s, dir))),
    // Misra-Gries frequent items: constant-memory top terms per language
    // (exact at capacity > vocab -> oracle-proven; the sketch bound
    // contract is unit-tested). Capacity is CORPUS-PROPORTIONAL
    // (64 per 5000 docs, floored at 64): ScaleGen's per-replica token
    // suffixes multiply the vocabulary with the shard count, and the 10x
    // wide gate caught the fixed capacity 64 undercounting at sf1 exactly
    // as MG's epsilon bound predicts. Driver scales (<= 5000 docs) keep
    // capacity 64, bit-identical.
    "t15_heavy_hitters" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, length}
      val docs = Tables.documents(s, dir)
      // size capacity from docs that actually contribute terms (non-null,
      // non-empty text) — the same null-aware convention s12/s13 use for
      // their shortlists, so all corpus-proportional parameters share one
      // denominator definition
      val n = docs.filter(col("text").isNotNull && length(col("text")) > 0)
        .count()
      // capped at 2^20 counters: past that MG is honestly approximate
      // (its whole point at web scale) and a silent toInt wraparound
      // would be a negative capacity.
      TextOps.heavyHitterTerms(docs,
        capacity = math.min(1L << 20, math.max(64L, 64L * n / 5000L)).toInt)
    }),
    "t1_token_stats" -> ((s, dir) => TextOps.tokenStats(Tables.documents(s, dir))),
    "t2_lang_id" -> ((s, dir) => TextOps.langId(Tables.documents(s, dir))),
    // Label-vs-prediction agreement audit over the lang-ID heuristic.
    "t19_lang_confusion" -> ((s, dir) => TextOps.langConfusion(Tables.documents(s, dir))),
    "t3_fingerprints" -> ((s, dir) => TextOps.fingerprints(Tables.documents(s, dir))),
    "t4_lang_stats" -> ((s, dir) => TextOps.langStats(Tables.documents(s, dir))),
    // Vocabulary statistics: document frequency per (lang, term), top-10
    // per language — the inverted-index/vocab-build shape, all-integer.
    "t9_vocab_topk" -> ((s, dir) => TextOps.termDocFrequency(Tables.documents(s, dir), 10)),
    // Token-budget sequence chunking: contiguous fill per language stream,
    // chunk_id from a keyed window running sum — training-batch prep.
    "t10_pack_chunks" -> ((s, dir) => TextOps.packSequences(Tables.documents(s, dir), 512)),
    // Cross-document boilerplate lexicon: 8-grams shared by >= 3 docs.
    "t11_boilerplate_ngrams" -> ((s, dir) => TextOps.repeatedNgrams(Tables.documents(s, dir), 8, 3)),
    "t21_boilerplate_strip" -> ((s, dir) => TextOps.stripBoilerplate(Tables.documents(s, dir), 8, 3)),
    // Maximal cross-doc repeated token spans (exact-substring-dup report):
    // covered positions merged gaps-and-islands style; rows ∝ spans.
    "t24_repeated_spans" -> ((s, dir) => TextOps.repeatedSpans(Tables.documents(s, dir), 8, 3)),
    // PII scan: per-row email/phone/IPv4 match counts over synthesized
    // ticket text (fixture corpus is PII-free); row-local, scan-bound.
    "t25_pii_scan" -> ((s, dir) => TextOps.piiScan(
      Tables.customer(s, dir).selectExpr("c_custkey", TextOps.piiTicketSql + " AS ticket"),
      "c_custkey", "ticket")),
    // PII scrub contract: typed-placeholder replacement, byte-compared
    // against DuckDB's RE2 scrub; residual_pii pinned to 0 per row.
    // Distributed BPE tokenizer training: top-5 merges over the corpus
    // word-frequency table, greedy left-to-right semantics replayable in
    // SQL (doubled-separator replace trick) - integer counts throughout.
    "t26_bpe_merges" -> ((s, dir) => TextOps.bpeMerges(Tables.documents(s, dir), 5)),
    // PMI collocations: integer-rational association score, min-support
    // gated - the phrase-mining step of vocabulary induction.
    "t28_collocations" -> ((s, dir) => TextOps.collocations(Tables.documents(s, dir))),
    // BPE serving: vocab-sized segmentation broadcast into the corpus
    // scan; per-doc word/token counts + characters covered by merges.
    "t27_bpe_encode" -> ((s, dir) => TextOps.bpeEncode(Tables.documents(s, dir), 5)),
    "t25b_pii_scrub" -> ((s, dir) => TextOps.piiScrub(
      Tables.customer(s, dir).selectExpr("c_custkey", TextOps.piiTicketSql + " AS ticket"),
      "c_custkey", "ticket")),
    // Integer-exact BM25 (rational idf variant): top-20 docs for a
    // three-term bag-of-words query.
    "t22_bm25" -> ((s, dir) => TextOps.bm25Rank(Tables.documents(s, dir),
      Seq("spark", "vector", "merge"), 20)),
    // CCNet-style unigram-LM quality score, trained on the nb<12 slice.
    "t23_lm_quality" -> ((s, dir) => TextOps.lmQualityScore(Tables.documents(s, dir), 12)),
    // Deterministic content-addressed sampling (reproducible pipeline
    // subsetting): keep iff first md5(doc_id) nibble < 6 → expected 6/16.
    "t7_hash_sample" -> ((s, dir) => TextOps.deterministicSample(
      Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"), "doc_id", 6)),
    // Stratified variant: downsample the over-represented language
    // (en → 6/16) while keeping the tail at 12/16 — a map-side filter,
    // no shuffle.
    "t8_stratified_sample" -> ((s, dir) => TextOps.stratifiedSample(
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars"), "doc_id", "lang",
      Map("en" -> 6), defaultSixteenths = 12)),
    // Per-document keyword extraction, tf-idf-shaped with integer-exact
    // rational scoring (tf·10⁶ ÷ df floor division — FP idf logs differ
    // across engines in the last ulp; floor division doesn't).
    "t12_doc_keywords" -> ((s, dir) => TextOps.docKeywords(Tables.documents(s, dir), 3)),
    // Positional-index phrase search: postings filtered to the two query
    // terms BEFORE the adjacency equi-join — index-sized work, not corpus.
    "t13_phrase_search" -> ((s, dir) => TextOps.phraseSearch(Tables.documents(s, dir), "order", "fast")),
    // Canonicalization audit: lowercase + punctuation strip + whitespace
    // collapse per doc, with the normalized md5 prefix as the
    // formatting-insensitive dedup key; row-local, shuffle-free.
    "t29_normalize" -> ((s, dir) => TextOps.normalizeStats(Tables.documents(s, dir))),
    // Domain caps: at most 10 docs per source, deterministic keep-set,
    // WindowGroupLimit caps the shuffle at cap rows/source per map task.
    "t16_source_caps" -> ((s, dir) => TextOps.sourceCaps(Tables.documents(s, dir), 10)),
    // Tokenizer-coverage check: per-doc OOV rate vs the top-50 corpus
    // vocabulary (broadcast as ONE array row; no (doc,term) shuffle).
    "t17_oov_rate" -> ((s, dir) => TextOps.oovRate(Tables.documents(s, dir), 50)),
    // Corpus top-20 5-gram phrases via the native streaming Generator
    // (the UDTF leg of the custom-extension trio).
    "t20_top_shingles" -> ((s, dir) => TextOps.topShingles(Tables.documents(s, dir))),
    // Overlapping token-window chunking (32-token windows, stride 24 ->
    // 8-token overlap): the embedding-prep cut that loses no boundary.
    "t18_chunk_overlap" -> ((s, dir) =>
      TextOps.chunkWithOverlap(Tables.documents(s, dir), 32, 24)
        .orderBy("doc_id", "chunk_idx")),
    // Heaps-law vocab growth: token → first-doc MIN, checkpoint binning,
    // cumulative over bins — never k distinct-count corpus scans.
    "t42_vocab_growth" -> ((s, dir) =>
      TextOps.vocabGrowth(Tables.documents(s, dir))),
    // Weighted systematic sampling: exactly 5 picks per language,
    // probability ∝ n_chars, pure integer-division grid test — the
    // engine-exact alternative to FP exponential-key (A-ES) sampling.
    "t30_weighted_sample" -> ((s, dir) => TextOps.weightedSample(
      Tables.documents(s, dir), "doc_id", "lang", "n_chars", 5)),
    // Corpus-wide segment dedup (repeated-paragraph removal, keep first
    // occurrence) with per-doc reconstruction — three linear stages.
    "t31_segment_dedup" -> ((s, dir) =>
      TextOps.segmentDedup(Tables.documents(s, dir))),
    // Chi-squared token<->label association, DECIMAL(38) exact: the top
    // tokens whose presence is most associated with lang='en'.
    "t32_chi2_tokens" -> ((s, dir) =>
      Evaluation.chi2Association(Tables.documents(s, dir))),
    // Inverted-index build: df/cf + top-3 postings by (tf desc, doc_id)
    // per token, bounded group state via the windowed-rank guard.
    "t33_inverted_index" -> ((s, dir) =>
      TextOps.invertedIndex(Tables.documents(s, dir))),
    // Type-token ratio + hapax share per source, floor permille.
    "t34_lexical_diversity" -> ((s, dir) =>
      TextOps.lexicalDiversity(Tables.documents(s, dir))),
    // Exact-percentile curation cut (top 30% by the 0-4 quality score):
    // histogram-walk threshold, ties kept, per-language kept counts.
    "t35_quality_cut" -> ((s, dir) =>
      TextOps.qualityPercentileCut(Tables.documents(s, dir))),
    // Length-bucketed batching with per-batch padding-waste accounting;
    // fixed-width buckets keep every window keyed (no global ntile).
    "t36_length_batches" -> ((s, dir) =>
      TextOps.lengthBatches(Tables.documents(s, dir))),
    // Row-local character-class permilles — the pre-tokenizer QA screen.
    "t37_char_profile" -> ((s, dir) =>
      TextOps.charClassProfile(Tables.documents(s, dir))),
    // Share of bigrams outside the corpus head — templatedness signal.
    "t38_bigram_novelty" -> ((s, dir) =>
      TextOps.bigramNovelty(Tables.documents(s, dir))),
    // Vocab-size vs corpus-coverage checkpoints (tokenizer sizing curve).
    "t39_vocab_coverage" -> ((s, dir) =>
      TextOps.vocabCoverage(Tables.documents(s, dir))),
    // Pairwise source vocabulary Jaccard (distributional overlap).
    "t40_source_overlap" -> ((s, dir) =>
      TextOps.sourceVocabOverlap(Tables.documents(s, dir))),
    // Integer Flesch reading-ease deciles per language.
    "t41_readability" -> ((s, dir) =>
      TextOps.readabilityCensus(Tables.documents(s, dir))),
  )

  val oracleSql: Map[String, String] = Map(
    "t5_explode_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS token
        |FROM t, UNNEST(generate_series(1, len(toks))) AS g(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "t6_array_ops" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        | CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
        | array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3_sorted,
        | list_contains(toks, 'spark') AS has_spark,
        | CAST(len(list_filter(toks, x -> x NOT IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS n_content_tokens,
        | CAST(list_position(toks, 'spark') AS INT) AS spark_pos
        |FROM t ORDER BY doc_id""".stripMargin,
    "t14_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, len(toks) - 1),
        |           i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
        |)
        |SELECT doc_id,
        |       CAST(SUM(c) AS BIGINT) AS n_grams,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
        |       CAST(MAX(c) AS BIGINT) AS top_gram_count,
        |       CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |         AS dup_gram_count
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t15_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
        |), c AS (
        |  SELECT lang, term, COUNT(*) AS cnt FROM tok GROUP BY lang, term
        |), r AS (
        |  SELECT lang, term, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |                            ORDER BY cnt DESC, term) AS rank
        |  FROM c
        |)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, term,
        |       CAST(cnt AS BIGINT) AS cnt
        |FROM r WHERE rank <= 10 ORDER BY lang, rank""".stripMargin,
    "t1_token_stats" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         length(text) AS nc
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, nc, CAST(len(toks) AS INT) AS nt,
        |   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INT) AS nb,
        |   CAST(len(list_filter(toks, x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS INT) AS nsw,
        |   CAST(len(list_filter(toks, x -> length(x) > 25)) AS INT) AS nlong
        |  FROM t
        |)
        |SELECT doc_id, nt AS n_tokens, nb AS n_bpeish, nc AS n_chars_calc,
        |  nsw AS n_stopwords,
        |  (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |   + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10 THEN 1 ELSE 0 END
        |   + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |   + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS quality_score
        |FROM c ORDER BY doc_id""".stripMargin,
    "t2_lang_id" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nsw,
        |   len(string_split(text, ' ')) AS nt
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS predicted_lang
        |FROM c ORDER BY doc_id""".stripMargin,
    "t19_lang_confusion" ->
      """WITH c AS (
        |  SELECT lang,
        |   len(list_filter(string_split(text, ' '), x -> x IN ('the','a','an','and','of','to','in','is','it','that'))) AS nsw,
        |   len(string_split(text, ' ')) AS nt
        |  FROM documents
        |), p AS (
        |  SELECT lang,
        |    CASE WHEN nsw * 20 >= nt THEN 'en' ELSE 'unknown' END AS predicted_lang
        |  FROM c
        |)
        |SELECT lang, predicted_lang, COUNT(*) AS n_docs
        |FROM p GROUP BY lang, predicted_lang
        |ORDER BY lang, predicted_lang""".stripMargin,
    "t3_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, md5(text) AS fp_md5,
        |   CASE WHEN len(toks) >= 3
        |        THEN list_transform(generate_series(1, len(toks) - 2),
        |             i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |        ELSE [text] END AS shingles
        |  FROM t
        |)
        |SELECT doc_id, fp_md5,
        |  list_aggregate(list_transform(shingles, x -> md5(x)), 'min') AS fp_min_shingle
        |FROM s ORDER BY doc_id""".stripMargin,
    "t4_lang_stats" ->
      "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars, COUNT(DISTINCT source) AS n_sources FROM documents GROUP BY lang ORDER BY lang",
    "t9_vocab_topk" ->
      """WITH dt AS (
        |  SELECT lang, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents
        |), df AS (
        |  SELECT lang, term, COUNT(*) AS doc_freq FROM dt GROUP BY lang, term
        |)
        |SELECT lang, CAST(ROW_NUMBER() OVER w AS INT) AS rank, term, doc_freq
        |FROM df
        |WINDOW w AS (PARTITION BY lang ORDER BY doc_freq DESC, term)
        |QUALIFY ROW_NUMBER() OVER w <= 10
        |ORDER BY lang, rank""".stripMargin,
    "t10_pack_chunks" ->
      """SELECT doc_id, lang,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | CAST(floor((SUM(len(string_split(text, ' ')))
        |        OVER (PARTITION BY lang ORDER BY doc_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - len(string_split(text, ' '))) / 512) AS INT) AS chunk_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t11_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), s AS (
        |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
        |    THEN list_transform(generate_series(1, len(toks)-7),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                          toks[i+4], toks[i+5], toks[i+6], toks[i+7]))
        |    ELSE [] END)) AS gram
        |  FROM t
        |)
        |SELECT gram, COUNT(*) AS n_docs FROM s GROUP BY gram
        |HAVING COUNT(*) >= 3
        |ORDER BY n_docs DESC, gram""".stripMargin,
    "t21_boilerplate_strip" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), occ AS (
        |  SELECT doc_id, i AS start,
        |    concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                   toks[i+4], toks[i+5], toks[i+6], toks[i+7]) AS gram
        |  FROM t, unnest(CASE WHEN len(toks) >= 8
        |      THEN generate_series(1, len(toks)-7)
        |      ELSE [] END) AS u(i)
        |), lex AS (
        |  SELECT gram FROM (SELECT gram, doc_id FROM occ GROUP BY gram, doc_id)
        |  GROUP BY gram HAVING COUNT(*) >= 3
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT occ.doc_id,
        |           unnest(generate_series(occ.start, occ.start + 7)) AS pos
        |    FROM occ JOIN lex USING (gram)
        |  )
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |         unnest(generate_series(1, len(toks))) AS pos
        |  FROM t
        |), kept AS (
        |  SELECT tok.doc_id, tok.token, tok.pos FROM tok
        |  WHERE NOT EXISTS (SELECT 1 FROM cov
        |                    WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
        |), reb AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |         string_agg(token, ' ' ORDER BY pos) AS clean_text
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id, len(t.toks) AS n_tokens,
        |       len(t.toks) - COALESCE(reb.n_kept, 0) AS n_removed,
        |       COALESCE(reb.clean_text, '') AS clean_text
        |FROM t LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t24_repeated_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), occ AS (
        |  SELECT doc_id, i AS start,
        |    concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
        |                   toks[i+5], toks[i+6], toks[i+7], toks[i+8]) AS gram
        |  FROM t, unnest(CASE WHEN len(toks) >= 8
        |      THEN generate_series(0, len(toks)-8)
        |      ELSE [] END) AS u(i)
        |), lex AS (
        |  SELECT gram FROM (SELECT gram, doc_id FROM occ GROUP BY gram, doc_id)
        |  GROUP BY gram HAVING COUNT(*) >= 3
        |), cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT occ.doc_id,
        |           unnest(generate_series(occ.start, occ.start + 7)) AS pos
        |    FROM occ JOIN lex USING (gram)
        |  )
        |), isl AS (
        |  SELECT doc_id, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM cov
        |)
        |SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start,
        |       CAST(MAX(pos) + 1 AS INT) AS span_end,
        |       CAST(COUNT(*) AS BIGINT) AS span_tokens
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "t25_pii_scan" ->
      s"""WITH t AS (
        |  SELECT c_custkey, ${TextOps.piiTicketSql} AS ticket FROM customer
        |)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(0)._2}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(1)._2}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(ticket,
        |    '${TextOps.piiPatterns(2)._2}')) AS BIGINT) AS n_ipv4,
        |  greatest(len(regexp_extract_all(ticket, '${TextOps.piiPatterns(0)._2}')),
        |           len(regexp_extract_all(ticket, '${TextOps.piiPatterns(1)._2}')),
        |           len(regexp_extract_all(ticket, '${TextOps.piiPatterns(2)._2}'))) > 0
        |    AS has_pii
        |FROM t ORDER BY c_custkey""".stripMargin,
    "t26_bpe_merges" -> bpeOracleSql(5),
    "t28_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT unnest(toks) AS w FROM t),
        |uc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
        |b AS (SELECT unnest([struct_pack(a := toks[i], b := toks[i+1])
        |                     for i in generate_series(1, len(toks) - 1)]) AS p
        |      FROM t WHERE len(toks) >= 2),
        |bc AS (SELECT p.a AS w1, p.b AS w2, COUNT(*) AS c12
        |       FROM b GROUP BY 1, 2),
        |tot AS (SELECT (SELECT COUNT(*) FROM u) AS n,
        |               (SELECT COUNT(*) FROM b) AS m)
        |SELECT bc.w1, bc.w2, CAST(bc.c12 AS BIGINT) AS c12,
        |       CAST(bc.c12 * tot.n * tot.n // (tot.m * u1.c * u2.c)
        |            AS BIGINT) AS pmi_score
        |FROM bc CROSS JOIN tot
        |JOIN uc u1 ON u1.w = bc.w1
        |JOIN uc u2 ON u2.w = bc.w2
        |WHERE bc.c12 >= 5
        |ORDER BY pmi_score DESC, w1, w2 LIMIT 20""".stripMargin,
    "t27_bpe_encode" -> bpeEncodeOracleSql(5),
    "t25b_pii_scrub" ->
      s"""WITH t AS (
        |  SELECT c_custkey, ${TextOps.piiTicketSql} AS ticket FROM customer
        |), s AS (
        |  SELECT c_custkey,
        |    regexp_replace(regexp_replace(regexp_replace(ticket,
        |      '${TextOps.piiPatterns(0)._2}', '<EMAIL>', 'g'),
        |      '${TextOps.piiPatterns(1)._2}', '<PHONE>', 'g'),
        |      '${TextOps.piiPatterns(2)._2}', '<IP>', 'g') AS scrubbed
        |  FROM t
        |)
        |SELECT c_custkey, scrubbed,
        |  CAST(len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(0)._2}'))
        |     + len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(1)._2}'))
        |     + len(regexp_extract_all(scrubbed, '${TextOps.piiPatterns(2)._2}'))
        |    AS BIGINT) AS residual_pii
        |FROM s ORDER BY c_custkey""".stripMargin,
    "t22_bm25" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |         CAST(SUM(len(toks)) AS BIGINT) AS total_tokens FROM t
        |), post AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        |  FROM t
        |), tf AS (
        |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM post
        |  WHERE term IN ('spark', 'vector', 'merge')
        |  GROUP BY doc_id, dl, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id,
        |    CAST(CAST(10000 AS HUGEINT)
        |         * (2 * s.n_docs - 2 * df.df + 1) * tf.tf * 22 * s.total_tokens
        |    // ((2 * df.df + 1)
        |        * (CAST(10 AS HUGEINT) * tf.tf * s.total_tokens
        |           + 3 * s.total_tokens
        |           + 9 * tf.dl * s.n_docs)) AS BIGINT) AS term_score_e4
        |  FROM tf JOIN df USING (term), stats s
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(term_score_e4) AS BIGINT) AS score_e4,
        |         COUNT(*) AS n_terms_hit
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT CAST(ROW_NUMBER() OVER w AS INT) AS rank, doc_id, score_e4,
        |       n_terms_hit
        |FROM agg
        |WINDOW w AS (ORDER BY score_e4 DESC, doc_id)
        |QUALIFY ROW_NUMBER() OVER w <= 20
        |ORDER BY rank""".stripMargin,
    "t23_lm_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nb
        |  FROM documents
        |), model AS (
        |  SELECT term, COUNT(*) AS cnt FROM (
        |    SELECT unnest(toks) AS term FROM t WHERE nb < 12
        |  ) GROUP BY term
        |), tok AS (
        |  SELECT doc_id, unnest(toks) AS term FROM t
        |), scored AS (
        |  SELECT doc_id,
        |         CAST(length(bin(COALESCE(m.cnt, 0) + 1)) - 1 AS BIGINT) AS flog2
        |  FROM tok LEFT JOIN model m USING (term)
        |), agg AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |         CAST(SUM(flog2) AS BIGINT) AS lm_mass
        |  FROM scored GROUP BY doc_id
        |)
        |SELECT doc_id, n_tokens, lm_mass,
        |       10000 * lm_mass // n_tokens AS score_e4
        |FROM agg ORDER BY doc_id""".stripMargin,
    "t7_hash_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 6
        |ORDER BY doc_id""".stripMargin,
    "t8_stratified_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
        |      < CASE WHEN lang = 'en' THEN 6 ELSE 12 END
        |ORDER BY doc_id""".stripMargin,
    "t12_doc_keywords" ->
      """WITH tc AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM tc GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |         tf.tf * 1000000 // df.df AS score
        |  FROM tf JOIN df USING (term)
        |)
        |SELECT doc_id, CAST(ROW_NUMBER() OVER w AS INT) AS rank, term,
        |       score, tf, df
        |FROM scored
        |WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, term)
        |QUALIFY ROW_NUMBER() OVER w <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "t13_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), o AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(generate_series(1, len(toks) - 1),
        |      i -> toks[i] = 'order' AND toks[i+1] = 'fast')) AS BIGINT) AS n_occurrences
        |  FROM t
        |)
        |SELECT doc_id, n_occurrences FROM o
        |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin,
    "t29_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents WHERE text IS NOT NULL
        |)
        |SELECT doc_id,
        |       CAST(LENGTH(text) AS BIGINT) AS n_chars_raw,
        |       CAST(LENGTH(norm) AS BIGINT) AS n_chars_norm,
        |       CAST(LEN(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm,
        |       SUBSTR(md5(norm), 1, 8) AS norm_key
        |FROM n ORDER BY doc_id""".stripMargin,
    "t16_source_caps" ->
      """SELECT source, doc_id, lang, n_chars, rk FROM (
        |  SELECT source, doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
        |  FROM documents
        |) WHERE rk <= 10 ORDER BY source, doc_id""".stripMargin,
    "t17_oov_rate" ->
      """WITH vocab AS (
        |  SELECT term FROM (
        |    SELECT unnest(list_distinct(string_split(text, ' '))) AS term
        |    FROM documents
        |  ) GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT 50
        |), va AS (
        |  SELECT list(term ORDER BY term) AS arr FROM vocab
        |)
        |SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_filter(string_split(text, ' '),
        |      t -> NOT list_contains(arr, t))) AS n_oov,
        |  CAST(len(list_filter(string_split(text, ' '),
        |       t -> NOT list_contains(arr, t))) * 1000
        |       // len(string_split(text, ' ')) AS BIGINT) AS oov_permille
        |FROM documents, va ORDER BY doc_id""".stripMargin,
    "t20_top_shingles" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(generate_series(1, len(toks) - 4),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                   toks[i+3], toks[i+4]))) AS gram
        |  FROM t WHERE len(toks) >= 5
        |)
        |SELECT gram, COUNT(*) AS n_occurrences
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram LIMIT 20""".stripMargin,
    "t18_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      CAST((greatest(len(toks) - 32, 0) + 23) // 24 AS BIGINT))) AS chunk_idx
        |  FROM t
        |)
        |SELECT doc_id, chunk_idx,
        |  len(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS n_tokens,
        |  array_to_string(list_slice(toks, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "t42_vocab_growth" ->
      """WITH fd AS (
        |  SELECT toks[i] || ' ' || toks[i + 1] AS tok,
        |         MIN(doc_id) AS first_doc
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents),
        |       UNNEST(range(1, len(toks))) AS t(i)
        |  GROUP BY 1
        |), b AS (
        |  SELECT CASE WHEN first_doc <= 50 THEN 50
        |              WHEN first_doc <= 100 THEN 100
        |              WHEN first_doc <= 200 THEN 200
        |              WHEN first_doc <= 500 THEN 500
        |              WHEN first_doc <= 1000 THEN 1000
        |              WHEN first_doc <= 2000 THEN 2000
        |              WHEN first_doc <= 5000 THEN 5000
        |         END AS checkpoint
        |  FROM fd
        |)
        |SELECT CAST(checkpoint AS BIGINT) AS checkpoint,
        |  CAST(COUNT(*) AS BIGINT) AS n_new_tokens,
        |  CAST(SUM(COUNT(*)) OVER (ORDER BY checkpoint
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS vocab_size
        |FROM b WHERE checkpoint IS NOT NULL
        |GROUP BY checkpoint ORDER BY checkpoint""".stripMargin,
    "t30_weighted_sample" ->
      """WITH d AS (
        |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w
        |  FROM documents WHERE n_chars > 0
        |), c AS (
        |  SELECT lang, doc_id, w,
        |    SUM(w) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(w) OVER (PARTITION BY lang) AS tot
        |  FROM d
        |)
        |SELECT lang, doc_id, w,
        |       CAST((cw * 5) // tot - ((cw - w) * 5) // tot AS BIGINT) AS n_hits
        |FROM c
        |WHERE (cw * 5) // tot > ((cw - w) * 5) // tot
        |ORDER BY lang, doc_id""".stripMargin,
    "t31_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |         array_to_string(toks[(i-1)*8+1 : (i-1)*8+8], ' ') AS seg
        |  FROM t, UNNEST(generate_series(1, ((len(toks) - 1) // 8) + 1)) AS u(i)
        |), k AS (
        |  SELECT doc_id, pos, seg,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM segs
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
        |                           ORDER BY pos), '') AS cleaned_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t32_chi2_tokens" ->
      """WITH tot AS (
        |  SELECT COUNT(*) AS nd,
        |         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np
        |  FROM documents
        |), d AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
        |         unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents
        |), g AS (
        |  SELECT tok, COUNT(*) AS df, SUM(is_en) AS a
        |  FROM d GROUP BY 1
        |  HAVING COUNT(*) >= 50 AND COUNT(*) < (SELECT nd FROM tot)
        |), t AS (
        |  SELECT tok, a, df - a AS b, tot.np - a AS c,
        |         tot.nd - tot.np - (df - a) AS d, tot.nd AS nd,
        |         a * (tot.nd - tot.np - (df - a)) - (df - a) * (tot.np - a) AS det
        |  FROM g CROSS JOIN tot
        |)
        |SELECT tok, CAST(a AS BIGINT) AS n_en_with,
        |       CAST(b AS BIGINT) AS n_other_with,
        |       CAST(CAST(1000000 AS HUGEINT) * nd * det * det
        |            // (CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d))
        |            AS BIGINT) AS chi2_micro,
        |       CAST(CASE WHEN det > 0 THEN 1 WHEN det < 0 THEN -1 ELSE 0 END
        |            AS BIGINT) AS direction
        |FROM t ORDER BY chi2_micro DESC, tok LIMIT 25""".stripMargin,
    "t33_inverted_index" ->
      """WITH tf AS (
        |  SELECT tok, doc_id, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT tok, doc_id, tf,
        |         row_number() OVER (PARTITION BY tok
        |           ORDER BY tf DESC, doc_id) AS rn
        |  FROM tf
        |)
        |SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
        |       CAST(SUM(tf) AS BIGINT) AS cf,
        |       string_agg(CASE WHEN rn <= 3
        |                       THEN doc_id || ':' || tf END, ',' ORDER BY rn)
        |         AS top_postings
        |FROM r GROUP BY tok HAVING COUNT(*) >= 20 ORDER BY tok""".stripMargin,
    "t34_lexical_diversity" ->
      """WITH tc AS (
        |  SELECT source, tok, COUNT(*) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT source,
        |       CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |       CAST(COUNT(*) * 1000 // SUM(c) AS BIGINT) AS ttr_permille,
        |       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*)
        |            AS BIGINT) AS hapax_permille
        |FROM tc GROUP BY source ORDER BY source""".stripMargin,
    "t35_quality_cut" ->
      """WITH c AS (
        |  SELECT doc_id, lang, length(text) AS nc,
        |    CAST(len(string_split(text, ' ')) AS INT) AS nt,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','an','and','of','to','in','is','it','that')))
        |      AS INT) AS nsw,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> length(x) > 25)) AS INT) AS nlong
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    (CASE WHEN nc >= 100 AND nc <= 5000 THEN 1 ELSE 0 END
        |     + CASE WHEN (nc - nt + 1) >= nt * 3 AND (nc - nt + 1) <= nt * 10
        |       THEN 1 ELSE 0 END
        |     + CASE WHEN nsw * 20 >= nt THEN 1 ELSE 0 END
        |     + CASE WHEN nlong = 0 THEN 1 ELSE 0 END) AS score
        |  FROM c
        |), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
        |h AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt FROM s
        |      GROUP BY score),
        |cum AS (SELECT score, SUM(cnt) OVER (ORDER BY score) AS cum FROM h),
        |thr AS (SELECT CAST(MIN(score) AS INT) AS threshold FROM cum, n
        |        WHERE cum * 10 >= n * 7)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(MAX(threshold) AS INT) AS threshold
        |FROM s, thr GROUP BY lang ORDER BY lang""".stripMargin,
    "t36_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
        |    (ROW_NUMBER() OVER (PARTITION BY n_tokens // 64
        |       ORDER BY doc_id) - 1) // 32 AS batch_id
        |  FROM t
        |)
        |SELECT bucket, batch_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(MAX(n_tokens) * COUNT(*) - SUM(n_tokens) AS BIGINT)
        |    AS padding_waste
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t37_char_profile" ->
      """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[A-Z]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS upper_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS digit_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS space_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS punct_permille,
        |  CAST((LENGTH(text) - LENGTH(regexp_replace(text, '[^ -~]', '', 'g')))
        |       * 1000 // LENGTH(text) AS BIGINT) AS nonascii_permille
        |FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0
        |ORDER BY doc_id""".stripMargin,
    "t38_bigram_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), d AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |         i -> concat(toks[i], ' ', toks[i + 1]))) AS bigram
        |  FROM t WHERE len(toks) >= 2
        |), c AS (
        |  SELECT bigram, COUNT(*) AS c FROM d GROUP BY 1
        |), head AS (
        |  SELECT bigram FROM c ORDER BY c DESC, bigram LIMIT 200
        |)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(CASE WHEN h.bigram IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       CAST(SUM(CASE WHEN h.bigram IS NULL THEN 1 ELSE 0 END)
        |            * 1000 // COUNT(*) AS BIGINT) AS novelty_permille
        |FROM d LEFT JOIN head h USING (bigram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t39_vocab_coverage" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents WHERE text IS NOT NULL
        |), c AS (
        |  SELECT token, COUNT(*) AS c FROM tok
        |  WHERE length(token) > 0 GROUP BY 1
        |), r AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank,
        |         SUM(c) OVER (ORDER BY c DESC, token
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c
        |), t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c)
        |SELECT CAST(rank AS BIGINT) AS vocab_size, CAST(cum AS BIGINT) AS covered,
        |       total, CAST(cum * 1000 // total AS BIGINT) AS coverage_permille
        |FROM r, t WHERE rank IN (5, 10, 15, 20, 25, 30)
        |ORDER BY vocab_size""".stripMargin,
    "t40_source_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, t AS token FROM (
        |    SELECT source, unnest(string_split(lower(text), ' ')) AS t
        |    FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        |  ) WHERE length(t) > 0
        |), sz AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM st GROUP BY 1
        |), i AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT i.source_a, i.source_b, i.n_common,
        |       za.n_tokens AS n_a, zb.n_tokens AS n_b,
        |       CAST(i.n_common * 1000 // (za.n_tokens + zb.n_tokens - i.n_common)
        |            AS BIGINT) AS jaccard_permille
        |FROM i JOIN sz za ON i.source_a = za.source
        |       JOIN sz zb ON i.source_b = zb.source
        |ORDER BY source_a, source_b""".stripMargin,
    "t41_readability" ->
      """WITH s AS (
        |  SELECT lang,
        |    greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |      AS BIGINT), 1) AS w,
        |    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT), 1) AS snt,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syl
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), sc AS (
        |  SELECT lang, w,
        |    206835 - (1015 * w) // snt - (84600 * syl) // w AS score_milli
        |  FROM s
        |)
        |SELECT lang, CAST(score_milli // 10000 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(w) AS BIGINT) AS n_words,
        |  CAST(MIN(score_milli) AS BIGINT) AS min_score_milli,
        |  CAST(MAX(score_milli) AS BIGINT) AS max_score_milli
        |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
