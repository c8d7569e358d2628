package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** LLM training-data pipeline tier: dedup_*, sim_*, text_*, prep_* —
  * deduplication, similarity search, text analysis, dataset preparation.
  *
  * Split from the monolithic SparkEntry registry (round-12 hygiene);
  * keys and SQL are unchanged.
  */
object LlmRegistry {
  import OracleSql._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_approx_hll"      -> (LlmQueries.dedupApproxHll _),
    "dedup_exact"           -> (LlmQueries.dedupExact _),
    "dedup_keep_best"       -> (LlmQueries.dedupKeepBest _),
    "dedup_minhash_lsh"     -> (LlmQueries.dedupMinhashLsh _),
    "dedup_cluster"         -> (LlmQueries.dedupCluster _),
    "pipeline_prep"         -> (LlmQueries.pipelinePrep _),
    "dedup_ngram_jaccard"   -> (LlmQueries.dedupNgramJaccard _),
    "dedup_fuzzy"           -> (LlmQueries.dedupFuzzy _),
    "dedup_simhash"         -> (LlmQueries.dedupSimhash _),
    "dedup_simhash_pairs"   -> (LlmQueries.dedupSimhashPairs _),
    "dedup_incremental"     -> (LlmQueries.dedupIncremental _),
    "dedup_paragraph"       -> (LlmQueries.dedupParagraph _),
    "dedup_embedding"       -> (LlmQueries.dedupEmbedding _),
    "dedup_semantic"        -> (LlmQueries.dedupSemantic _),
    "sim_knn_topk"          -> (LlmQueries.simKnnTopK _),
    "sim_reciprocal_nn"     -> (LlmQueries.simReciprocalNn _),
    "sim_reciprocal_nn_ivf" -> (LlmQueries.simReciprocalNnIvf _),
    "sim_margin_mine"       -> (LlmQueries.simMarginMine _),
    "sim_filtered_knn"      -> (LlmQueries.simFilteredKnn _),
    "sim_mmr"               -> (LlmQueries.simMmr _),
    "sim_lsh_ann"           -> (LlmQueries.simLshAnn _),
    "text_tokens"           -> (LlmQueries.textTokens _),
    "text_zipf"             -> (LlmQueries.textZipf _),
    "text_lexdiv"           -> (LlmQueries.textLexDiv _),
    "text_script"           -> (LlmQueries.textScript _),
    "text_html_strip"       -> (LlmQueries.textHtmlStrip _),
    "text_garbage"          -> (LlmQueries.textGarbage _),
    "text_normalize"        -> (LlmQueries.textNormalize _),
    "text_chi2"             -> (LlmQueries.textChi2 _),
    "text_url_canon"        -> (LlmQueries.textUrlCanon _),
    "text_rake"             -> (LlmQueries.textRake _),
    "text_langid"           -> (LlmQueries.textLangId _),
    "text_quality"          -> (LlmQueries.textQuality _),
    "text_fingerprint"      -> (LlmQueries.textFingerprint _),
    "text_readability"      -> (LlmQueries.textReadability _),
    "text_sentiment"        -> (LlmQueries.textSentiment _),
    "text_segments"         -> (LlmQueries.textSegments _),
    "text_repetition"       -> (LlmQueries.textRepetition _),
    "text_pmi"              -> (LlmQueries.textPmi _),
    "text_llr"              -> (LlmQueries.textLlr _),
    "text_stem"             -> (LlmQueries.textStem _),
    "text_heaps"            -> (LlmQueries.textHeaps _),
    "text_burstiness"       -> (LlmQueries.textBurstiness _),
    "text_hashtf"           -> (LlmQueries.textHashTf _),
    "text_bigram_lm"        -> (LlmQueries.textBigramLm _),
    "text_dsir"             -> (LlmQueries.textDsir _),
    "text_kneser_ney"       -> (LlmQueries.textKneserNey _),
    "text_kneser_ney3"      -> (LlmQueries.textKneserNey3 _),
    "text_ngrams_native"    -> (LlmQueries.textNgramsNative _),
    "dedup_linkage_entities" -> (LlmQueries.dedupLinkageEntities _),
    "text_bpe_pairs"        -> (LlmQueries.textBpePairs _),
    "text_bpe_train"        -> (LlmQueries.textBpeTrain _),
    "text_bpe_bytes"        -> (LlmQueries.textBpeBytes _),
    "text_bpe_bytes_encode" -> (LlmQueries.textBpeBytesEncode _),
    "text_utf8_validate"    -> (LlmQueries.textUtf8Validate _),
    "text_gopher_rules"     -> (LlmQueries.textGopherRules _),
    "text_c4_filters"       -> (LlmQueries.textC4Filters _),
    "text_unigram_lm"       -> (LlmQueries.textUnigramLm _),
    "text_unigram_encode"   -> (LlmQueries.textUnigramEncode _),
    "text_bpe_encode"       -> (LlmQueries.textBpeEncode _),
    "text_contamination"    -> (LlmQueries.textContamination _),
    "text_lm_score"         -> (LlmQueries.textLmScore _),
    "prep_balance"          -> (LlmQueries.prepBalance _),
    "sim_ivf_ann"           -> (LlmQueries.simIvfAnn _),
    "sim_ivf_nprobe"        -> (LlmQueries.simIvfNprobe _),
    "sim_recall"            -> (LlmQueries.simRecall _),
    "sim_hnsw_ann"          -> (LlmQueries.simHnswAnn _),
    "sim_hnsw_recall"       -> (LlmQueries.simHnswRecall _),
    "sim_pq_ann"            -> (LlmQueries.simPqAnn _),
    "sim_pq_recall"         -> (LlmQueries.simPqRecall _),
    "sim_ivfpq_ann"         -> (LlmQueries.simIvfPqAnn _),
    "sim_ivfpq_recall"      -> (LlmQueries.simIvfPqRecall _),
    "dedup_normalized"      -> (LlmQueries.dedupNormalized _),
    "dedup_prefix"          -> (LlmQueries.dedupPrefix _),
    "dedup_edit"            -> (LlmQueries.dedupEdit _),
    "dedup_edit_recall"     -> (LlmQueries.dedupEditRecall _),
    "dedup_containment"     -> (LlmQueries.dedupContainment _),
    "dedup_span"            -> (LlmQueries.dedupSpan _),
    "dedup_span_removal"    -> (LlmQueries.dedupSpanRemoval _),
    "dedup_linkage"         -> (LlmQueries.dedupLinkage _),
    "dedup_soft"            -> (LlmQueries.dedupSoft _),
    "prep_interleave"       -> (LlmQueries.prepInterleave _),
    "prep_curriculum"       -> (LlmQueries.prepCurriculum _),
    "prep_token_budget"     -> (LlmQueries.prepTokenBudget _),
    "sim_mips_topk"         -> (LlmQueries.simMipsTopK _),
    "sim_scalar_quant"      -> (LlmQueries.simScalarQuant _),
    "sim_sq_recall"         -> (LlmQueries.simSqRecall _),
    "sim_bq_ann"            -> (LlmQueries.simBqAnn _),
    "sim_bq_recall"         -> (LlmQueries.simBqRecall _),
    "sim_filtered_ivf"      -> (LlmQueries.simFilteredIvf _),
    "sim_filtered_ivf_recall" -> (LlmQueries.simFilteredIvfRecall _),
    "sim_range_ivf"         -> (LlmQueries.simRangeIvf _),
    "sim_range_ivf_recall"  -> (LlmQueries.simRangeIvfRecall _),
    "sim_maxsim"            -> (LlmQueries.simMaxsim _),
    "sim_hybrid_rrf"        -> (LlmQueries.simHybridRrf _),
    "dedup_incremental_lsh" -> (LlmQueries.dedupIncrementalLsh _),
    "prep_weighted_sample"  -> (LlmQueries.prepWeightedSample _),
    "sim_range_search"      -> (LlmQueries.simRangeSearch _),
    "text_pii"              -> (LlmQueries.textPii _),
    "text_pii_luhn"         -> (LlmQueries.textPiiLuhn _),
    "text_invisible"        -> (LlmQueries.textInvisible _),
    "sim_twostage"          -> (LlmQueries.simTwoStage _),
    "sim_twostage_recall"   -> (LlmQueries.simTwoStageRecall _),
    "prep_split"            -> (LlmQueries.prepSplit _),
    "prep_scale"            -> (LlmQueries.prepScale _),
    "prep_winsorize"        -> (LlmQueries.prepWinsorize _),
    "prep_decontaminate"    -> (LlmQueries.prepDecontaminate _),
    "prep_quality_filter"   -> (LlmQueries.prepQualityFilter _),
    "prep_perplexity_buckets" -> (LlmQueries.prepPerplexityBuckets _),
    "prep_bin"              -> (LlmQueries.prepBin _),
    "prep_temperature"      -> (LlmQueries.prepTemperature _),
    "prep_leakage_split"    -> (LlmQueries.prepLeakageSplit _),
    "prep_kfold"            -> (LlmQueries.prepKfold _),
    "prep_mix"              -> (LlmQueries.prepMix _),
    "prep_pack"             -> (LlmQueries.prepPack _),
    "prep_chunk"            -> (LlmQueries.prepChunk _),
    "prep_augment"          -> (LlmQueries.prepAugment _),
    "prep_shuffle"          -> (LlmQueries.prepShuffle _),
    "text_tfidf"            -> (LlmQueries.textTfidf _),
    "text_bm25"             -> (LlmQueries.textBm25 _),
    "text_winnowing"        -> (LlmQueries.textWinnowing _),
    "text_bpe_apply"        -> (LlmQueries.textBpeApply _),
    "text_heavy_hitters"    -> (LlmQueries.textHeavyHitters _),
    "text_cms_probe"        -> (LlmQueries.textCmsProbe _),
    "text_overlap_kmv"      -> (LlmQueries.textOverlapKmv _),
  )

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count, md5(text) AS text_hash
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    // Tolerance oracle: the engine emits the exact distinct count plus
    // hll_ok = the rsd 0.02 sketch landed within 10% (5 sigma) of it.
    // DuckDB recomputes the exact counts and asserts TRUE — a drifting
    // sketch flips the flag and fails the hash compare.
    "dedup_approx_hll" ->
      """SELECT lang, COUNT(DISTINCT text) AS exact_distinct, TRUE AS hll_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "dedup_paragraph" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
        |segs AS (
        |  SELECT doc_id, md5(array_to_string(
        |    list_slice(tk, g.i * 10 + 1, g.i * 10 + 10), ' ')) AS h
        |  FROM t, LATERAL (SELECT unnest(range(0,
        |    CAST(floor((len(tk) - 1) / 10) AS INT) + 1)) AS i) g),
        |freq AS (SELECT h, COUNT(*) AS n_occ FROM segs GROUP BY h)
        |SELECT s.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  ROUND(SUM(CASE WHEN f.n_occ > 1 THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS boiler_frac
        |FROM segs s JOIN freq f ON s.h = f.h
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
        |  FROM corpus
        |), h AS (
        |  SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok
        |), bits AS (
        |  SELECT doc_id, g.i,
        |         SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(range(0, 32)) AS i) g GROUP BY doc_id, g.i
        |), sg AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |              AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
        |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
        |ORDER BY a, b""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
        |SELECT a, b, ROUND(c / CAST(na.n + nb.n - c AS DOUBLE), 4) AS jaccard
        |FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), sets AS (
        |  SELECT doc_id, CAST(floor(len(shingles) / 50) AS INT) AS blk,
        |         string_split(text, ' ')[1] || ' ' || string_split(text, ' ')[2]
        |           || ' ' || string_split(text, ' ')[3] AS pfx,
        |         shingles
        |  FROM sh JOIN corpus USING (doc_id)
        |), ex AS (SELECT doc_id, blk, pfx, unnest(shingles) AS sg FROM sets),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.blk = r.blk AND l.pfx = r.pfx
        |    AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sets)
        |SELECT a, b, ROUND(c / CAST(na.n + nb.n - c AS DOUBLE), 4) AS jaccard
        |FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin,
    "dedup_fuzzy" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents),
        |s AS (SELECT doc_id, substr(text, 1, 40) AS pfx,
        |             string_split(text, ' ')[1] AS b1,
        |             CAST(floor(length(text) / 20) AS INT) AS b2
        |      FROM corpus)
        |SELECT l.doc_id AS a, r.doc_id AS b,
        |       CAST(levenshtein(l.pfx, r.pfx) AS BIGINT) AS dist
        |FROM s l JOIN s r
        |  ON l.b1 = r.b1 AND l.b2 = r.b2 AND l.doc_id < r.doc_id
        |WHERE levenshtein(l.pfx, r.pfx) <= 5
        |ORDER BY a, b""".stripMargin,
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok
        |), bits AS (
        |  SELECT doc_id, g.i,
        |         SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, (SELECT unnest(range(0, 32)) AS i) g GROUP BY doc_id, g.i
        |)
        |SELECT doc_id,
        |       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
        |            AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |corpus AS (
        |  SELECT vec_id, label, emb FROM e
        |  UNION ALL
        |  SELECT vec_id + 1000000, label, list_transform(emb, x -> x * 1.01) FROM e),
        |cb AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(emb[g.i]) AS av
        |    FROM corpus, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |asg AS (
        |  SELECT vec_id, emb, cid FROM (
        |    SELECT c.vec_id, c.emb, cb.cid,
        |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(c.emb, cb.cemb)
        |          / (sqrt(list_dot_product(c.emb, c.emb))
        |             * sqrt(list_dot_product(cb.cemb, cb.cemb))) DESC,
        |        cb.cid) AS rn
        |    FROM corpus c, cb) WHERE rn = 1),
        |drp AS (
        |  SELECT DISTINCT r.vec_id AS drop_id
        |  FROM asg l JOIN asg r ON l.cid = r.cid AND l.vec_id < r.vec_id
        |  WHERE list_dot_product(l.emb, r.emb)
        |    / (sqrt(list_dot_product(l.emb, l.emb))
        |       * sqrt(list_dot_product(r.emb, r.emb))) >= 0.99)
        |SELECT a.vec_id, a.cid FROM asg a LEFT JOIN drp d ON a.vec_id = d.drop_id
        |WHERE d.drop_id IS NULL ORDER BY a.vec_id""".stripMargin,
    "dedup_embedding" ->
      """WITH corpus AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |         list_transform(list_transform(embedding, x -> CAST(x AS DOUBLE)), x -> x * 1.01)
        |  FROM embeddings
        |)
        |SELECT l.vec_id AS a, r.vec_id AS b,
        |  ROUND(list_dot_product(l.emb, r.emb)
        |    / (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))), 4) AS cos
        |FROM corpus l JOIN corpus r ON l.vec_id < r.vec_id
        |WHERE list_dot_product(l.emb, r.emb)
        |    / (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))) >= 0.99
        |ORDER BY a, b""".stripMargin,
    // the greedy MMR recurrence unrolled: pool + pairwise sims once,
    // then per step one argmax over (0.7*rel - 0.3*max-sim-to-selected)
    "sim_mmr" -> {
      def cosSql(x: String, y: String) =
        s"list_dot_product($x, $y) / (sqrt(list_dot_product($x, $x))" +
          s" * sqrt(list_dot_product($y, $y)))"
      val steps = (2 to 4).map { t =>
        s"""s$t AS MATERIALIZED (
           |  SELECT probe_id, vec_id, rel, $t AS step, mmr FROM (
           |    SELECT g.*, ROW_NUMBER() OVER (PARTITION BY probe_id
           |      ORDER BY mmr DESC, vec_id) AS rk
           |    FROM (
           |      SELECT r.probe_id, r.vec_id, r.rel,
           |        0.7 * r.rel - 0.3 * MAX(ps.sim) AS mmr
           |      FROM pool r
           |      JOIN psim ps ON ps.probe_id = r.probe_id AND ps.a = r.vec_id
           |      JOIN u${t - 1} s ON s.probe_id = ps.probe_id
           |        AND s.vec_id = ps.b
           |      WHERE NOT EXISTS (SELECT 1 FROM u${t - 1} x
           |        WHERE x.probe_id = r.probe_id AND x.vec_id = r.vec_id)
           |      GROUP BY r.probe_id, r.vec_id, r.rel) g) WHERE rk = 1),
           |u$t AS MATERIALIZED (
           |  SELECT probe_id, vec_id, rel, step, mmr FROM u${t - 1}
           |  UNION ALL SELECT probe_id, vec_id, rel, step, mmr FROM s$t)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH p AS (SELECT vec_id AS probe_id,
         |    CAST(embedding AS DOUBLE[]) AS pe
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
         |  FROM embeddings WHERE vec_id >= 10),
         |sc AS (SELECT probe_id, vec_id, ${cosSql("pe", "ce")} AS rel, ce
         |  FROM p, c),
         |pool AS MATERIALIZED (
         |  SELECT probe_id, vec_id, rel, ce FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY rel DESC, vec_id) AS rn FROM sc) WHERE rn <= 8),
         |psim AS MATERIALIZED (
         |  SELECT x.probe_id, x.vec_id AS a, y.vec_id AS b,
         |    ${cosSql("x.ce", "y.ce")} AS sim
         |  FROM pool x JOIN pool y ON x.probe_id = y.probe_id
         |    AND x.vec_id <> y.vec_id),
         |u1 AS MATERIALIZED (
         |  SELECT probe_id, vec_id, rel, 1 AS step, 0.7 * rel AS mmr FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY rel DESC, vec_id) AS rk FROM pool) WHERE rk = 1),
         |$steps
         |SELECT probe_id, vec_id, CAST(step AS INT) AS step,
         |  ROUND(rel, 4) AS rel, ROUND(mmr, 4) AS mmr
         |FROM u4 ORDER BY probe_id, step""".stripMargin
    },
    // Filtered retrieval: the label equi-join replaces the cross
    // product; same dot/norm spelling and ROUND(.,4) as sim_knn_topk
    "sim_filtered_knn" ->
      """WITH p AS (SELECT vec_id AS probe_id, label AS p_label,
        |             CAST(embedding AS DOUBLE[]) AS pe
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ce
        |           FROM embeddings WHERE vec_id >= 10),
        |     sc AS (SELECT probe_id, vec_id, c.label,
        |              list_dot_product(pe, ce)
        |                / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(ce, ce))) AS cos
        |            FROM p JOIN c ON p.p_label = c.label
        |            WHERE probe_id != vec_id),
        |     r AS (SELECT probe_id, vec_id, label, cos,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |               ORDER BY cos DESC, vec_id) AS BIGINT) AS rn FROM sc)
        |SELECT probe_id, vec_id AS neighbor_id, CAST(label AS INT) AS label,
        |  rn, ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    // reciprocal NN: one ranked top-1 pass, mutuality as the swapped
    // self-join -- same dot/norm spelling and tie order as sim_knn_topk
    "sim_reciprocal_nn" ->
      """WITH v AS (SELECT vec_id AS a, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings),
        |sc AS (SELECT x.a AS a, y.a AS b,
        |    list_dot_product(x.e, y.e)
        |      / (sqrt(list_dot_product(x.e, x.e))
        |         * sqrt(list_dot_product(y.e, y.e))) AS cos
        |  FROM v x, v y WHERE x.a != y.a),
        |nn AS (SELECT a, b, cos FROM (
        |    SELECT a, b, cos, ROW_NUMBER() OVER (PARTITION BY a
        |      ORDER BY cos DESC, b) AS rn FROM sc) z
        |  WHERE rn = 1)
        |SELECT n1.a AS a, n1.b AS b, ROUND(n1.cos, 4) AS cos
        |FROM nn n1 JOIN nn n2
        |  ON n1.a = n2.b AND n1.b = n2.a AND n1.a < n1.b
        |ORDER BY a""".stripMargin,
    // bucketed reciprocal NN vs exact: IVF assignment replayed (the
    // sim_ivf_ann spelling), per-cell mutual top-1, full-outer vs the
    // exact mutual pairs -- the agreement measurement as rows
    "sim_reciprocal_nn_ivf" ->
      """WITH v AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |sc AS (SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_dot_product(x.e, y.e)
        |      / (sqrt(list_dot_product(x.e, x.e))
        |         * sqrt(list_dot_product(y.e, y.e))) AS cos
        |  FROM v x, v y WHERE x.vec_id != y.vec_id),
        |nn AS (SELECT a, b, cos FROM (
        |    SELECT a, b, cos, ROW_NUMBER() OVER (PARTITION BY a
        |      ORDER BY cos DESC, b) AS rn FROM sc) z WHERE rn = 1),
        |ex AS (SELECT n1.a AS a, n1.b AS b, n1.cos AS cos FROM nn n1
        |  JOIN nn n2 ON n1.a = n2.b AND n1.b = n2.a AND n1.a < n1.b),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(e[g.i]) AS av
        |    FROM v, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |asg AS (SELECT vec_id, e, cid FROM (
        |  SELECT v.vec_id, v.e, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |      list_dot_product(v.e, cent.cemb)
        |        / (sqrt(list_dot_product(v.e, v.e))
        |           * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM v, cent) WHERE rn = 1),
        |isc AS (SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_dot_product(x.e, y.e)
        |      / (sqrt(list_dot_product(x.e, x.e))
        |         * sqrt(list_dot_product(y.e, y.e))) AS cos
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id != y.vec_id),
        |inn AS (SELECT a, b, cos FROM (
        |    SELECT a, b, cos, ROW_NUMBER() OVER (PARTITION BY a
        |      ORDER BY cos DESC, b) AS rn FROM isc) z WHERE rn = 1),
        |iv AS (SELECT n1.a AS a, n1.b AS b, n1.cos AS cos FROM inn n1
        |  JOIN inn n2 ON n1.a = n2.b AND n1.b = n2.a AND n1.a < n1.b)
        |SELECT COALESCE(ex.a, iv.a) AS a, COALESCE(ex.b, iv.b) AS b,
        |  ROUND(COALESCE(ex.cos, iv.cos), 4) AS cos,
        |  ex.a IS NOT NULL AS in_exact, iv.a IS NOT NULL AS in_ivf
        |FROM ex FULL OUTER JOIN iv ON ex.a = iv.a AND ex.b = iv.b
        |ORDER BY a, b""".stripMargin,
    // ratio-margin bitext mining: cos / (mean top-4 density of each
    // side / 2), mutual margin-argmax above 1.0 — full replay
    "sim_margin_mine" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |sv AS (SELECT vec_id AS x, emb FROM e WHERE label % 2 = 0),
        |tv AS (SELECT vec_id AS y, emb FROM e WHERE label % 2 = 1),
        |sc AS (SELECT sv.x, tv.y,
        |    list_dot_product(sv.emb, tv.emb)
        |      / (sqrt(list_dot_product(sv.emb, sv.emb))
        |         * sqrt(list_dot_product(tv.emb, tv.emb))) AS cos
        |  FROM sv, tv),
        |dx AS (SELECT x, AVG(cos) AS nx FROM (
        |    SELECT x, cos, ROW_NUMBER() OVER (PARTITION BY x
        |      ORDER BY cos DESC, y) AS rn FROM sc) z
        |  WHERE rn <= 4 GROUP BY x),
        |dy AS (SELECT y, AVG(cos) AS ny FROM (
        |    SELECT y, cos, ROW_NUMBER() OVER (PARTITION BY y
        |      ORDER BY cos DESC, x) AS rn FROM sc) z
        |  WHERE rn <= 4 GROUP BY y),
        |m AS (SELECT sc.x, sc.y, sc.cos,
        |    sc.cos / (dx.nx / 2.0 + dy.ny / 2.0) AS margin
        |  FROM sc JOIN dx USING (x) JOIN dy USING (y)),
        |bx AS (SELECT x, y, cos, margin FROM (
        |    SELECT x, y, cos, margin, ROW_NUMBER() OVER (PARTITION BY x
        |      ORDER BY margin DESC, y) AS rn FROM m) z WHERE rn = 1),
        |by AS (SELECT x AS bxx, y AS byy FROM (
        |    SELECT x, y, ROW_NUMBER() OVER (PARTITION BY y
        |      ORDER BY margin DESC, x) AS rn FROM m) z WHERE rn = 1)
        |SELECT bx.x, bx.y, ROUND(bx.cos, 4) AS cos,
        |  ROUND(bx.margin, 4) AS margin
        |FROM bx JOIN by ON bx.x = by.bxx AND bx.y = by.byy
        |WHERE bx.margin > 1.0 ORDER BY x, y""".stripMargin,
    "sim_knn_topk" ->
      """WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
        |           FROM embeddings WHERE vec_id >= 10),
        |     sc AS (SELECT probe_id, vec_id,
        |              list_dot_product(pe, ce)
        |                / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(ce, ce))) AS cos
        |            FROM p, c),
        |     r AS (SELECT probe_id, vec_id, cos,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |               ORDER BY cos DESC, vec_id) AS BIGINT) AS rn FROM sc)
        |SELECT probe_id, vec_id AS neighbor_id, rn, ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    // Full m×m late-interaction matrix per (probe, cand): same ordered
    // sub-slices, same dot/norm spelling, same Σ_i max_j accumulation.
    "sim_maxsim" ->
      """WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
        |           FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS ce
        |           FROM embeddings WHERE vec_id >= 10),
        |     sc AS (SELECT probe_id, cand_id,
        |         list_sum(list_transform(range(8), i ->
        |           list_max(list_transform(range(8), j ->
        |             list_dot_product(pe[CAST(i*8+1 AS BIGINT) : CAST(i*8+8 AS BIGINT)],
        |                              ce[CAST(j*8+1 AS BIGINT) : CAST(j*8+8 AS BIGINT)])
        |               / (sqrt(list_dot_product(
        |                    pe[CAST(i*8+1 AS BIGINT) : CAST(i*8+8 AS BIGINT)],
        |                    pe[CAST(i*8+1 AS BIGINT) : CAST(i*8+8 AS BIGINT)]))
        |                  * sqrt(list_dot_product(
        |                      ce[CAST(j*8+1 AS BIGINT) : CAST(j*8+8 AS BIGINT)],
        |                      ce[CAST(j*8+1 AS BIGINT) : CAST(j*8+8 AS BIGINT)]))))))) AS score
        |       FROM p, c WHERE probe_id <> cand_id),
        |     r AS (SELECT probe_id, cand_id, score,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |               ORDER BY score DESC, cand_id) AS BIGINT) AS rn FROM sc)
        |SELECT probe_id, cand_id AS neighbor_id, rn, ROUND(score, 4) AS maxsim
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    "sim_lsh_ann" ->
      """WITH c AS (SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS ce,
        |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |     + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bkt
        |   FROM embeddings WHERE vec_id >= 10),
        | p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe,
        |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
        |     + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bkt
        |   FROM embeddings WHERE vec_id < 10),
        | j AS (SELECT probe_id, cand_id,
        |         list_dot_product(pe, ce)
        |           / (sqrt(list_dot_product(pe, pe)) * sqrt(list_dot_product(ce, ce))) AS cos,
        |         COUNT(*) OVER (PARTITION BY probe_id) AS n_cands
        |       FROM p JOIN c USING (bkt) WHERE cand_id <> probe_id),
        | r AS (SELECT probe_id, cand_id, cos, n_cands,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |           ORDER BY cos DESC, cand_id) AS BIGINT) AS rn FROM j)
        |SELECT probe_id, cand_id AS neighbor_id, rn, n_cands, ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 1 ORDER BY probe_id""".stripMargin,
    // exact integers end to end (counts, ranks, rank*freq); the only
    // division is the final rounded share
    "text_zipf" ->
      """WITH c AS (
        |  SELECT t.tok, COUNT(*) AS n
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |  WHERE length(t.tok) > 0 GROUP BY 1),
        |r AS (
        |  SELECT tok, n,
        |    ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank,
        |    SUM(n) OVER () AS tot
        |  FROM c)
        |SELECT CAST(rank AS INT) AS rank, tok, CAST(n AS BIGINT) AS n,
        |  CAST(rank * n AS BIGINT) AS rank_x_freq,
        |  ROUND(n / CAST(tot AS DOUBLE), 6) AS share
        |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin,
    // garbage screen: RE2-safe patterns shared verbatim; verdict is
    // pure integer comparisons
    "text_garbage" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |      THEN text || ' zzzzkrtpbq xk7q9w2 4x2b8 !!!###$$$'
        |      ELSE text END AS text
        |  FROM documents),
        |s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(COALESCE(list_max(list_transform(
        |      regexp_extract_all(text, '[bcdfghjklmnpqrstvwxz]+'),
        |      x -> length(x))), 0) AS BIGINT) AS max_cons_run,
        |    CAST(len(regexp_extract_all(text, '[a-z][0-9]|[0-9][a-z]'))
        |      AS BIGINT) AS n_transitions,
        |    CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT)
        |      AS n_symbols,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> length(t) > 20)) AS BIGINT) AS n_long_tokens
        |  FROM d)
        |SELECT doc_id, n_chars, max_cons_run, n_transitions, n_symbols,
        |  n_long_tokens,
        |  (max_cons_run >= 8 OR n_transitions >= 3
        |   OR n_symbols * 10 > n_chars * 3 OR n_long_tokens > 0) AS garbage
        |FROM s ORDER BY doc_id""".stripMargin,
    // html strip: same decoration, same tag regex, same entity decode
    // ORDER (&amp; last), same squeeze -- md5-pinned byte-for-byte
    "text_html_strip" ->
      """WITH d AS (SELECT doc_id,
        |    '<div class="d' || CAST(doc_id AS VARCHAR) || '"><p>'
        |    || substr(text, 1, 40) || ' &amp;&lt;x&gt; '
        |    || CASE WHEN doc_id % 3 = 0 THEN '&quot;q&quot;&#39;s<br/>'
        |            ELSE '' END
        |    || substr(text, 41) || '</p></div>' AS raw
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(raw, '<[^>]*>')) AS BIGINT) AS n_tags,
        |    CAST(len(regexp_extract_all(raw, '&(amp|lt|gt|quot|#39);'))
        |      AS BIGINT) AS n_entities,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(raw, '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&amp;', '&'),
        |      ' +', ' ', 'g')) AS stripped
        |  FROM d)
        |SELECT doc_id, n_tags, n_entities,
        |  CAST(length(stripped) AS BIGINT) AS clean_chars,
        |  md5(stripped) AS clean_md5
        |FROM s ORDER BY doc_id""".stripMargin,
    // script profile: exact single-char-class counts; n_space via the
    // replace-length identity, n_other as the remainder
    "text_script" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) AS n_latin,
        |  CAST(len(regexp_extract_all(text, '[一-龥]')) AS BIGINT) AS n_han,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
        |    AS n_space,
        |  CAST(length(text)
        |    - len(regexp_extract_all(text, '[a-zA-Z]'))
        |    - len(regexp_extract_all(text, '[一-龥]'))
        |    - len(regexp_extract_all(text, '[0-9]'))
        |    - (length(text) - length(replace(text, ' ', ''))) AS BIGINT)
        |    AS n_other,
        |  CASE WHEN len(regexp_extract_all(text, '[a-zA-Z]')) = 0
        |        AND len(regexp_extract_all(text, '[一-龥]')) = 0 THEN 'none'
        |       WHEN len(regexp_extract_all(text, '[a-zA-Z]'))
        |         >= len(regexp_extract_all(text, '[一-龥]')) THEN 'latin'
        |       ELSE 'han' END AS dominant
        |FROM documents ORDER BY doc_id""".stripMargin,
    // lexical diversity: every float is one division (or sqrt) of the
    // integer sufficient statistics N, V, sum(f^2) -> bit-identical
    "text_lexdiv" ->
      """WITH tf AS (
        |  SELECT doc_id, t.tok, COUNT(*) AS f
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |  WHERE length(t.tok) > 0 GROUP BY 1, 2),
        |s AS (SELECT doc_id, SUM(f) AS n_tok, COUNT(*) AS n_types,
        |        SUM(f * f) AS s2
        |      FROM tf GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  ROUND(n_types / CAST(n_tok AS DOUBLE), 6) AS ttr,
        |  ROUND(n_types / sqrt(CAST(n_tok AS DOUBLE)), 6) AS guiraud,
        |  CASE WHEN n_tok < 2 THEN 0.0 ELSE
        |    ROUND(CAST(s2 - n_tok AS DOUBLE) / (n_tok * (n_tok - 1)), 6)
        |  END AS simpson,
        |  ROUND(10000.0 * (s2 - n_tok) / (n_tok * n_tok), 6) AS yule_k
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(list_intersect(toks, ['the','a','of','and','to','in','is'])) AS BIGINT) AS s_en,
        |  CAST(len(list_intersect(toks, ['der','die','das','und','ist','ein'])) AS BIGINT) AS s_de,
        |  CAST(len(list_intersect(toks, ['el','la','de','y','que','en','un'])) AS BIGINT) AS s_es,
        |  CAST(len(list_intersect(toks, ['le','la','les','et','de','un','est'])) AS BIGINT) AS s_fr,
        |  CAST(len(list_intersect(toks, ['的','是','了','在','我','有'])) AS BIGINT) AS s_zh
        |FROM t)
        |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'fr'
        |       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'zh'
        |       ELSE 'und' END AS predicted
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_segments" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |seg AS (
        |  SELECT doc_id, CAST(g.i AS BIGINT) AS seg_idx,
        |    array_to_string(list_slice(tk, g.i * 20 + 1, g.i * 20 + 20), ' ') AS seg_text
        |  FROM t, LATERAL (SELECT unnest(range(0,
        |    CAST(floor((len(tk) - 1) / 20) AS INT) + 1)) AS i) g),
        |sc AS (SELECT doc_id, seg_idx,
        |  list_distinct(string_split(seg_text, ' ')) AS toks FROM seg),
        |s AS (SELECT doc_id, seg_idx,
        |  CAST(len(list_intersect(toks, ['the','a','of','and','to','in','is'])) AS BIGINT) AS s_en,
        |  CAST(len(list_intersect(toks, ['der','die','das','und','ist','ein'])) AS BIGINT) AS s_de,
        |  CAST(len(list_intersect(toks, ['el','la','de','y','que','en','un'])) AS BIGINT) AS s_es,
        |  CAST(len(list_intersect(toks, ['le','la','les','et','de','un','est'])) AS BIGINT) AS s_fr,
        |  CAST(len(list_intersect(toks, ['的','是','了','在','我','有'])) AS BIGINT) AS s_zh
        |FROM sc)
        |SELECT doc_id, seg_idx, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'fr'
        |       WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'zh'
        |       ELSE 'und' END AS predicted
        |FROM s ORDER BY doc_id, seg_idx""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  ROUND((length(text) - length(replace(text, ' ', ''))) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS space_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |  ROUND(len(list_intersect(list_distinct(string_split(text, ' ')), ['the','a','of','and','to','in','is'])) / CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE), 4) AS stop_ratio,
        |  ROUND(length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS avg_tok_len,
        |  CAST(len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 100000
        |    AND length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 2
        |    AND length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 15 AS INT) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, tk[gi.i] || ' ' || tk[gi.i + 1] AS gram
        |  FROM t, LATERAL (SELECT unnest(range(1, len(tk))) AS i) gi
        |  WHERE len(tk) >= 2),
        |c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram)
        |SELECT doc_id,
        |  CAST(SUM(cnt) AS BIGINT) AS n_grams,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
        |  CAST(MAX(cnt) AS BIGINT) AS top_gram_n,
        |  ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS top_gram_frac,
        |  ROUND(1 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS dup_gram_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_bpe_pairs" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, COUNT(*) AS tc FROM t GROUP BY tok),
        |p AS (SELECT substr(tok, g.i, 1) || substr(tok, g.i + 1, 1) AS pair, tc
        |      FROM tc, LATERAL (SELECT unnest(range(1, length(tok))) AS i) g
        |      WHERE length(tok) >= 2)
        |SELECT pair, CAST(SUM(tc) AS BIGINT) AS weight FROM p GROUP BY pair
        |ORDER BY weight DESC, pair LIMIT 10""".stripMargin,
    // DSIR importance resampling: the full pipeline — hashed uni+bigram
    // bucket counts, add-one-smoothed target/raw models, per-doc
    // log-weight, md5-derandomized Gumbel top-100 — replayed in SQL.
    // The log-ratio sums cross engines at ~1e-13 (the q40/text_lm
    // precedent); ROUND(.,4) absorbs it.
    "text_dsir" ->
      """WITH toks AS (SELECT doc_id, CAST(lang = 'en' AS BIGINT) AS tgt,
        |    string_split(text, ' ') AS tk FROM documents),
        |uni AS (SELECT doc_id, tgt, unnest(tk) AS gram FROM toks),
        |bi AS (SELECT doc_id, tgt, tk[gi.i] || ' ' || tk[gi.i + 1] AS gram
        |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk))) AS i) gi
        |  WHERE len(tk) >= 2),
        |pdb AS (SELECT doc_id, tgt,
        |    ('0x' || substr(md5(gram), 1, 15))::BIGINT % 256 AS b,
        |    COUNT(*) AS n
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        |  GROUP BY 1, 2, 3),
        |model AS (SELECT b,
        |    SUM(CASE WHEN tgt = 1 THEN n ELSE 0 END) AS pc,
        |    SUM(n) AS qc
        |  FROM pdb GROUP BY b),
        |tot AS (SELECT SUM(pc) AS ptot, SUM(qc) AS qtot FROM model),
        |delta AS (SELECT b,
        |    ln(CAST(pc + 1 AS DOUBLE) / CAST(ptot + 256 AS DOUBLE))
        |  - ln(CAST(qc + 1 AS DOUBLE) / CAST(qtot + 256 AS DOUBLE)) AS d
        |  FROM model, tot),
        |scored AS (SELECT p.doc_id,
        |    CAST(SUM(p.n) AS BIGINT) AS n_grams,
        |    SUM(CAST(p.n AS DOUBLE) * d.d) AS logw
        |  FROM pdb p JOIN delta d USING (b) GROUP BY p.doc_id),
        |gk AS (SELECT doc_id, n_grams, logw,
        |    ROUND(logw - ln(-ln(
        |      (((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |         % 1000000) + 0.5) / 1000000.0))), 4) AS rk
        |  FROM scored)
        |SELECT doc_id, n_grams, ROUND(logw, 4) AS logw, rk,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rk DESC, doc_id) AS BIGINT) AS rn
        |FROM gk ORDER BY rk DESC, doc_id LIMIT 100""".stripMargin,
    "text_bigram_lm" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, t[gi.i] AS w1, t[gi.i + 1] AS w2
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2),
        |bc AS (SELECT w1, w2, COUNT(*) AS bc FROM bi GROUP BY w1, w2),
        |pc AS (SELECT w1, COUNT(*) AS pc FROM bi GROUP BY w1)
        |SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(AVG(-ln(bc.bc / CAST(pc.pc AS DOUBLE))), 4) AS avg_surprisal
        |FROM bi JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
        |        JOIN pc ON bi.w1 = pc.w1
        |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin,
    // The native generator's gram stream recomputed with plain SQL
    // n-gram extraction — generator vs HOF spelling is an engine
    // implementation detail, the gram counts are the contract.
    "text_ngrams_native" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT t[gi.i] || ' ' || t[gi.i + 1] || ' ' || t[gi.i + 2]
        |        AS gram
        |      FROM tk, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) gi
        |      WHERE len(t) >= 3)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 10""".stripMargin,
    // Same KN formula spelled identically: max(bc−D,0)/pc +
    // (D/pc)·N1f·(N1r/T); the avg(−ln p) + 4-decimal rounding follows
    // the text_bigram_lm determinism precedent.
    "text_kneser_ney" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, t[gi.i] AS w1, t[gi.i + 1] AS w2
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2),
        |bc AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS bc
        |  FROM bi GROUP BY w1, w2),
        |pc AS (SELECT w1, COUNT(*) AS pc FROM bi GROUP BY w1),
        |nf AS (SELECT w1, COUNT(*) AS nf FROM bc GROUP BY w1),
        |nr AS (SELECT w2, COUNT(*) AS nr FROM bc GROUP BY w2),
        |tt AS (SELECT COUNT(*) AS tt FROM bc),
        |sc AS (SELECT bi.doc_id,
        |    greatest(bc.bc - 0.75, 0) / pc.pc
        |    + (0.75 / pc.pc) * nf.nf * (nr.nr / CAST(tt.tt AS DOUBLE)) AS p
        |  FROM bi
        |  JOIN bc ON bi.w1 = bc.w1 AND bi.w2 = bc.w2
        |  JOIN pc ON bi.w1 = pc.w1
        |  JOIN nf ON bi.w1 = nf.w1
        |  JOIN nr ON bi.w2 = nr.w2
        |  CROSS JOIN tt)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  ROUND(AVG(-ln(p)), 4) AS avg_kn_surprisal
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Three-level KN spelled identically: trigram ML term discounted
    // into the middle CONTINUATION model (distinct left contexts per
    // bigram), which discounts into the bigram-type unigram; all
    // statistics over the trigram instance stream, like the engine.
    "text_kneser_ney3" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tri AS (
        |  SELECT doc_id, t[gi.i] AS w1, t[gi.i + 1] AS w2, t[gi.i + 2] AS w3
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) gi
        |  WHERE len(t) >= 3),
        |tc AS MATERIALIZED (SELECT w1, w2, w3, COUNT(*) AS tc
        |  FROM tri GROUP BY 1, 2, 3),
        |ctx AS (SELECT w1, w2, SUM(tc) AS ctx, COUNT(*) AS nf12
        |  FROM tc GROUP BY 1, 2),
        |cont AS MATERIALIZED (SELECT w2, w3, COUNT(*) AS cont23
        |  FROM tc GROUP BY 1, 2),
        |mid AS (SELECT w2, SUM(cont23) AS mid2, COUNT(*) AS nf2
        |  FROM cont GROUP BY 1),
        |rgt AS (SELECT w3, COUNT(*) AS r3 FROM cont GROUP BY 1),
        |tt AS (SELECT COUNT(*) AS tt FROM cont),
        |sc AS (SELECT tri.doc_id,
        |    greatest(tc.tc - 0.75, 0) / ctx.ctx
        |    + (0.75 / ctx.ctx) * ctx.nf12 * (
        |        greatest(cont.cont23 - 0.75, 0) / mid.mid2
        |        + (0.75 / mid.mid2) * mid.nf2
        |          * (rgt.r3 / CAST(tt.tt AS DOUBLE))) AS p
        |  FROM tri
        |  JOIN tc ON tri.w1 = tc.w1 AND tri.w2 = tc.w2 AND tri.w3 = tc.w3
        |  JOIN ctx ON tri.w1 = ctx.w1 AND tri.w2 = ctx.w2
        |  JOIN cont ON tri.w2 = cont.w2 AND tri.w3 = cont.w3
        |  JOIN mid ON tri.w2 = mid.w2
        |  JOIN rgt ON tri.w3 = rgt.w3
        |  CROSS JOIN tt)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |  ROUND(AVG(-ln(p)), 4) AS avg_kn3_surprisal
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_hashtf" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(t.tok), 1, 15))::BIGINT % 64 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents) t
        |GROUP BY doc_id, bucket ORDER BY doc_id, bucket""".stripMargin,
    // RAKE with exact integer micro-unit word scores (deg*1e6 div freq);
    // ranking on the exact integer, the double is display-only
    "text_rake" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tok AS (
        |  SELECT doc_id, g.i AS pos, tk[g.i] AS tok,
        |    tk[g.i] IN ('the', 'a', 'small', 'big', 'fast', 'slow')
        |      AS is_stop
        |  FROM t, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) g),
        |ph AS (
        |  SELECT doc_id, pos, tok, is_stop,
        |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        |  FROM tok),
        |phr AS MATERIALIZED (
        |  SELECT doc_id, pid, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    COUNT(*) AS len
        |  FROM ph WHERE NOT is_stop GROUP BY doc_id, pid),
        |st AS (
        |  SELECT w.w, COUNT(*) AS freq, SUM(w.len) AS deg
        |  FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len
        |        FROM phr) w
        |  GROUP BY w.w),
        |sw AS (SELECT w, (deg * 1000000) // freq AS sw FROM st),
        |dp AS (
        |  SELECT phrase, COUNT(*) AS n_occurs, MAX(len) AS n_words
        |  FROM phr GROUP BY phrase),
        |sc AS (
        |  SELECT dp.phrase, dp.n_words, dp.n_occurs, SUM(sw.sw) AS s
        |  FROM dp, LATERAL (SELECT unnest(string_split(dp.phrase, ' ')) AS w) g
        |  JOIN sw ON sw.w = g.w
        |  GROUP BY dp.phrase, dp.n_words, dp.n_occurs)
        |SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_occurs AS BIGINT) AS n_occurs,
        |  ROUND(s / 1000000.0, 4) AS score
        |FROM sc ORDER BY s DESC, phrase LIMIT 30""".stripMargin,
    // identical RFC 3986 normalization pipeline: same regex groups, same
    // default-port/fragment/utm rules, same param sort
    "text_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'hTtPs' END)
        |    || '://ExAmPle-' || CAST(doc_id % 7 AS VARCHAR) || '.CoM'
        |    || (CASE WHEN doc_id % 3 = 0 THEN ':80'
        |             WHEN doc_id % 3 = 1 THEN ':443' ELSE ':8080' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN ''
        |             ELSE '/Path/' || CAST(doc_id % 11 AS VARCHAR) END)
        |    || '?b=' || CAST(doc_id % 5 AS VARCHAR)
        |    || '&utm_source=x&a=' || CAST(doc_id % 3 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url,
        |      '^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 1)) AS scheme,
        |    lower(regexp_extract(url,
        |      '^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 2)) AS host,
        |    regexp_extract(url,
        |      '^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 3) AS port,
        |    regexp_extract(url,
        |      '^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 4) AS path,
        |    regexp_extract(url,
        |      '^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 5) AS q
        |  FROM u),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' || host
        |    || (CASE WHEN (scheme = 'http' AND port = ':80')
        |               OR (scheme = 'https' AND port = ':443') THEN ''
        |             ELSE port END)
        |    || (CASE WHEN path = '' THEN '/' ELSE path END)
        |    || (CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&')
        |             ELSE '' END) AS canon
        |  FROM (SELECT *,
        |          list_sort(list_filter(string_split(substring(q, 2), '&'),
        |            x -> x <> '' AND NOT starts_with(x, 'utm_'))) AS ps
        |        FROM p))
        |SELECT doc_id, canon,
        |  COUNT(*) OVER (PARTITION BY canon) AS n_dupes
        |FROM c ORDER BY doc_id""".stripMargin,
    // exact 2x2 contingency per bigram; margins from the bigram table;
    // the chi2 expression is the identical IEEE product chain
    "text_chi2" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bcall AS (
        |  SELECT t[gi.i] AS w1, t[gi.i + 1] AS w2, COUNT(*) AS bc
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2
        |  GROUP BY 1, 2),
        |pc AS (SELECT w1, SUM(bc) AS pc FROM bcall GROUP BY w1),
        |sc AS (SELECT w2, SUM(bc) AS sc FROM bcall GROUP BY w2),
        |n AS (SELECT SUM(bc) AS n FROM bcall),
        |j AS (
        |  SELECT b.w1, b.w2, b.bc, pc.pc, sc.sc, n.n,
        |    b.bc * (n.n - pc.pc - sc.sc + b.bc)
        |      - (pc.pc - b.bc) * (sc.sc - b.bc) AS t
        |  FROM bcall b JOIN pc USING (w1) JOIN sc USING (w2), n
        |  WHERE b.bc >= 5 AND pc.pc < n.n AND sc.sc < n.n)
        |SELECT w1, w2, CAST(bc AS BIGINT) AS bc, CAST(pc AS BIGINT) AS pc,
        |  CAST(sc AS BIGINT) AS sc,
        |  ROUND(CAST(n AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        |    / (CAST(pc AS DOUBLE) * CAST(n - pc AS DOUBLE)
        |    * CAST(sc AS DOUBLE) * CAST(n - sc AS DOUBLE)), 4) AS chi2
        |FROM j ORDER BY chi2 DESC, w1, w2 LIMIT 40""".stripMargin,
    "text_pmi" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT u.w, COUNT(*) AS uc
        |        FROM (SELECT unnest(t) AS w FROM tk) u GROUP BY u.w),
        |bi AS (
        |  SELECT t[gi.i] AS w1, t[gi.i + 1] AS w2, COUNT(*) AS bc
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |nu AS (SELECT CAST(SUM(uc) AS DOUBLE) AS n_uni FROM uni),
        |nb AS (SELECT CAST(SUM(len(t) - 1) AS DOUBLE) AS n_bi FROM tk
        |       WHERE len(t) >= 2)
        |SELECT w1, w2, CAST(bc AS BIGINT) AS bc,
        |  CAST(u1.uc AS BIGINT) AS uc1, CAST(u2.uc AS BIGINT) AS uc2,
        |  ROUND(ln((bc / n_bi) / ((u1.uc / n_uni) * (u2.uc / n_uni))), 4) AS pmi
        |FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w, nu, nb
        |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    // burstiness: VMR over ALL docs via the sum-of-squares identity
    // (zeros never materialize); T^2 in DOUBLE; ROUND 4
    "text_burstiness" ->
      """WITH pd AS (SELECT t, doc_id, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents) GROUP BY t, doc_id),
        |st AS (SELECT t, SUM(c) AS total, SUM(c * c) AS ss,
        |         COUNT(*) AS df FROM pd GROUP BY t),
        |nn AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT t, CAST(total AS BIGINT) AS total, CAST(df AS BIGINT) AS df,
        |  ROUND((CAST(ss AS DOUBLE)
        |      - CAST(total AS DOUBLE) * CAST(total AS DOUBLE)
        |        / CAST(n AS DOUBLE)) / CAST(total AS DOUBLE), 4) AS vmr
        |FROM st, nn ORDER BY total DESC, t LIMIT 15""".stripMargin,
    // Heaps checkpoints: fraction literals CAST TO DOUBLE so
    // floor(f*max) takes the same IEEE branch; first-occurrence mins
    // drive every cumulative distinct count; ln-ratio slope ROUND 4
    "text_heaps" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |mx AS (SELECT MAX(doc_id) AS mx FROM b),
        |thr AS (SELECT CAST(ROUND(f * 100) AS INT) AS pct,
        |          CAST(FLOOR(f * mx) AS BIGINT) AS thr
        |        FROM (SELECT unnest(
        |            CAST([0.2, 0.4, 0.6, 0.8, 1.0] AS DOUBLE[])) AS f), mx),
        |tm AS (SELECT t, MIN(doc_id) AS first_doc FROM (
        |         SELECT doc_id, unnest(tk) AS t FROM b) GROUP BY t),
        |v AS (SELECT pct, thr,
        |        SUM(CASE WHEN first_doc <= thr THEN 1 ELSE 0 END) AS vocab
        |      FROM tm, thr GROUP BY pct, thr),
        |tt AS (SELECT pct, thr,
        |        SUM(CASE WHEN doc_id <= thr THEN 1 ELSE 0 END) AS n_docs,
        |        SUM(CASE WHEN doc_id <= thr THEN len(tk) ELSE 0 END)
        |          AS n_tokens
        |      FROM b, thr GROUP BY pct, thr),
        |j AS (SELECT v.pct, v.thr, vocab, n_docs, n_tokens
        |      FROM v JOIN tt ON v.pct = tt.pct AND v.thr = tt.thr)
        |SELECT pct, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  ROUND(ln(CAST(vocab AS DOUBLE)
        |      / CAST(lag(vocab) OVER (ORDER BY pct) AS DOUBLE))
        |    / ln(CAST(n_tokens AS DOUBLE)
        |      / CAST(lag(n_tokens) OVER (ORDER BY pct) AS DOUBLE)), 4)
        |    AS beta
        |FROM j ORDER BY pct""".stripMargin,
    // S-stemmer rules shared TEXTUALLY with the engine (StemCaseSql):
    // identical CASE, identical right/substr/|| string algebra
    "text_stem" ->
      ("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |s AS (SELECT doc_id, w, """.stripMargin +
        graft.operators.TextAnalysis.StemCaseSql + """ AS stem FROM t)
        |SELECT stem, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(DISTINCT w) AS BIGINT) AS n_forms,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |FROM s GROUP BY stem ORDER BY n_tokens DESC, stem LIMIT 20""".stripMargin),
    // Dunning G^2 over the same bigram/margin counts: the four
    // contingency cells from (bc, c1, c2, N), zero cells contribute 0,
    // ROUND(...,4) is the cross-engine float-log seam (pmi precedent),
    // ranking uses the ROUNDED value + (w1,w2) so the cut is identical
    "text_llr" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT t[gi.i] AS w1, t[gi.i + 1] AS w2, COUNT(*) AS bc
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2 GROUP BY 1, 2),
        |m1 AS (SELECT w1, SUM(bc) AS c1 FROM bi GROUP BY w1),
        |m2 AS (SELECT w2, SUM(bc) AS c2 FROM bi GROUP BY w2),
        |nb AS (SELECT SUM(bc) AS n FROM bi),
        |t AS (SELECT w1, w2, bc, c1, c2, n,
        |        bc AS k11, c1 - bc AS k12, c2 - bc AS k21,
        |        n - c1 - c2 + bc AS k22
        |      FROM bi JOIN m1 USING (w1) JOIN m2 USING (w2), nb
        |      WHERE bc >= 5)
        |SELECT w1, w2, CAST(bc AS BIGINT) AS bc, CAST(c1 AS BIGINT) AS c1,
        |  CAST(c2 AS BIGINT) AS c2,
        |  ROUND(2.0 * (
        |    CASE WHEN k11 > 0 THEN k11 * ln((k11 * CAST(n AS DOUBLE))
        |      / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0 END +
        |    CASE WHEN k12 > 0 THEN k12 * ln((k12 * CAST(n AS DOUBLE))
        |      / (CAST(c1 AS DOUBLE) * CAST(n - c2 AS DOUBLE))) ELSE 0 END +
        |    CASE WHEN k21 > 0 THEN k21 * ln((k21 * CAST(n AS DOUBLE))
        |      / (CAST(n - c1 AS DOUBLE) * CAST(c2 AS DOUBLE))) ELSE 0 END +
        |    CASE WHEN k22 > 0 THEN k22 * ln((k22 * CAST(n AS DOUBLE))
        |      / (CAST(n - c1 AS DOUBLE) * CAST(n - c2 AS DOUBLE))) ELSE 0
        |    END), 4) AS llr
        |FROM t ORDER BY llr DESC, w1, w2 LIMIT 20""".stripMargin,
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id + 5000 AS doc_id,
        |    CASE WHEN doc_id % 40 = 0 THEN text
        |         ELSE text || ' zz_novel' END AS text
        |  FROM documents WHERE source = 'src0')
        |SELECT b.doc_id, md5(b.text) AS fp
        |FROM batch b
        |WHERE NOT EXISTS (SELECT 1 FROM documents h
        |                  WHERE md5(h.text) = md5(b.text))
        |ORDER BY b.doc_id""".stripMargin,
    "text_contamination" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' ')))) AS gram
        |  FROM t WHERE len(tk) >= 5),
        |b AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |d AS (SELECT doc_id, gram FROM g WHERE source != 'src0')
        |SELECT d.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_grams,
        |  CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  ROUND(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS hit_frac
        |FROM d LEFT JOIN b ON d.gram = b.gram
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |f AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM f)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
        |  ROUND(AVG(-ln(f.c / tot.n_total)), 4) AS avg_surprisal
        |FROM tok JOIN f USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sim_ivf_ann" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT c0.vec_id, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1),
        |j AS (SELECT p.vec_id AS probe_id, a.vec_id AS cand_id, p.cid,
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) AS cos
        |      FROM pasg p JOIN casg a USING (cid)),
        |r AS (SELECT probe_id, cand_id, cid, cos,
        |        ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn FROM j)
        |SELECT probe_id, cand_id AS neighbor_id, cid, ROUND(cos, 4) AS cos
        |FROM r WHERE rn = 1 ORDER BY probe_id""".stripMargin,
    "sim_ivf_nprobe" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT c0.vec_id, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn <= 2),
        |j AS (SELECT p.vec_id AS probe_id, a.vec_id AS cand_id,
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) AS cos
        |      FROM pasg p JOIN casg a USING (cid)),
        |r AS (SELECT probe_id, cand_id, cos,
        |        ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn FROM j)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn, ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 2 ORDER BY probe_id, rn""".stripMargin,
    "dedup_cluster" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pairs AS (
        |  SELECT a, b FROM inter
        |  JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |  WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION SELECT b, a FROM pairs
        |), reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        |)
        |SELECT id AS doc_id, MIN(r) AS component
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "pipeline_prep" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), quality AS (
        |  SELECT doc_id FROM corpus
        |  WHERE len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 100000
        |    AND length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 2
        |    AND length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) <= 15
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pairs AS (
        |  SELECT a, b FROM inter
        |  JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |  WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION SELECT b, a FROM pairs
        |), reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        |), losers AS (
        |  SELECT id AS doc_id FROM reach GROUP BY id HAVING id <> MIN(r)
        |)
        |SELECT c.doc_id,
        |  CAST(len(string_split(c.text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(len(list_distinct(string_split(c.text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(c.text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces
        |FROM corpus c
        |JOIN quality q ON q.doc_id = c.doc_id
        |LEFT JOIN losers l ON l.doc_id = c.doc_id
        |WHERE l.doc_id IS NULL
        |ORDER BY c.doc_id""".stripMargin,
    // temperature weights: each sqrt floor-quantized to micro-units
    // BEFORE the integer normalizing sum -- no float partial-sum order
    "prep_temperature" ->
      """WITH c AS (SELECT lang AS stratum, COUNT(*) AS n_docs
        |           FROM documents GROUP BY lang),
        |q AS (SELECT stratum, n_docs,
        |        CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000)
        |          AS BIGINT) AS sq_e6
        |      FROM c),
        |t AS (SELECT stratum, n_docs, sq_e6, SUM(sq_e6) OVER () AS tot
        |      FROM q)
        |SELECT stratum, CAST(n_docs AS BIGINT) AS n_docs, sq_e6,
        |  CAST(sq_e6 * 1000000 // tot AS BIGINT) AS weight_e6,
        |  CAST(LEAST(n_docs, sq_e6 * 2000 // tot) AS BIGINT) AS target_n
        |FROM t ORDER BY stratum""".stripMargin,
    // discretization fit: equal-width is all-integer ((v-mn)*10 // span,
    // capped), equal-frequency is NTILE over the total order (v, key) --
    // both replayed exactly
    "prep_bin" ->
      """WITH base AS (
        |  SELECT l_returnflag AS g,
        |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(l_orderkey AS VARCHAR) || '-' ||
        |      CAST(l_linenumber AS VARCHAR) AS k
        |  FROM lineitem),
        |st AS (SELECT g, MIN(v) AS mn, MAX(v) AS mx FROM base GROUP BY g),
        |wdt AS (SELECT base.g,
        |    CAST(LEAST(9, CASE WHEN mx = mn THEN 0
        |      ELSE ((v - mn) * 10) // (mx - mn) END) AS INT) AS bin,
        |    COUNT(*) AS n_width
        |  FROM base JOIN st USING (g) GROUP BY 1, 2),
        |frq AS (SELECT g, v,
        |    CAST(NTILE(10) OVER (PARTITION BY g ORDER BY v, k) - 1 AS INT)
        |      AS bin
        |  FROM base),
        |fa AS (SELECT g, bin, COUNT(*) AS n_freq, MIN(v) AS freq_lo,
        |         MAX(v) AS freq_hi
        |       FROM frq GROUP BY 1, 2)
        |SELECT COALESCE(fa.g, wdt.g) AS g, COALESCE(fa.bin, wdt.bin) AS bin,
        |  CAST(COALESCE(n_width, 0) AS BIGINT) AS n_width,
        |  CAST(COALESCE(n_freq, 0) AS BIGINT) AS n_freq,
        |  CAST(freq_lo AS BIGINT) AS freq_lo,
        |  CAST(freq_hi AS BIGINT) AS freq_hi
        |FROM fa FULL OUTER JOIN wdt ON fa.g = wdt.g AND fa.bin = wdt.bin
        |ORDER BY 1, 2""".stripMargin,
    // scaler fit: identical sufficient statistics and the SAME
    // mean/std expression text (ScaleMeanSql/ScaleStdSql), all
    // emissions floor-quantized
    "prep_scale" ->
      ("""WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(v) AS s, SUM(v * v) AS ss, MIN(v) AS mn, MAX(v) AS mx
        |  FROM (SELECT l_returnflag,
        |          CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |        FROM lineitem)
        |  GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, mn, mx, """.stripMargin +
        graft.operators.Prep.ScaleMeanSql + """ AS mean,
        |  """.stripMargin + graft.operators.Prep.ScaleStdSql + """ AS std
        |  FROM a)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(mean * 10000) AS BIGINT) AS mean_e4,
        |  CAST(FLOOR(std * 10000) AS BIGINT) AS std_e4,
        |  CAST(FLOOR((CAST(mx AS DOUBLE) - mean) / std * 10000) AS BIGINT)
        |    AS z_max_e4,
        |  CAST(FLOOR((CAST(mn AS DOUBLE) - mean) / std * 10000) AS BIGINT)
        |    AS z_min_e4,
        |  CAST(FLOOR((mean - CAST(mn AS DOUBLE))
        |    / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) * 1000000) AS BIGINT)
        |    AS minmax_mean_e6
        |FROM m ORDER BY l_returnflag""".stripMargin),
    "prep_split" ->
      """WITH h AS (SELECT doc_id, lang,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |  (ROW_NUMBER() OVER (PARTITION BY lang
        |     ORDER BY hv % 64, hv, doc_id) - 1) % 10 AS slot
        |  FROM h)
        |SELECT doc_id, lang,
        |  CASE WHEN slot = 0 THEN 'test' WHEN slot = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,
    // Group-aware split: same normalization, same group-rep min, same
    // salted rank at GROUP granularity, same member propagation.
    "prep_leakage_split" ->
      """WITH k AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS gkey
        |  FROM documents),
        |g AS (SELECT gkey, MIN(doc_id) AS group_rep FROM k GROUP BY gkey),
        |h AS (SELECT gkey, group_rep,
        |  ('0x' || substr(md5(CAST(group_rep AS VARCHAR)), 1, 15))::BIGINT
        |    AS hv
        |  FROM g),
        |r AS (SELECT gkey, group_rep,
        |  (ROW_NUMBER() OVER (ORDER BY hv % 64, hv, group_rep) - 1) % 10
        |    AS slot
        |  FROM h)
        |SELECT k.doc_id, r.group_rep,
        |  CASE WHEN slot = 0 THEN 'test' WHEN slot = 1 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM k JOIN r USING (gkey) ORDER BY k.doc_id""".stripMargin,
    "prep_kfold" ->
      """WITH h AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
        |  FROM documents)
        |SELECT doc_id, source,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY hv % 64, hv, doc_id) - 1) % 5 AS BIGINT) AS fold
        |FROM h ORDER BY doc_id""".stripMargin,
    // same portable hash mask, same kept-token fingerprint
    "prep_augment" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tok AS (
        |  SELECT doc_id, g.i - 1 AS pos, tk[g.i] AS tok
        |  FROM t, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) g),
        |m AS (
        |  SELECT doc_id, pos, tok,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(pos AS VARCHAR)), 1, 15))::BIGINT % 10 <> 0 AS keep
        |  FROM tok)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped,
        |  md5(COALESCE(string_agg(tok, ' ' ORDER BY pos)
        |    FILTER (WHERE keep), '')) AS aug_fp,
        |  ROUND(CAST(COUNT(*) - SUM(CASE WHEN keep THEN 0 ELSE 1 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS kept_ratio
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same slices, same md5 content fingerprints — geometry AND content
    "prep_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tk, n, g.c
        |  FROM t, LATERAL (SELECT unnest(range(0,
        |    CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END)) AS c) g
        |  WHERE n >= 1)
        |SELECT doc_id, CAST(c AS BIGINT) AS chunk_id,
        |  CAST(LEAST(32, n - c * 24) AS INT) AS n_tokens,
        |  md5(array_to_string(
        |    list_slice(tk, CAST(c * 24 + 1 AS INT),
        |      CAST(LEAST(c * 24 + 32, n) AS INT)), ' ')) AS fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "prep_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT doc_id, n_tok,
        |  CAST(cum - n_tok AS BIGINT) AS tok_start,
        |  CAST(floor((cum - n_tok) / 1024) AS BIGINT) AS seq_first,
        |  CAST(floor((cum - 1) / 1024) AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,
    // The oracle is the DEFINITION — row_number over the md5 key order;
    // the engine's two-level prefix sum must reproduce it exactly.
    "prep_shuffle" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS sk,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42')) - 1 AS BIGINT) AS pos
        |FROM documents ORDER BY pos""".stripMargin,
    "sim_pq_ann" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, label, emb[1:32] AS s1, emb[33:64] AS s2
        |       FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb[1:32] AS s1, emb[33:64] AS s2
        |       FROM e WHERE vec_id < 10),
        |cb1 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(s1[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |cb2 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(s2[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |d1 AS (SELECT c0.vec_id AS cand_id, cb1.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (c0.s1[i] - cb1.cemb[i]) * (c0.s1[i] - cb1.cemb[i]))) AS dist
        |  FROM c0, cb1),
        |e1 AS (SELECT cand_id, cid AS c1 FROM (
        |    SELECT cand_id, cid,
        |      ROW_NUMBER() OVER (PARTITION BY cand_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1),
        |d2 AS (SELECT c0.vec_id AS cand_id, cb2.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (c0.s2[i] - cb2.cemb[i]) * (c0.s2[i] - cb2.cemb[i]))) AS dist
        |  FROM c0, cb2),
        |e2 AS (SELECT cand_id, cid AS c2 FROM (
        |    SELECT cand_id, cid,
        |      ROW_NUMBER() OVER (PARTITION BY cand_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1),
        |pd1 AS (SELECT p0.vec_id AS probe_id, cb1.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (p0.s1[i] - cb1.cemb[i]) * (p0.s1[i] - cb1.cemb[i]))) AS pd
        |  FROM p0, cb1),
        |pd2 AS (SELECT p0.vec_id AS probe_id, cb2.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (p0.s2[i] - cb2.cemb[i]) * (p0.s2[i] - cb2.cemb[i]))) AS pd
        |  FROM p0, cb2),
        |adc AS (
        |  SELECT pd1.probe_id, e1.cand_id, e1.c1, e2.c2, pd1.pd + pd2.pd AS adist
        |  FROM e1 JOIN e2 USING (cand_id), pd1, pd2
        |  WHERE pd1.cid = e1.c1 AND pd2.cid = e2.c2
        |    AND pd2.probe_id = pd1.probe_id AND pd1.probe_id <> e1.cand_id),
        |r AS (SELECT probe_id, cand_id, c1, c2, adist,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rn
        |  FROM adc)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
        |  ROUND(adist, 4) AS approx_dist
        |FROM r WHERE rn <= 2 ORDER BY probe_id, rn""".stripMargin,
    "sim_range_search" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10)
        |SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |  ROUND(list_dot_product(p.emb, c.emb)
        |    / (sqrt(list_dot_product(p.emb, p.emb))
        |       * sqrt(list_dot_product(c.emb, c.emb))), 4) AS cos
        |FROM p0 p, c0 c
        |WHERE c.vec_id <> p.vec_id
        |  AND list_dot_product(p.emb, c.emb)
        |    / (sqrt(list_dot_product(p.emb, p.emb))
        |       * sqrt(list_dot_product(c.emb, c.emb))) >= 0.25
        |ORDER BY probe_id, neighbor_id""".stripMargin,
    "prep_weighted_sample" ->
      """WITH q AS (SELECT doc_id,
        |    ROUND(len(list_intersect(list_distinct(string_split(text, ' ')),
        |        ['the','a','of','and','to','in','is']))
        |      / CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE), 4) AS w
        |  FROM documents)
        |SELECT doc_id, ROUND(w, 4) AS w FROM q
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |        AS DOUBLE) < w * 1152921504606846976.0
        |ORDER BY doc_id""".stripMargin,
    "dedup_incremental_lsh" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         array_to_string(list_slice(string_split(text, ' '), 1,
        |           len(string_split(text, ' ')) - 1), ' ') AS text
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |           i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |                || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3
        |), ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
        |SELECT a, b, ROUND(c / CAST(na.n + nb.n - c AS DOUBLE), 4) AS jaccard
        |FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5 AND b >= 1000000
        |ORDER BY a, b""".stripMargin,
    // Measured SQ8 recall@1: the exact inner-product truth and the full
    // quantized ranking both recomputed — the sim_pq_recall pattern.
    "sim_sq_recall" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_dot_product(p.emb, c.emb) DESC, c.vec_id) AS rn
        |    FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id) WHERE rn = 1),
        |st AS (SELECT MAX(list_max(list_transform(emb, x -> abs(x)))) AS ma
        |  FROM c0),
        |cc AS (SELECT c0.vec_id, g.d,
        |    CASE WHEN st.ma = 0 THEN 0
        |         ELSE LEAST(127, GREATEST(-128, CAST(floor(
        |           emb[g.d] / st.ma * 128.0) AS BIGINT)))
        |    END AS q
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, st),
        |pc AS (SELECT p0.vec_id, g.d,
        |    CASE WHEN st.ma = 0 THEN 0
        |         ELSE LEAST(127, GREATEST(-128, CAST(floor(
        |           emb[g.d] / st.ma * 128.0) AS BIGINT)))
        |    END AS q
        |  FROM p0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, st),
        |dt AS (SELECT pc.vec_id AS probe_id, cc.vec_id AS cand_id,
        |    SUM(pc.q * cc.q) AS qdot
        |  FROM pc JOIN cc ON pc.d = cc.d AND pc.vec_id <> cc.vec_id
        |  GROUP BY 1, 2),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT probe_id, cand_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY qdot DESC, cand_id) AS rn FROM dt) WHERE rn = 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
        |    CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM tr LEFT JOIN ann USING (probe_id))
        |SELECT 'sq8' AS method, n_probes, hits,
        |  ROUND(hits / CAST(n_probes AS DOUBLE), 4) AS recall_at_1
        |FROM m""".stripMargin,
    // range IVF: the sim_ivf_ann assignment replay with the radius
    // filter in the cell join; the recall row is PAIR-level (a radius
    // answer is a set) vs the unbucketed truth
    "sim_range_ivf" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT c0.vec_id, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1)
        |SELECT p.vec_id AS probe_id, a.vec_id AS neighbor_id, p.cid,
        |  ROUND(list_dot_product(p.emb, a.emb)
        |    / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))), 4) AS cos
        |FROM pasg p JOIN casg a USING (cid)
        |WHERE p.vec_id <> a.vec_id
        |  AND list_dot_product(p.emb, a.emb)
        |    / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) >= 0.25
        |ORDER BY probe_id, neighbor_id""".stripMargin,
    "sim_range_ivf_recall" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |tr AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id
        |  FROM p0 p, c0 c
        |  WHERE c.vec_id <> p.vec_id
        |    AND list_dot_product(p.emb, c.emb)
        |      / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(c.emb, c.emb))) >= 0.25),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT c0.vec_id, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1),
        |ann AS (SELECT p.vec_id AS probe_id, a.vec_id AS neighbor_id
        |  FROM pasg p JOIN casg a USING (cid)
        |  WHERE p.vec_id <> a.vec_id
        |    AND list_dot_product(p.emb, a.emb)
        |      / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) >= 0.25),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN ann.probe_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM tr LEFT JOIN ann USING (probe_id, neighbor_id))
        |SELECT 'range_ivf' AS method, n_pairs, hits,
        |  ROUND(hits / CAST(n_pairs AS DOUBLE), 4) AS pair_recall
        |FROM m""".stripMargin,
    // filtered IVF: the sim_ivf_ann oracle with the label predicate in
    // the candidate join (cell AND label must match); the recall row
    // replays the exact filtered truth beside it
    "sim_filtered_ivf" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, label, emb, cid FROM (
        |  SELECT c0.vec_id, c0.label, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, label, emb, cid FROM (
        |  SELECT p0.vec_id, p0.label, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1),
        |j AS (SELECT p.vec_id AS probe_id, a.vec_id AS cand_id,
        |        p.label AS label, p.cid,
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) AS cos
        |      FROM pasg p JOIN casg a USING (cid) WHERE a.label = p.label),
        |r AS (SELECT probe_id, cand_id, label, cid, cos,
        |        ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn FROM j)
        |SELECT probe_id, cand_id AS neighbor_id, label, cid,
        |  CAST(rn AS BIGINT) AS rn, ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    "sim_filtered_ivf_recall" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_dot_product(p.emb, c.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(c.emb, c.emb))) DESC,
        |        c.vec_id) AS rn
        |    FROM p0 p, c0 c
        |    WHERE c.label = p.label AND c.vec_id <> p.vec_id) WHERE rn = 1),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, label, emb, cid FROM (
        |  SELECT c0.vec_id, c0.label, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, label, emb, cid FROM (
        |  SELECT p0.vec_id, p0.label, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT p.vec_id AS probe_id, a.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) DESC,
        |        a.vec_id) AS rn
        |    FROM pasg p JOIN casg a USING (cid)
        |    WHERE a.label = p.label) WHERE rn = 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
        |    CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM tr LEFT JOIN ann USING (probe_id))
        |SELECT 'filtered_ivf' AS method, n_probes, hits,
        |  ROUND(hits / CAST(n_probes AS DOUBLE), 4) AS recall_at_1
        |FROM m""".stripMargin,
    // BQ: sign bits vs the per-dimension corpus MIDRANGE ((min+max)/2 —
    // order-independent, so both engines derive bit-identical
    // thresholds; a mean would not survive partial-agg reassociation),
    // packed 32 dims per word (no engine hits its 1<<63 overflow
    // spelling), Hamming shortlist of 32, exact-double-dot rerank (the
    // same in-order list summation the mips oracle hash-matches).
    "sim_bq_ann" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |mm AS (SELECT g.d AS d,
        |    (MIN(emb[g.d]) + MAX(emb[g.d])) / 2.0 AS mid
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g
        |  GROUP BY 1),
        |cw AS (SELECT c0.vec_id, (g.d - 1) // 32 AS w,
        |    CAST(SUM(CASE WHEN emb[g.d] > mm.mid
        |      THEN 1::BIGINT << ((g.d - 1) % 32) ELSE 0 END) AS BIGINT) AS word
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, mm
        |  WHERE mm.d = g.d GROUP BY 1, 2),
        |pw AS (SELECT p0.vec_id, (g.d - 1) // 32 AS w,
        |    CAST(SUM(CASE WHEN emb[g.d] > mm.mid
        |      THEN 1::BIGINT << ((g.d - 1) % 32) ELSE 0 END) AS BIGINT) AS word
        |  FROM p0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, mm
        |  WHERE mm.d = g.d GROUP BY 1, 2),
        |hm AS (SELECT pw.vec_id AS probe_id, cw.vec_id AS cand_id,
        |    CAST(SUM(bit_count(xor(pw.word, cw.word))) AS BIGINT) AS hamming
        |  FROM pw JOIN cw ON pw.w = cw.w AND pw.vec_id <> cw.vec_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY hamming, cand_id) AS hrn FROM hm),
        |rr AS (SELECT sl.probe_id, sl.cand_id, sl.hamming,
        |    list_dot_product(p.emb, c.emb) AS ip
        |  FROM sl JOIN p0 p ON p.vec_id = sl.probe_id
        |          JOIN c0 c ON c.vec_id = sl.cand_id
        |  WHERE sl.hrn <= 32),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY ip DESC, cand_id) AS rn FROM rr)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  hamming, ROUND(ip, 4) AS ip
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    "sim_bq_recall" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |        ORDER BY list_dot_product(p.emb, c.emb) DESC, c.vec_id) AS rn
        |    FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id) WHERE rn = 1),
        |mm AS (SELECT g.d AS d,
        |    (MIN(emb[g.d]) + MAX(emb[g.d])) / 2.0 AS mid
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g
        |  GROUP BY 1),
        |cw AS (SELECT c0.vec_id, (g.d - 1) // 32 AS w,
        |    CAST(SUM(CASE WHEN emb[g.d] > mm.mid
        |      THEN 1::BIGINT << ((g.d - 1) % 32) ELSE 0 END) AS BIGINT) AS word
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, mm
        |  WHERE mm.d = g.d GROUP BY 1, 2),
        |pw AS (SELECT p0.vec_id, (g.d - 1) // 32 AS w,
        |    CAST(SUM(CASE WHEN emb[g.d] > mm.mid
        |      THEN 1::BIGINT << ((g.d - 1) % 32) ELSE 0 END) AS BIGINT) AS word
        |  FROM p0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, mm
        |  WHERE mm.d = g.d GROUP BY 1, 2),
        |hm AS (SELECT pw.vec_id AS probe_id, cw.vec_id AS cand_id,
        |    CAST(SUM(bit_count(xor(pw.word, cw.word))) AS BIGINT) AS hamming
        |  FROM pw JOIN cw ON pw.w = cw.w AND pw.vec_id <> cw.vec_id
        |  GROUP BY 1, 2),
        |sl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY hamming, cand_id) AS hrn FROM hm),
        |rr AS (SELECT sl.probe_id, sl.cand_id,
        |    list_dot_product(p.emb, c.emb) AS ip
        |  FROM sl JOIN p0 p ON p.vec_id = sl.probe_id
        |          JOIN c0 c ON c.vec_id = sl.cand_id
        |  WHERE sl.hrn <= 32),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT probe_id, cand_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY ip DESC, cand_id) AS rn FROM rr) WHERE rn = 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
        |    CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits
        |  FROM tr LEFT JOIN ann USING (probe_id))
        |SELECT 'bq1bit' AS method, n_probes, hits,
        |  ROUND(hits / CAST(n_probes AS DOUBLE), 4) AS recall_at_1
        |FROM m""".stripMargin,
    // SQ8: symmetric single-scale int8 codes against the corpus max-abs
    // (floor, not round — half-case spelling differs across engines),
    // exact integer dot ranking — every code and rank reproduces
    // bit-for-bit.
    "sim_scalar_quant" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |st AS (SELECT MAX(list_max(list_transform(emb, x -> abs(x)))) AS ma
        |  FROM c0),
        |cc AS (SELECT c0.vec_id, g.d,
        |    CASE WHEN st.ma = 0 THEN 0
        |         ELSE LEAST(127, GREATEST(-128, CAST(floor(
        |           emb[g.d] / st.ma * 128.0) AS BIGINT)))
        |    END AS q
        |  FROM c0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, st),
        |pc AS (SELECT p0.vec_id, g.d,
        |    CASE WHEN st.ma = 0 THEN 0
        |         ELSE LEAST(127, GREATEST(-128, CAST(floor(
        |           emb[g.d] / st.ma * 128.0) AS BIGINT)))
        |    END AS q
        |  FROM p0, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS d) g, st),
        |dt AS (SELECT pc.vec_id AS probe_id, cc.vec_id AS cand_id,
        |    SUM(pc.q * cc.q) AS qdot
        |  FROM pc JOIN cc ON pc.d = cc.d AND pc.vec_id <> cc.vec_id
        |  GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |        ORDER BY qdot DESC, cand_id) AS rn FROM dt)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  CAST(qdot AS BIGINT) AS qdot
        |FROM r WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin,
    "sim_mips_topk" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |r AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    list_dot_product(p.emb, c.emb) AS ip,
        |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
        |      ORDER BY list_dot_product(p.emb, c.emb) DESC, c.vec_id) AS rn
        |  FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  ROUND(ip, 4) AS ip
        |FROM r WHERE rn <= 2 ORDER BY probe_id, rn""".stripMargin,
    "dedup_soft" ->
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) || '  !!!' FROM documents),
        |n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM v)
        |SELECT doc_id,
        |  CAST(COUNT(*) OVER (PARTITION BY norm_text) AS BIGINT) AS n_dups,
        |  ROUND(CAST(1.0 AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY norm_text), 6) AS weight
        |FROM n ORDER BY doc_id""".stripMargin,
    "prep_interleave" ->
      """WITH si AS (SELECT src,
        |    CAST(ROW_NUMBER() OVER (ORDER BY src) - 1 AS BIGINT) AS src_idx
        |  FROM (SELECT DISTINCT source AS src FROM documents)),
        |ns AS (SELECT COUNT(*) AS n FROM si),
        |r AS (SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |               doc_id) - 1 AS BIGINT) AS rk
        |  FROM documents)
        |SELECT r.doc_id, r.source, r.rk * ns.n + si.src_idx AS slot
        |FROM r JOIN si ON r.source = si.src, ns ORDER BY slot""".stripMargin,
    // Take-while-under-budget in portable-hash order per stratum: the
    // surviving id set, token counts, and running totals all replay
    // exactly; the budget is exceeded by at most the crossing document.
    "prep_token_budget" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |b AS (SELECT * FROM (VALUES ('en', 20000), ('de', 8000),
        |      ('es', 8000), ('fr', 4000), ('zh', 4000)) t(stratum, budget)),
        |c AS (SELECT doc_id, lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM d)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
        |FROM c JOIN b ON c.lang = b.stratum
        |WHERE cum_before < budget ORDER BY doc_id""".stripMargin,
    "prep_curriculum" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |f AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM f),
        |sc AS (
        |  SELECT doc_id, ROUND(AVG(-ln(f.c / tot.n_total)), 4) AS difficulty
        |  FROM tok JOIN f USING (t) CROSS JOIN tot GROUP BY doc_id)
        |SELECT doc_id, difficulty,
        |  CAST(NTILE(4) OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS stage
        |FROM sc ORDER BY doc_id""".stripMargin,
    "dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    'w'||CAST(doc_id AS VARCHAR)||'a w'||CAST(doc_id AS VARCHAR)||'b w'
        |      ||CAST(doc_id AS VARCHAR)||'c '||text||' w'||CAST(doc_id AS VARCHAR)
        |      ||'d w'||CAST(doc_id AS VARCHAR)||'e'
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
        |           || ' ' || string_split(text, ' ')[i+2])) AS shingles
        |  FROM corpus WHERE len(string_split(text, ' ')) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
        |inter AS (
        |  SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS c
        |  FROM ex l JOIN ex r ON l.sg = r.sg AND l.doc_id < r.doc_id
        |  GROUP BY 1, 2),
        |sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
        |SELECT a, b, ROUND(c / CAST(least(na.n, nb.n) AS DOUBLE), 4) AS containment
        |FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |WHERE c / CAST(least(na.n, nb.n) AS DOUBLE) >= 0.9
        |ORDER BY a, b""".stripMargin,
    // The trained 6-merge list applied end-to-end: the oracle replays the
    // unrolled training recurrence (same argmax + exhaustive leftmost
    // replace both engines) and counts the FINAL vocabulary's pieces.
    "text_bpe_apply" -> bpeApplyOracleSql(rounds = 6),
    // The learned merge list itself, one row per training round.
    "text_bpe_train" -> bpeTrainOracleSql(rounds = 6),
    // Byte-level (GPT-2-style) merges over documents + the multi-byte
    // fixture, replayed in DuckDB from the same pre-tokenizer regex and
    // UTF-8 byte mapping.
    "text_bpe_bytes" -> bpeBytesTrainOracleSql(rounds = 8,
      LlmQueries.ByteBpeFixture.map(t => s"('$t')").mkString(", ")),
    // Per-doc byte-level tokenization statistics under the trained
    // merges: the recurrence's final vocabulary joined to each doc's
    // pre-token stream.
    "text_bpe_bytes_encode" -> bpeBytesEncodeOracleSql(rounds = 8,
      LlmQueries.ByteBpeFixture.map(t => s"('$t')").mkString(", ")),
    // CCNet head/middle/tail: the text_lm_score surprisal ranked per
    // language on the rounded score (doc_id tie-break) into terciles.
    "prep_perplexity_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |f AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM f),
        |sc AS (SELECT doc_id,
        |    ROUND(AVG(-ln(f.c / tot.n_total)), 4) AS s
        |  FROM tok JOIN f USING (t) CROSS JOIN tot GROUP BY doc_id),
        |j AS (SELECT d.lang, sc.doc_id, sc.s
        |  FROM sc JOIN documents d USING (doc_id)),
        |rk AS (SELECT lang, doc_id, s,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY s, doc_id) AS r,
        |    COUNT(*) OVER (PARTITION BY lang) AS n FROM j),
        |b AS (SELECT lang, s,
        |    CASE WHEN r * 3 <= n THEN 'head'
        |         WHEN r * 3 <= n * 2 THEN 'middle'
        |         ELSE 'tail' END AS bucket FROM rk)
        |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(s) AS min_surprisal, MAX(s) AS max_surprisal,
        |  ROUND(SUM(CAST(floor(s * 10000 + 0.5) AS BIGINT))
        |    / (COUNT(*) * 10000.0), 4) AS mean_surprisal
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,
    // GPT-3-style quality filter: the oracle replays the exact
    // feature SQL, the planted label, LogReg's bit-exact recurrence,
    // and the deterministic Pareto keep rule with the same multiply
    // chain.
    "prep_quality_filter" -> {
      val rec = graft.operators.LogReg.oracleRecurrence(
        xScale = 1000, iters = 10, lr = 4.0)
      val sig = graft.operators.LogReg.oracleSig(
        graft.operators.LogReg.oracleZ("w10", 1000))
      s"""WITH feats AS (
         |  SELECT doc_id, source,
         |    ((length(text) - len(string_split(text, ' ')) + 1)
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE) - 4.5)
         |      / 0.8 AS x1,
         |    (len(list_filter(string_split(text, ' '),
         |      w -> w IN ('the','of','and','to','a','in','is','it',
         |                 'for','on')))
         |      / CAST(len(string_split(text, ' ')) AS DOUBLE) - 0.06)
         |      / 0.16 AS x2
         |  FROM documents),
         |base AS (SELECT doc_id, source, x1, x2,
         |    CAST(x1 + 2.0 * x2 +
         |      ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |        ::BIGINT % 1000) / 1000.0 - 0.5) > 0.0 AS BIGINT) AS y
         |  FROM feats),
         |q AS MATERIALIZED (SELECT doc_id, source, y,
         |  CAST(floor(x1 * 1000 + 0.5) AS BIGINT) AS xq1,
         |  CAST(floor(x2 * 1000 + 0.5) AS BIGINT) AS xq2 FROM base),
         |$rec,
         |scored AS (SELECT doc_id, source,
         |    ROUND($sig, 4) + 0.0 AS p FROM q),
         |k1 AS (SELECT source, p,
         |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|u'),
         |      1, 15))::BIGINT % 1000000) / 1000000.0 AS u,
         |    2.0 - p AS t FROM scored),
         |k2 AS (SELECT source, p, u, t, t * t AS t2 FROM k1),
         |k3 AS (SELECT source, p, u, t, t2 * t2 AS t4 FROM k2),
         |k4 AS (SELECT source, p,
         |    (1.0 - u) * (t4 * t4 * t) < 1.0 AS keep FROM k3)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CAST(keep AS BIGINT)) AS BIGINT) AS n_kept,
         |  ROUND(SUM(CAST(floor(p * 10000 + 0.5) AS BIGINT))
         |    / (COUNT(*) * 10000.0), 4) AS mean_score
         |FROM k4 GROUP BY source ORDER BY source""".stripMargin
    },
    // C4 line/page cleaning rules; the fixture VALUES mirror
    // LlmQueries.C4Fixture literally.
    "text_c4_filters" -> {
      val fx = LlmQueries.C4Fixture.map { case (i, t) =>
        s"(CAST($i AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n  ")
      s"""WITH fx(fid, text) AS (VALUES
         |  $fx),
         |allr AS (
         |  SELECT fid + 9100000 AS doc_id, text, 'fx' || fid AS grp FROM fx
         |  UNION ALL SELECT doc_id, text, source AS grp FROM documents),
         |m AS (SELECT grp,
         |    len(string_split(text, chr(10))) AS n_lines,
         |    len(list_filter(string_split(text, chr(10)), l ->
         |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
         |        OR ends_with(l, '"'))
         |      AND len(string_split(l, ' ')) >= 5
         |      AND NOT contains(lower(l), 'javascript'))) AS n_lines_kept,
         |    CAST((length(text) - length(replace(text, '.', '')))
         |      + (length(text) - length(replace(text, '!', '')))
         |      + (length(text) - length(replace(text, '?', ''))) >= 3
         |      AND NOT contains(lower(text), 'lorem ipsum')
         |      AND NOT contains(text, '{') AS BIGINT) AS page_kept
         |  FROM allr)
         |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(page_kept) AS BIGINT) AS n_docs_kept,
         |  CAST(SUM(n_lines) AS BIGINT) AS n_lines,
         |  CAST(SUM(n_lines_kept) AS BIGINT) AS n_lines_kept
         |FROM m GROUP BY grp ORDER BY grp""".stripMargin
    },
    // Gopher/MassiveText heuristics, integer-exact thresholds; the
    // fixture VALUES mirror LlmQueries.GopherFixture literally.
    "text_gopher_rules" -> {
      val fx = LlmQueries.GopherFixture.map { case (i, t) =>
        s"(CAST($i AS BIGINT), '${t.replace("'", "''")}')"
      }.mkString(",\n  ")
      s"""WITH fx(fid, text) AS (VALUES
         |  $fx),
         |allr AS (
         |  SELECT fid + 9000000 AS doc_id, text, 'fx' || fid AS grp FROM fx
         |  UNION ALL SELECT doc_id, text, source AS grp FROM documents),
         |m AS (SELECT grp,
         |    len(string_split(text, ' ')) AS nw,
         |    length(text) - len(string_split(text, ' ')) + 1 AS chars,
         |    (length(text) - length(replace(text, '#', '')))
         |      + (length(text) - length(replace(text, '...', ''))) // 3
         |      + (length(text) - length(replace(text, '…', ''))) AS sym,
         |    len(string_split(text, chr(10))) AS nl,
         |    len(list_filter(string_split(text, chr(10)), l ->
         |      starts_with(l, '- ') OR starts_with(l, '* ')
         |      OR starts_with(l, '•'))) AS bl,
         |    len(list_filter(string_split(text, chr(10)), l ->
         |      ends_with(l, '...') OR ends_with(l, '…'))) AS el,
         |    len(list_filter(string_split(text, ' '), w ->
         |      regexp_matches(w, '[A-Za-z]'))) AS aw,
         |    len(list_intersect(list_distinct(string_split(text, ' ')),
         |      ['the','be','to','of','and','that','have','with'])) AS sp
         |  FROM allr),
         |r AS (SELECT grp,
         |    nw BETWEEN 50 AND 100000 AS r_wordcount,
         |    chars >= nw * 3 AND chars <= nw * 10 AS r_wordlen,
         |    sym * 10 < nw AS r_symbol,
         |    bl * 10 <= nl AS r_bullet,
         |    el * 10 <= nl * 3 AS r_ellipsis,
         |    aw * 5 >= nw * 4 AS r_alpha,
         |    sp >= 2 AS r_stopword
         |  FROM m)
         |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CAST(NOT r_wordcount AS BIGINT)) AS BIGINT)
         |    AS viol_wordcount,
         |  CAST(SUM(CAST(NOT r_wordlen AS BIGINT)) AS BIGINT)
         |    AS viol_wordlen,
         |  CAST(SUM(CAST(NOT r_symbol AS BIGINT)) AS BIGINT)
         |    AS viol_symbol,
         |  CAST(SUM(CAST(NOT r_bullet AS BIGINT)) AS BIGINT)
         |    AS viol_bullet,
         |  CAST(SUM(CAST(NOT r_ellipsis AS BIGINT)) AS BIGINT)
         |    AS viol_ellipsis,
         |  CAST(SUM(CAST(NOT r_alpha AS BIGINT)) AS BIGINT) AS viol_alpha,
         |  CAST(SUM(CAST(NOT r_stopword AS BIGINT)) AS BIGINT)
         |    AS viol_stopword,
         |  CAST(SUM(CAST(r_wordcount AND r_wordlen AND r_symbol
         |    AND r_bullet AND r_ellipsis AND r_alpha AND r_stopword
         |    AS BIGINT)) AS BIGINT) AS n_pass
         |FROM r GROUP BY grp ORDER BY grp""".stripMargin
    },
    // UTF-8 Table 3-7 DFA, fixture classes + the whole-corpus fold.
    "text_utf8_validate" -> utf8ValidateOracleSql(
      LlmQueries.Utf8Fixture.map { case (i, h) =>
        s"(CAST($i AS BIGINT), '$h')" }.mkString(", ")),
    // unigram-LM tokenizer: the two-round lattice recurrence unrolled as
    // 10-step DP CTE chains per round (TextAnalysis.unigramOracleSql)
    "text_unigram_lm" -> graft.operators.TextAnalysis.unigramOracleSql(),
    // the trained segmentation joined back over every document's tokens
    "text_unigram_encode" ->
      graft.operators.TextAnalysis.unigramEncodeOracleSql(),
    // Per-doc tokenization statistics with the trained list.
    "text_bpe_encode" -> bpeEncodeOracleSql(rounds = 6),
    // Same 4-gram hashes, same two-window selection rule: pos p selected
    // iff MAX over valid starts j in [p-3, p] of (MIN over [j, j+3]) = h(p).
    "text_winnowing" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |ng AS (SELECT doc_id,
        |  CAST(GREATEST(len(tk) - 3, 0) AS BIGINT) AS n_grams FROM tk),
        |posts AS (SELECT doc_id, g.i AS pos,
        |    ('0x' || substr(md5(array_to_string(
        |       list_slice(tk, g.i, g.i + 3), ' ')), 1, 15))::BIGINT AS h
        |  FROM (SELECT * FROM tk WHERE len(tk) >= 4) t,
        |       LATERAL (SELECT unnest(range(1, len(tk) - 2)) AS i) g),
        |wm AS (SELECT doc_id, pos, h,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
        |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh
        |  FROM posts),
        |wv AS (SELECT doc_id, pos, h,
        |    CASE WHEN pos <= n - 3 THEN mh END AS mhv FROM wm),
        |sel AS (SELECT doc_id, pos, h FROM (
        |  SELECT doc_id, pos, h,
        |    MAX(mhv) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sm
        |  FROM wv) WHERE sm = h),
        |fp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
        |       FROM sel GROUP BY doc_id)
        |SELECT ng.doc_id, ng.n_grams,
        |  CAST(COALESCE(fp.n_fp, 0) AS BIGINT) AS n_fp,
        |  ROUND(COALESCE(fp.n_fp, 0)
        |    / CAST(GREATEST(ng.n_grams, 1) AS DOUBLE), 4) AS density
        |FROM ng LEFT JOIN fp ON ng.doc_id = fp.doc_id
        |ORDER BY ng.doc_id""".stripMargin,
    // onion removal: same postings/hash/maxDf machinery, per-gram MIN
    // doc is the keeper, marked token windows strip, kept text
    // fingerprinted in order
    "dedup_span_removal" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |tk8 AS (SELECT doc_id, tk FROM b WHERE len(tk) >= 8),
        |posts AS (SELECT doc_id, g.i AS pos,
        |    ('0x' || substr(md5(array_to_string(
        |       list_slice(tk, g.i, g.i + 7), ' ')), 1, 15))::BIGINT AS h
        |  FROM tk8, LATERAL (SELECT unnest(range(1, len(tk) - 6)) AS i) g),
        |dup AS (SELECT h, keeper FROM (
        |  SELECT h, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS keeper
        |  FROM posts GROUP BY h) WHERE nd > 1 AND nd <= 64),
        |marks AS (SELECT DISTINCT p.doc_id, g.t
        |  FROM posts p JOIN dup d USING (h),
        |  LATERAL (SELECT unnest(range(p.pos, p.pos + 8)) AS t) g
        |  WHERE p.doc_id > d.keeper),
        |toks AS (SELECT doc_id, g.i AS pos, tk[g.i] AS tok
        |  FROM b, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) g),
        |kept AS (SELECT t.doc_id, t.pos, t.tok
        |  FROM toks t LEFT JOIN marks m ON t.doc_id = m.doc_id AND t.pos = m.t
        |  WHERE m.doc_id IS NULL),
        |ka AS (SELECT doc_id, md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_fp
        |       FROM kept GROUP BY doc_id),
        |nr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
        |       FROM marks GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM b)
        |SELECT tot.doc_id, n_tokens, n_removed, kept_fp
        |FROM tot JOIN nr USING (doc_id) JOIN ka USING (doc_id)
        |ORDER BY tot.doc_id""".stripMargin,
    "dedup_span" ->
      """WITH b AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |corpus AS (
        |  SELECT doc_id, tk FROM b
        |  UNION ALL
        |  SELECT doc_id + 1000000, list_slice(tk, 1, len(tk) - 1) FROM b
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    list_concat(list_slice(tk, 1, 24), list_slice(tk, 5, 28))
        |  FROM b WHERE doc_id % 7 = 0),
        |tk8 AS (SELECT doc_id, tk FROM corpus WHERE len(tk) >= 8),
        |posts AS (SELECT doc_id, g.i AS pos,
        |    ('0x' || substr(md5(array_to_string(
        |       list_slice(tk, g.i, g.i + 7), ' ')), 1, 15))::BIGINT AS h
        |  FROM tk8, LATERAL (SELECT unnest(range(1, len(tk) - 6)) AS i) g),
        |hot AS (SELECT h FROM (
        |  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM posts GROUP BY h)
        |  WHERE nd > 64),
        |kept AS (SELECT * FROM posts WHERE h NOT IN (SELECT h FROM hot)),
        |m AS (SELECT a.doc_id AS d1, b2.doc_id AS d2, a.pos AS p1,
        |        b2.pos AS p2, a.h
        |      FROM kept a JOIN kept b2 USING (h)
        |      WHERE a.doc_id < b2.doc_id),
        |isl AS (SELECT d1, d2, p1 - p2 AS diag, p1, h,
        |        p1 - ROW_NUMBER() OVER (PARTITION BY d1, d2, p1 - p2
        |          ORDER BY p1) AS islid
        |      FROM m),
        |per AS (SELECT d1, d2, diag, islid, COUNT(*) AS glen
        |        FROM isl GROUP BY 1, 2, 3, 4),
        |agg AS (SELECT d1, d2, MAX(glen) + 7 AS longest_run
        |        FROM per GROUP BY 1, 2),
        |sh2 AS (SELECT d1, d2, COUNT(DISTINCT h) AS shared_grams
        |        FROM m GROUP BY 1, 2)
        |SELECT d1, d2, longest_run, shared_grams
        |FROM agg JOIN sh2 USING (d1, d2)
        |WHERE longest_run >= 12 ORDER BY d1, d2""".stripMargin,
    // Ground-truth oracle: ALL within-nation pairs scored with NO name
    // blocking — a parity-block recall miss in the engine shows up as a
    // missing row here, so blocking losslessness is oracle-verified.
    "dedup_linkage" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk,
        |         c_acctbal AS bal, c_mktsegment AS seg FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000,
        |         substr(c_name, 1, length(c_name) - 1) || 'X',
        |         c_nationkey, ROUND(c_acctbal + 0.37, 2), c_mktsegment
        |  FROM customer),
        |p AS (
        |  SELECT a.id AS id1, b.id AS id2,
        |    CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS name_lev,
        |    a.seg = b.seg AS same_segment,
        |    ROUND(abs(a.bal - b.bal), 2) AS bal_diff,
        |    ROUND(CASE WHEN levenshtein(a.nm, b.nm) <= 1
        |               THEN 2.2 ELSE -1.5 END
        |        + CASE WHEN abs(a.bal - b.bal) <= 100.0
        |               THEN 1.1 ELSE -0.7 END
        |        + CASE WHEN a.seg = b.seg THEN 0.6 ELSE -0.4 END, 2) AS score
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id)
        |SELECT id1, id2, name_lev, same_segment, bal_diff, score
        |FROM p WHERE score >= 2.5 ORDER BY id1, id2""".stripMargin,
    // The linkage pair CTE verbatim + the dedup_cluster recursive
    // component tail: transitive closure over accepted matches, entity
    // id = min member.
    "dedup_linkage_entities" ->
      """WITH RECURSIVE c AS (
        |  SELECT c_custkey AS id, c_name AS nm, c_nationkey AS blk,
        |         c_acctbal AS bal, c_mktsegment AS seg FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000,
        |         substr(c_name, 1, length(c_name) - 1) || 'X',
        |         c_nationkey, ROUND(c_acctbal + 0.37, 2), c_mktsegment
        |  FROM customer),
        |p AS (
        |  SELECT a.id AS id1, b.id AS id2
        |  FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |  WHERE CASE WHEN levenshtein(a.nm, b.nm) <= 1
        |             THEN 2.2 ELSE -1.5 END
        |      + CASE WHEN abs(a.bal - b.bal) <= 100.0
        |             THEN 1.1 ELSE -0.7 END
        |      + CASE WHEN a.seg = b.seg THEN 0.6 ELSE -0.4 END >= 2.5),
        |edges AS (
        |  SELECT id1 AS src, id2 AS dst FROM p
        |  UNION SELECT id2, id1 FROM p),
        |reach(id, r) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
        |)
        |SELECT id AS c_custkey, MIN(r) AS entity_id
        |FROM reach GROUP BY id ORDER BY c_custkey""".stripMargin,
    // edit-distance pairs: same plant, but the oracle is UNBLOCKED —
    // all pairs under only the |Δlen| <= 3 NECESSARY condition, full
    // (unbanded) DP. The engine's PassJoin segment blocking must
    // reproduce this ground truth exactly: the oracle certifies recall
    // against truth, not the engine's own candidate generation.
    "dedup_edit" ->
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(text, 1, length(text) - 2) || 'xq'
        |  FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 18),
        |k AS (SELECT doc_id AS id, text AS t, length(text) AS ln FROM v)
        |SELECT a.id AS a, b.id AS b,
        |  CAST(levenshtein(a.t, b.t) AS INT) AS dist
        |FROM k a JOIN k b ON a.id < b.id AND abs(a.ln - b.ln) <= 3
        |WHERE levenshtein(a.t, b.t) <= 3
        |ORDER BY a, b""".stripMargin,
    // measured-recall leg: a 400-doc fixture planting EARLY-, MID- and
    // LATE-position distance-2 edits (the early plant is exactly the
    // blind spot a shared-prefix bucket would miss); the oracle is the
    // unblocked all-pairs DP, so row-for-row equality IS recall = 1.0
    // and precision = 1.0 against ground truth
    "dedup_edit_recall" ->
      """WITH base AS (
        |  SELECT doc_id, substr(text, 1, 200) AS text FROM documents
        |  WHERE doc_id < 400),
        |v AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substr(text, 1, 1) || 'zq' || substr(text, 4)
        |  FROM base WHERE doc_id % 3 = 0 AND length(text) >= 30
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    substr(text, 1, length(text) // 2) || 'zq'
        |      || substr(text, length(text) // 2 + 3)
        |  FROM base WHERE doc_id % 3 = 0 AND length(text) >= 30
        |  UNION ALL
        |  SELECT doc_id + 3000000, substr(text, 1, length(text) - 2) || 'zq'
        |  FROM base WHERE doc_id % 3 = 0 AND length(text) >= 30),
        |k AS (SELECT doc_id AS id, text AS t, length(text) AS ln FROM v)
        |SELECT a.id AS a, b.id AS b,
        |  CAST(levenshtein(a.t, b.t) AS INT) AS dist
        |FROM k a JOIN k b ON a.id < b.id AND abs(a.ln - b.ln) <= 3
        |WHERE levenshtein(a.t, b.t) <= 3
        |ORDER BY a, b""".stripMargin,
    // prefix-duplicate detection: the sorted-successor property (any
    // string between p and an extension of p also extends p) makes one
    // lead() window sufficient; same bucket key, same total order
    "dedup_prefix" ->
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, length(text) // 2)
        |  FROM documents WHERE doc_id % 4 = 0 AND length(text) >= 16),
        |l AS (SELECT doc_id, text,
        |    LEAD(text) OVER (PARTITION BY substr(text, 1, 8)
        |      ORDER BY text, doc_id) AS nt,
        |    LEAD(doc_id) OVER (PARTITION BY substr(text, 1, 8)
        |      ORDER BY text, doc_id) AS nid
        |  FROM v)
        |SELECT doc_id AS trunc_id, nid AS ext_id,
        |  CAST(length(text) AS BIGINT) AS prefix_chars,
        |  length(nt) = length(text) AS is_exact
        |FROM l
        |WHERE nt IS NOT NULL AND left(nt, length(text)) = text
        |ORDER BY trunc_id""".stripMargin,
    "dedup_normalized" ->
      """WITH v AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) || '  !!!' FROM documents),
        |n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM v)
        |SELECT min(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
        |  md5(norm_text) AS norm_md5
        |FROM n GROUP BY norm_text ORDER BY keep_id""".stripMargin,
    "text_pii" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN text || ' contact u'
        |      || CAST(doc_id AS VARCHAR) || '@ex.com or 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
        |    ELSE text END AS text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
        |FROM d ORDER BY doc_id""".stripMargin,
    // invisible-character scrub: three class counts + cleaned-text md5
    // (U+202C pops the planted U+202E override; both count as bidi)
    "text_invisible" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'he' || chr(8203) || 'llo'
        |      || chr(8205) || ' ' || text || ' ' || chr(8238)
        |      || 'reversed' || chr(8236) || ' x' || chr(173) || 'y'
        |    ELSE text END AS text FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}]')) AS BIGINT)
        |    AS n_zero_width,
        |  CAST(len(regexp_extract_all(text,
        |    '[\x{202A}-\x{202E}\x{2066}-\x{2069}]')) AS BIGINT) AS n_bidi,
        |  CAST(len(regexp_extract_all(text, '\x{00AD}')) AS BIGINT)
        |    AS n_soft_hyphen,
        |  md5(regexp_replace(text,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}]|[\x{202A}-\x{202E}\x{2066}-\x{2069}]|\x{00AD}',
        |    '', 'g')) AS clean_md5
        |FROM d ORDER BY doc_id""".stripMargin,
    // Luhn-validated card scan: candidates are maximal digit runs of
    // length 13-16; valid = mod-10 checksum holds (double every second
    // digit from the right, fold >9 by -9)
    // GPT-3-style decontamination: md5 split, distinct 8-grams, any
    // train doc sharing a gram with a test doc drops
    "prep_decontaminate" ->
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' qq0 qq1 qq2 qq3 qq4 qq5 qq6 qq7'
        |      ELSE text END AS text
        |  FROM documents),
        |a AS (SELECT doc_id, text,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        ::BIGINT % 10 = 0 THEN 'test' ELSE 'train' END AS split
        |  FROM base),
        |g AS (SELECT doc_id, split, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(text, ' ')) - 6),
        |    i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))))
        |    AS gram
        |  FROM a WHERE len(string_split(text, ' ')) >= 8),
        |tg AS (SELECT DISTINCT gram FROM g WHERE split = 'test'),
        |hits AS (SELECT g.doc_id, COUNT(*) AS h
        |  FROM g JOIN tg USING (gram) WHERE g.split = 'train'
        |  GROUP BY g.doc_id)
        |SELECT a.doc_id, a.split,
        |  CAST(COALESCE(hits.h, 0) AS BIGINT) AS n_contaminated_grams,
        |  CASE WHEN a.split = 'test' THEN 'test'
        |       WHEN hits.h IS NOT NULL THEN 'dropped'
        |       ELSE 'train' END AS disposition
        |FROM a LEFT JOIN hits ON a.doc_id = hits.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    // winsorized per-group price stats: interpolated P1/P99 over exact
    // cents, clip counts, and the exact-reassembly winsorized mean
    // quality-aware dedup keeper: argmax(score) with id tie-break over
    // the normalized-core groups; `rescued` marks groups whose keeper
    // is NOT the min id — exactly where keep-min picks the worse copy
    "dedup_keep_best" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |v AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'click here ads ads ' || text
        |  FROM base WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' appendix'
        |  FROM base WHERE doc_id % 9 = 0),
        |scored AS (SELECT doc_id,
        |    md5(regexp_replace(regexp_replace(text,
        |      '^click here ads ads ', ''), ' appendix$', '')) AS k,
        |    CAST(length(text) AS BIGINT)
        |      - CASE WHEN starts_with(text, 'click here ads ads ')
        |             THEN 1000 ELSE 0 END AS score
        |  FROM v),
        |ranked AS (SELECT k, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY k
        |      ORDER BY score DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY k) AS dup_count,
        |    MIN(doc_id) OVER (PARTITION BY k) AS min_id
        |  FROM scored)
        |SELECT doc_id AS keep_id, CAST(score AS BIGINT) AS keep_score,
        |  CAST(dup_count AS BIGINT) AS dup_count,
        |  doc_id != min_id AS rescued
        |FROM ranked WHERE rn = 1 ORDER BY keep_id""".stripMargin,
    "prep_winsorize" ->
      """WITH o AS (SELECT o_orderpriority AS g,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |q AS (SELECT g, quantile_cont(v, 0.01) AS p1,
        |    quantile_cont(v, 0.99) AS p99 FROM o GROUP BY g)
        |SELECT o.g AS priority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN o.v < q.p1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low,
        |  CAST(SUM(CASE WHEN o.v > q.p99 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high,
        |  CAST(FLOOR(MAX(q.p1) * 10000) AS BIGINT) AS p1_e4,
        |  CAST(FLOOR(MAX(q.p99) * 10000) AS BIGINT) AS p99_e4,
        |  CAST(FLOOR((CAST(SUM(CASE WHEN o.v >= q.p1 AND o.v <= q.p99
        |        THEN o.v ELSE 0 END) AS DOUBLE)
        |      + CAST(SUM(CASE WHEN o.v < q.p1 THEN 1 ELSE 0 END)
        |          AS DOUBLE) * MAX(q.p1)
        |      + CAST(SUM(CASE WHEN o.v > q.p99 THEN 1 ELSE 0 END)
        |          AS DOUBLE) * MAX(q.p99))
        |      / CAST(COUNT(*) AS DOUBLE) * 10000) AS BIGINT) AS wmean_e4
        |FROM o JOIN q USING (g) GROUP BY o.g ORDER BY priority""".stripMargin,
    "text_pii_luhn" ->
      """WITH d AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN text
        |      || ' card 4539578763621486 ref 1234567812345678'
        |      || ' amex 378282246310005'
        |    ELSE text END AS text FROM documents),
        |r AS (SELECT doc_id, regexp_extract_all(text, '[0-9]+') AS runs
        |  FROM d)
        |SELECT doc_id,
        |  CAST(len(runs) AS BIGINT) AS n_digit_runs,
        |  CAST(len(list_filter(runs,
        |    c -> length(c) BETWEEN 13 AND 16)) AS BIGINT) AS n_candidates,
        |  CAST(len(list_filter(runs, c -> length(c) BETWEEN 13 AND 16
        |    AND list_sum(list_transform(range(1, length(c) + 1), i ->
        |      CASE WHEN i % 2 = 0 THEN
        |        CASE WHEN 2 * (ascii(substring(reverse(c), i, 1)) - 48) > 9
        |          THEN 2 * (ascii(substring(reverse(c), i, 1)) - 48) - 9
        |          ELSE 2 * (ascii(substring(reverse(c), i, 1)) - 48) END
        |        ELSE ascii(substring(reverse(c), i, 1)) - 48 END))
        |      % 10 = 0)) AS BIGINT) AS n_valid
        |FROM r ORDER BY doc_id""".stripMargin,
    "sim_ivfpq_ann" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, label, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |cb AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |asg AS (
        |  SELECT vec_id, label, emb, cid AS cell, cemb FROM (
        |    SELECT c0.vec_id, c0.label, c0.emb, cb.cid, cb.cemb,
        |      ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> (c0.emb[i] - cb.cemb[i]) * (c0.emb[i] - cb.cemb[i]))),
        |        cb.cid) AS rn
        |    FROM c0, cb) WHERE rn = 1),
        |rs AS (SELECT vec_id, label, cell,
        |    list_transform(range(1, 65), i -> emb[i] - cemb[i]) AS res
        |  FROM asg),
        |cb1 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(res[g.i]) AS av
        |    FROM rs, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |cb2 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(res[g.i + 32]) AS av
        |    FROM rs, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |e1 AS (SELECT cand_id, cid AS c1 FROM (
        |    SELECT rs.vec_id AS cand_id, cb1.cid,
        |      ROW_NUMBER() OVER (PARTITION BY rs.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (rs.res[i] - cb1.cemb[i]) * (rs.res[i] - cb1.cemb[i]))),
        |        cb1.cid) AS rn
        |    FROM rs, cb1) WHERE rn = 1),
        |e2 AS (SELECT cand_id, cid AS c2 FROM (
        |    SELECT rs.vec_id AS cand_id, cb2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY rs.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (rs.res[i + 32] - cb2.cemb[i]) * (rs.res[i + 32] - cb2.cemb[i]))),
        |        cb2.cid) AS rn
        |    FROM rs, cb2) WHERE rn = 1),
        |enc AS (SELECT rs.vec_id AS cand_id, rs.cell, e1.c1, e2.c2
        |  FROM rs JOIN e1 ON rs.vec_id = e1.cand_id
        |          JOIN e2 ON rs.vec_id = e2.cand_id),
        |pc AS (
        |  SELECT probe_id, p_emb, cid AS cell, cemb FROM (
        |    SELECT p0.vec_id AS probe_id, p0.emb AS p_emb, cb.cid, cb.cemb,
        |      ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> (p0.emb[i] - cb.cemb[i]) * (p0.emb[i] - cb.cemb[i]))),
        |        cb.cid) AS rn
        |    FROM p0, cb) WHERE rn <= 2),
        |pres AS (SELECT probe_id, cell,
        |    list_transform(range(1, 65), i -> p_emb[i] - cemb[i]) AS pres
        |  FROM pc),
        |pd1 AS (SELECT pres.probe_id, pres.cell, cb1.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (pres.pres[i] - cb1.cemb[i]) * (pres.pres[i] - cb1.cemb[i]))) AS pd
        |  FROM pres, cb1),
        |pd2 AS (SELECT pres.probe_id, pres.cell, cb2.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (pres.pres[i + 32] - cb2.cemb[i]) * (pres.pres[i + 32] - cb2.cemb[i]))) AS pd
        |  FROM pres, cb2),
        |adc AS (
        |  SELECT pd1.probe_id, enc.cand_id, enc.cell, pd1.pd + pd2.pd AS adist
        |  FROM enc
        |  JOIN pd1 ON pd1.cell = enc.cell AND pd1.cid = enc.c1
        |  JOIN pd2 ON pd2.cell = enc.cell AND pd2.cid = enc.c2
        |          AND pd2.probe_id = pd1.probe_id
        |  WHERE pd1.probe_id <> enc.cand_id),
        |r AS (SELECT probe_id, cand_id, cell, adist,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rn
        |  FROM adc)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  CAST(cell AS BIGINT) AS cell, ROUND(adist, 4) AS approx_dist
        |FROM r WHERE rn <= 2 ORDER BY probe_id, rn""".stripMargin,
    "sim_ivfpq_recall" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, label, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |cb AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |asg AS (
        |  SELECT vec_id, label, emb, cid AS cell, cemb FROM (
        |    SELECT c0.vec_id, c0.label, c0.emb, cb.cid, cb.cemb,
        |      ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> (c0.emb[i] - cb.cemb[i]) * (c0.emb[i] - cb.cemb[i]))),
        |        cb.cid) AS rn
        |    FROM c0, cb) WHERE rn = 1),
        |rs AS (SELECT vec_id, label, cell,
        |    list_transform(range(1, 65), i -> emb[i] - cemb[i]) AS res
        |  FROM asg),
        |cb1 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(res[g.i]) AS av
        |    FROM rs, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |cb2 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(res[g.i + 32]) AS av
        |    FROM rs, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |e1 AS (SELECT cand_id, cid AS c1 FROM (
        |    SELECT rs.vec_id AS cand_id, cb1.cid,
        |      ROW_NUMBER() OVER (PARTITION BY rs.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (rs.res[i] - cb1.cemb[i]) * (rs.res[i] - cb1.cemb[i]))),
        |        cb1.cid) AS rn
        |    FROM rs, cb1) WHERE rn = 1),
        |e2 AS (SELECT cand_id, cid AS c2 FROM (
        |    SELECT rs.vec_id AS cand_id, cb2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY rs.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (rs.res[i + 32] - cb2.cemb[i]) * (rs.res[i + 32] - cb2.cemb[i]))),
        |        cb2.cid) AS rn
        |    FROM rs, cb2) WHERE rn = 1),
        |enc AS (SELECT rs.vec_id AS cand_id, rs.cell, e1.c1, e2.c2
        |  FROM rs JOIN e1 ON rs.vec_id = e1.cand_id
        |          JOIN e2 ON rs.vec_id = e2.cand_id),
        |pc AS (
        |  SELECT probe_id, p_emb, cid AS cell, cemb FROM (
        |    SELECT p0.vec_id AS probe_id, p0.emb AS p_emb, cb.cid, cb.cemb,
        |      ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 65),
        |          i -> (p0.emb[i] - cb.cemb[i]) * (p0.emb[i] - cb.cemb[i]))),
        |        cb.cid) AS rn
        |    FROM p0, cb) WHERE rn <= 2),
        |pres AS (SELECT probe_id, cell,
        |    list_transform(range(1, 65), i -> p_emb[i] - cemb[i]) AS pres
        |  FROM pc),
        |pd1 AS (SELECT pres.probe_id, pres.cell, cb1.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (pres.pres[i] - cb1.cemb[i]) * (pres.pres[i] - cb1.cemb[i]))) AS pd
        |  FROM pres, cb1),
        |pd2 AS (SELECT pres.probe_id, pres.cell, cb2.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (pres.pres[i + 32] - cb2.cemb[i]) * (pres.pres[i + 32] - cb2.cemb[i]))) AS pd
        |  FROM pres, cb2),
        |adc AS (
        |  SELECT pd1.probe_id, enc.cand_id, pd1.pd + pd2.pd AS adist
        |  FROM enc
        |  JOIN pd1 ON pd1.cell = enc.cell AND pd1.cid = enc.c1
        |  JOIN pd2 ON pd2.cell = enc.cell AND pd2.cid = enc.c2
        |          AND pd2.probe_id = pd1.probe_id
        |  WHERE pd1.probe_id <> enc.cand_id),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |  SELECT probe_id, cand_id,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, cand_id) AS rn
        |  FROM adc) WHERE rn = 1),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |  SELECT p0.vec_id AS probe_id, c0.vec_id AS cand_id,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        i -> (p0.emb[i] - c0.emb[i]) * (p0.emb[i] - c0.emb[i]))),
        |      c0.vec_id) AS rn
        |  FROM p0, c0 WHERE c0.vec_id <> p0.vec_id) WHERE rn = 1)
        |SELECT 'ivfpq_m2_nprobe2' AS method, CAST(COUNT(*) AS BIGINT) AS n_probes,
        |  CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  ROUND(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS recall_at_1
        |FROM tr LEFT JOIN ann ON tr.probe_id = ann.probe_id""".stripMargin,
    "sim_pq_recall" ->
      """WITH e AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, label, emb, emb[1:32] AS s1, emb[33:64] AS s2
        |       FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb, emb[1:32] AS s1, emb[33:64] AS s2
        |       FROM e WHERE vec_id < 10),
        |cb1 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(s1[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |cb2 AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i, AVG(s2[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 33)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |e1 AS (SELECT cand_id, cid AS c1 FROM (
        |    SELECT c0.vec_id AS cand_id, cb1.cid,
        |      ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (c0.s1[i] - cb1.cemb[i]) * (c0.s1[i] - cb1.cemb[i]))),
        |        cb1.cid) AS rn
        |    FROM c0, cb1) WHERE rn = 1),
        |e2 AS (SELECT cand_id, cid AS c2 FROM (
        |    SELECT c0.vec_id AS cand_id, cb2.cid,
        |      ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |        list_sum(list_transform(range(1, 33),
        |          i -> (c0.s2[i] - cb2.cemb[i]) * (c0.s2[i] - cb2.cemb[i]))),
        |        cb2.cid) AS rn
        |    FROM c0, cb2) WHERE rn = 1),
        |pd1 AS (SELECT p0.vec_id AS probe_id, cb1.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (p0.s1[i] - cb1.cemb[i]) * (p0.s1[i] - cb1.cemb[i]))) AS pd
        |  FROM p0, cb1),
        |pd2 AS (SELECT p0.vec_id AS probe_id, cb2.cid,
        |    list_sum(list_transform(range(1, 33),
        |      i -> (p0.s2[i] - cb2.cemb[i]) * (p0.s2[i] - cb2.cemb[i]))) AS pd
        |  FROM p0, cb2),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |  SELECT pd1.probe_id, e1.cand_id,
        |    ROW_NUMBER() OVER (PARTITION BY pd1.probe_id
        |      ORDER BY pd1.pd + pd2.pd, e1.cand_id) AS rn
        |  FROM e1 JOIN e2 USING (cand_id), pd1, pd2
        |  WHERE pd1.cid = e1.c1 AND pd2.cid = e2.c2
        |    AND pd2.probe_id = pd1.probe_id AND pd1.probe_id <> e1.cand_id)
        |  WHERE rn = 1),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |  SELECT p0.vec_id AS probe_id, c0.vec_id AS cand_id,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_sum(list_transform(range(1, 65),
        |        i -> (p0.emb[i] - c0.emb[i]) * (p0.emb[i] - c0.emb[i]))),
        |      c0.vec_id) AS rn
        |  FROM p0, c0 WHERE c0.vec_id <> p0.vec_id) WHERE rn = 1)
        |SELECT 'pq_m2' AS method, CAST(COUNT(*) AS BIGINT) AS n_probes,
        |  CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  ROUND(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS recall_at_1
        |FROM tr LEFT JOIN ann ON tr.probe_id = ann.probe_id""".stripMargin,
    "sim_twostage" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |s1 AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    c.emb AS c_emb, p.emb AS p_emb,
        |    list_dot_product(c.emb[1:32], p.emb[1:32])
        |      / (sqrt(list_dot_product(c.emb[1:32], c.emb[1:32]))
        |         * sqrt(list_dot_product(p.emb[1:32], p.emb[1:32]))) AS pcos
        |  FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id),
        |cand AS (SELECT probe_id, cand_id, c_emb, p_emb FROM (
        |  SELECT s1.*, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY pcos DESC, cand_id) AS crn FROM s1) WHERE crn <= 100),
        |r0 AS (SELECT probe_id, cand_id,
        |    list_dot_product(c_emb, p_emb)
        |      / (sqrt(list_dot_product(c_emb, c_emb))
        |         * sqrt(list_dot_product(p_emb, p_emb))) AS cos
        |  FROM cand),
        |r AS (SELECT probe_id, cand_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY cos DESC, cand_id) AS rn FROM r0)
        |SELECT probe_id, cand_id AS neighbor_id, CAST(rn AS BIGINT) AS rn,
        |  ROUND(cos, 4) AS cos
        |FROM r WHERE rn <= 2 ORDER BY probe_id, rn""".stripMargin,
    "sim_twostage_recall" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        |c0 AS (SELECT vec_id, emb FROM e WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, emb FROM e WHERE vec_id < 10),
        |s1 AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    c.emb AS c_emb, p.emb AS p_emb,
        |    list_dot_product(c.emb[1:32], p.emb[1:32])
        |      / (sqrt(list_dot_product(c.emb[1:32], c.emb[1:32]))
        |         * sqrt(list_dot_product(p.emb[1:32], p.emb[1:32]))) AS pcos,
        |    list_dot_product(c.emb, p.emb)
        |      / (sqrt(list_dot_product(c.emb, c.emb))
        |         * sqrt(list_dot_product(p.emb, p.emb))) AS fcos
        |  FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id),
        |cand AS (SELECT probe_id, cand_id, fcos FROM (
        |  SELECT s1.*, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY pcos DESC, cand_id) AS crn FROM s1) WHERE crn <= 100),
        |ann AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |  SELECT probe_id, cand_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY fcos DESC, cand_id) AS rn FROM cand) WHERE rn = 1),
        |tr AS (SELECT probe_id, cand_id AS true_nn FROM (
        |  SELECT probe_id, cand_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY fcos DESC, cand_id) AS rn FROM s1) WHERE rn = 1)
        |SELECT 'twostage_p32_c100' AS method,
        |  CAST(COUNT(*) AS BIGINT) AS n_probes,
        |  CAST(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hits,
        |  ROUND(SUM(CASE WHEN ann.ann_nn = tr.true_nn THEN 1 ELSE 0 END)
        |    / CAST(COUNT(*) AS DOUBLE), 4) AS recall_at_1
        |FROM tr LEFT JOIN ann ON tr.probe_id = ann.probe_id""".stripMargin,
    // HNSW-lite: the oracle replays levels, bucketed adjacencies, and
    // all seven search rounds as generated CTEs (Similarity object).
    "sim_hnsw_ann" -> graft.operators.Similarity.hnswAnnOracle,
    "sim_hnsw_recall" -> graft.operators.Similarity.hnswRecallOracle,
    "sim_recall" ->
      """WITH c0 AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |            FROM embeddings WHERE vec_id >= 10),
        |p0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |       FROM embeddings WHERE vec_id < 10),
        |cosj AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    list_dot_product(p.emb, c.emb)
        |      / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(c.emb, c.emb))) AS cos
        |  FROM p0 p, c0 c WHERE c.vec_id <> p.vec_id),
        |troot AS (SELECT probe_id, cand_id AS true_nn FROM (
        |    SELECT probe_id, cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn
        |    FROM cosj) WHERE rn = 1),
        |cb AS (SELECT vec_id, emb,
        |    (CASE WHEN emb[1] >= 0 THEN 1 ELSE 0 END
        |     + CASE WHEN emb[2] >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN emb[3] >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN emb[4] >= 0 THEN 8 ELSE 0 END) AS bkt FROM c0),
        |pb AS (SELECT vec_id, emb,
        |    (CASE WHEN emb[1] >= 0 THEN 1 ELSE 0 END
        |     + CASE WHEN emb[2] >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN emb[3] >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN emb[4] >= 0 THEN 8 ELSE 0 END) AS bkt FROM p0),
        |lshnn AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
        |        list_dot_product(p.emb, c.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(c.emb, c.emb))) DESC,
        |        c.vec_id) AS rn
        |    FROM pb p JOIN cb c USING (bkt) WHERE c.vec_id <> p.vec_id) WHERE rn = 1),
        |cent AS (
        |  SELECT label AS cid, list(av ORDER BY i) AS cemb FROM (
        |    SELECT label, g.i AS i, AVG(emb[g.i]) AS av
        |    FROM c0, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY label, g.i) GROUP BY label),
        |casg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT c0.vec_id, c0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c0.vec_id ORDER BY
        |      list_dot_product(c0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(c0.emb, c0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM c0, cent) WHERE rn = 1),
        |pasg AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn = 1),
        |ivfnn AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT p.vec_id AS probe_id, a.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) DESC,
        |        a.vec_id) AS rn
        |    FROM pasg p JOIN casg a USING (cid)) WHERE rn = 1),
        |pasg2 AS (SELECT vec_id, emb, cid FROM (
        |  SELECT p0.vec_id, p0.emb, cent.cid,
        |    ROW_NUMBER() OVER (PARTITION BY p0.vec_id ORDER BY
        |      list_dot_product(p0.emb, cent.cemb)
        |        / (sqrt(list_dot_product(p0.emb, p0.emb)) * sqrt(list_dot_product(cent.cemb, cent.cemb))) DESC,
        |      cent.cid) AS rn
        |  FROM p0, cent) WHERE rn <= 2),
        |ivf2nn AS (SELECT probe_id, cand_id AS ann_nn FROM (
        |    SELECT p.vec_id AS probe_id, a.vec_id AS cand_id,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
        |        list_dot_product(p.emb, a.emb)
        |          / (sqrt(list_dot_product(p.emb, p.emb)) * sqrt(list_dot_product(a.emb, a.emb))) DESC,
        |        a.vec_id) AS rn
        |    FROM pasg2 p JOIN casg a USING (cid)) WHERE rn = 1),
        |m AS (
        |  SELECT 'ivf_nprobe1' AS method, COUNT(*) AS n_probes,
        |    CAST(SUM(CASE WHEN ann_nn = true_nn THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM troot LEFT JOIN ivfnn USING (probe_id)
        |  UNION ALL
        |  SELECT 'ivf_nprobe2' AS method, COUNT(*) AS n_probes,
        |    CAST(SUM(CASE WHEN ann_nn = true_nn THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM troot LEFT JOIN ivf2nn USING (probe_id)
        |  UNION ALL
        |  SELECT 'lsh_bits4' AS method, COUNT(*) AS n_probes,
        |    CAST(SUM(CASE WHEN ann_nn = true_nn THEN 1 ELSE 0 END) AS BIGINT) AS hits
        |  FROM troot LEFT JOIN lshnn USING (probe_id))
        |SELECT method, n_probes, hits, ROUND(hits / n_probes, 4) AS recall_at_1
        |FROM m ORDER BY method""".stripMargin,
    "prep_balance" ->
      """WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |mn AS (SELECT MIN(n) AS min_n FROM n),
        |r AS (SELECT doc_id, lang,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |                   doc_id) AS rk
        |      FROM documents)
        |SELECT doc_id, lang FROM r, mn WHERE rk <= mn.min_n
        |ORDER BY doc_id""".stripMargin,
    "prep_mix" ->
      """WITH wt(stratum, wt) AS (VALUES
        |  ('de', 0.2), ('en', 0.4), ('es', 0.2), ('fr', 0.1), ('zh', 0.1)),
        |n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |j AS (SELECT n.lang, n.n, wt.wt FROM n JOIN wt ON n.lang = wt.stratum),
        |t AS (SELECT MIN(FLOOR(n / wt)) AS total FROM j),
        |q AS (SELECT lang, FLOOR(wt * total) AS quota FROM j, t),
        |r AS (SELECT doc_id, lang,
        |        ROW_NUMBER() OVER (PARTITION BY lang
        |          ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
        |                   doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN q ON r.lang = q.lang
        |WHERE r.rk <= q.quota ORDER BY doc_id""".stripMargin,
    "text_bm25" ->
      """WITH q AS (SELECT unnest(['spark', 'join', 'window', 'vector']) AS term),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tk),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |t AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tf AS (SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
        |       FROM t JOIN q USING (term) GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |         ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25,
        |         COUNT(*) AS n_hit
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        |       GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank,
        |  n_hit, bm25
        |FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,
    // Both ranker legs rebuilt verbatim (BM25 as in text_bm25 but top-20;
    // Jaccard as row-local intersect/union over distinct tokens), fused
    // with the same coalesce-sum in the same order.
    "sim_hybrid_rrf" ->
      """WITH q AS (SELECT unnest(['spark', 'join', 'window', 'vector']) AS term),
        |tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM tk),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |t AS (SELECT doc_id, unnest(tk) AS term FROM tk),
        |tf AS (SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
        |       FROM t JOIN q USING (term) GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |         ROUND(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |           * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS bm25
        |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        |       GROUP BY doc_id),
        |bmr AS (SELECT doc_id,
        |          CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
        |            AS bm25_rank
        |        FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20),
        |jd AS (SELECT doc_id, list_distinct(tk) AS dtk FROM tk),
        |js AS (SELECT doc_id,
        |         len(list_filter(dtk, x ->
        |           list_contains(['spark', 'join', 'window', 'vector'], x))) AS inter,
        |         len(list_distinct(list_concat(dtk,
        |           ['spark', 'join', 'window', 'vector']))) AS uni
        |       FROM jd),
        |jr AS (SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (
        |           ORDER BY inter / CAST(uni AS DOUBLE) DESC, doc_id) AS BIGINT)
        |           AS jac_rank
        |       FROM js WHERE inter >= 1
        |       ORDER BY inter / CAST(uni AS DOUBLE) DESC, doc_id LIMIT 20),
        |fused AS (SELECT COALESCE(bmr.doc_id, jr.doc_id) AS doc_id,
        |            bm25_rank, jac_rank,
        |            ROUND(COALESCE(1.0 / (60.0 + bm25_rank), 0.0)
        |              + COALESCE(1.0 / (60.0 + jac_rank), 0.0), 6) AS rrf
        |          FROM bmr FULL OUTER JOIN jr ON bmr.doc_id = jr.doc_id)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank,
        |  rrf, bm25_rank, jac_rank
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, term, tf, df,
        |         ROUND(tf * ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)), 4) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, term) AS rank FROM sc)
        |SELECT doc_id, rank, term, tf, df, tfidf FROM r
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // Tolerance oracle (the dedup_approx_hll pattern): DuckDB recomputes
    // the EXACT 5-gram-domain overlap (on the same 60-bit hash domain the
    // engine dedups on) and pins both KMV-tolerance flags TRUE — a
    // drifting estimator flips a flag and fails the hash compare, so the
    // ±O(1/√k) bound is oracle-verified, not self-certified.
    "text_overlap_kmv" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS tk FROM documents),
        |g AS (
        |  SELECT source,
        |    unnest(list_distinct(list_transform(range(1, len(tk) - 3),
        |      i -> array_to_string(list_slice(tk, i, i + 4), ' ')))) AS gram
        |  FROM t WHERE len(tk) >= 5),
        |a AS (SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        |      FROM g WHERE source != 'src0'),
        |b AS (SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        |      FROM g WHERE source = 'src0'),
        |i AS (SELECT COUNT(*) AS c FROM a JOIN b USING (h)),
        |u AS (SELECT COUNT(*) AS c FROM (SELECT h FROM a UNION SELECT h FROM b) x)
        |SELECT (SELECT COUNT(*) FROM a) AS n_a,
        |  (SELECT COUNT(*) FROM b) AS n_b,
        |  (SELECT c FROM u) AS n_union,
        |  (SELECT c FROM i) AS n_inter,
        |  ROUND((SELECT c FROM i) / CAST((SELECT c FROM u) AS DOUBLE), 6) AS jaccard,
        |  TRUE AS kmv_union_ok, TRUE AS kmv_jaccard_ok""".stripMargin,
    // Exact counts of the bottom-k probe grams (deterministic cap: the
    // 1000 smallest distinct grams under the portable 60-bit hash) —
    // valid oracle because at the registered width (2/eps = 20k counters
    // × 10 rows vs the test corpora's distinct-gram domain) the
    // all-rows-collide probability is ~1e-13 per item and the seed is
    // fixed, so the CMS estimate IS the exact count on these corpora;
    // the lossy overcount bound is spec-tested.
    "text_cms_probe" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, t[gi.i] || ' ' || t[gi.i + 1] AS gram
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2),
        |probes AS (SELECT gram FROM (SELECT DISTINCT gram FROM bi)
        |           ORDER BY ('0x' || substr(md5(gram), 1, 15))::BIGINT, gram
        |           LIMIT 1000),
        |cnt AS (SELECT gram, COUNT(*) AS c FROM bi GROUP BY gram)
        |SELECT p.gram, CAST(c.c AS BIGINT) AS est
        |FROM probes p JOIN cnt c USING (gram)
        |ORDER BY p.gram""".stripMargin,
    // Exact bigram counts — valid oracle because the registered capacity
    // (4096) exceeds the corpus's distinct-bigram count, where Misra–Gries
    // degenerates to exact counting; the lossy regime is spec-bounded.
    "text_heavy_hitters" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bi AS (
        |  SELECT t[gi.i] || ' ' || t[gi.i + 1] AS gram
        |  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) gi
        |  WHERE len(t) >= 2)
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS est
        |FROM bi GROUP BY gram HAVING COUNT(*) >= 3
        |ORDER BY gram""".stripMargin,
    // DuckDB's built-in nfc_normalize against the engine's codegen'd JDK
    // normalizer; decomposed fixture runs built identically on both sides
    // (chr(769) = U+0301 combining acute)
    "text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    substring(text, 1, 40) || ' cafe' || chr(769) || ' ' ||
        |      repeat('e' || chr(769), CAST(doc_id % 3 AS INT) + 1) AS raw
        |  FROM documents)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS raw_chars,
        |  nfc_normalize(raw) AS nfc,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS nfc_chars,
        |  CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT)
        |    AS composed
        |FROM raw ORDER BY doc_id""".stripMargin,
    // Same three exact-integer counts; each score is ONE floor of a
    // single double division of integer polynomials (common denominator
    // S*W) — both engines see the same two doubles.
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
        |    AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
        |    AS n_syllables
        |FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CAST(FLOOR((390.0 * n_words * n_words
        |      + 11800.0 * n_syllables * n_sentences
        |      - 15590.0 * n_sentences * n_words)
        |    / (n_sentences * n_words)) AS BIGINT) AS fk_grade_milli,
        |  CAST(FLOOR((206835.0 * n_sentences * n_words
        |      - 1015.0 * n_words * n_words
        |      - 84600.0 * n_syllables * n_sentences)
        |    / (n_sentences * n_words)) AS BIGINT) AS flesch_milli
        |FROM c ORDER BY doc_id""".stripMargin,
    // Position-indexed tokens via the text_repetition LATERAL-range
    // idiom; the one-token negation LAG becomes the prev subscript.
    "text_sentiment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
        |           FROM documents),
        |x AS (SELECT doc_id, tk[gi.i] AS tok,
        |        CASE WHEN gi.i > 1 THEN tk[gi.i - 1] ELSE '' END AS prev
        |      FROM t, LATERAL (SELECT unnest(range(1, len(tk) + 1)) AS i) gi),
        |s AS (SELECT doc_id,
        |        CASE WHEN prev IN ('a', 'the') THEN -raw ELSE raw END AS sc
        |      FROM (SELECT doc_id, prev,
        |              CASE WHEN tok IN ('fast', 'big') THEN 1
        |                   WHEN tok IN ('slow', 'small') THEN -1
        |                   ELSE 0 END AS raw
        |            FROM x))
        |SELECT doc_id,
        |  CAST(SUM(CAST(sc = 1 AS INT)) AS BIGINT) AS n_pos,
        |  CAST(SUM(CAST(sc = -1 AS INT)) AS BIGINT) AS n_neg,
        |  CAST(SUM(sc) AS BIGINT) AS score,
        |  CASE WHEN SUM(sc) > 0 THEN 'pos' WHEN SUM(sc) < 0 THEN 'neg'
        |       ELSE 'neu' END AS label
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
