package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Graph, LlmQueries, LogReg, Metrics, NaiveBayes, Pca, PipelineQueries, Queries, Regression}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an implemented operator from SURVEY.md §2;
  * every key present in [[oracleSql]] carries DuckDB-runnable ANSI SQL with
  * IDENTICAL output column names (the driver's compare sorts columns by name
  * before hashing). Keys absent from [[oracleSql]] are non-SQL-expressible
  * ops the driver checks rows-only.
  */
object SparkEntry {

  /** Flagship query (Q04, the reference's star dim/fact model) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_projection"   -> (Queries.q01 _),
    "q02_filter_predicates" -> (Queries.q02 _),
    "q02b_like_null_regex"  -> (Queries.q02b _),
    "q03_hash_aggregate"    -> (Queries.q03 _),
    "q04_star_join"         -> (Queries.q04 _),
    "q05_semi_join"         -> (Queries.q05 _),
    "q06_anti_join"         -> (Queries.q06 _),
    "q07_outer_join"        -> (Queries.q07 _),
    "q08_merge_upsert"      -> (Queries.q08 _),
    "q09_theta_join"        -> (Queries.q09 _),
    "q10_window_topk"       -> (Queries.q10 _),
    "q11_window_running"    -> (Queries.q11 _),
    "q12_count_distinct"    -> (Queries.q12 _),
    "q13_rollup_grouping"   -> (Queries.q13 _),
    "q13b_cube_grouping"    -> (Queries.q13b _),
    "q14_string_functions"  -> (Queries.q14 _),
    "q15_datetime"          -> (Queries.q15 _),
    "q16_global_topk"       -> (Queries.q16 _),
    "q17_intersect"         -> (Queries.q17 _),
    "q17b_except"           -> (Queries.q17b _),
    "q17c_union_all"        -> (Queries.q17c _),
    "q18_json_extract"      -> (Queries.q18 _),
    "q19_cosine_topk"       -> (Queries.q19 _),
    "q20_time_bucket_agg"   -> (Queries.q20 _),
    "q21_window_analytics"  -> (Queries.q21 _),
    "q22_percentiles"       -> (Queries.q22 _),
    "q22b_approx_percentiles" -> (Queries.q22b _),
    "q23_correlated_scalar" -> (Queries.q23 _),
    "q24_math_functions"    -> (Queries.q24 _),
    "q25_pivot"             -> (Analytics.pivotOrders _),
    "q34_salted_join"       -> (Analytics.saltedJoinAgg _),
    "q35_array_functions"   -> (Analytics.arrayFunctions _),
    "q36_string_agg"        -> (Analytics.stringAgg _),
    "dq_checks"             -> (Analytics.dqChecks _),
    "dq_outliers"           -> ((s, d) => Analytics.dqOutliers(s, d)),
    "dq_embeddings"         -> ((s, d) => Analytics.dqEmbeddings(s, d)),
    "q26_unpivot"           -> (Analytics.unpivotCustomer _),
    "q27_sessionize"        -> (Analytics.sessionize _),
    "q29_profile"           -> ((s, d) => Analytics.profile(s, d)),
    "q30_hash_sample"       -> (Analytics.hashSample _),
    "q31_bloom_semi_join"   -> (Analytics.bloomSemiJoin _),
    "q32_range_bucket_join" -> (Analytics.rangeBucketJoin _),
    "q41_interval_overlap"  -> (Analytics.intervalOverlapJoin _),
    "q42_zorder"            -> (Analytics.zorderLayout _),
    "q43_funnel"            -> (Analytics.funnel _),
    "q44_retention"         -> (Analytics.retention _),
    "q45_histogram"         -> (Analytics.histogram _),
    "q46_rolling_distinct"  -> (Analytics.rollingDistinct _),
    "q47_map_functions"     -> (Queries.q47MapFunctions _),
    "q48_ntile_buckets"     -> (Queries.q48NtileBuckets _),
    "q49_lateral_topn"      -> (Queries.q49LateralTopN _),
    "q50_recursive_cte"     -> (Queries.q50RecursiveCte _),
    "dq_freshness"          -> (Analytics.dqFreshness _),
    "dq_mad"                -> (Analytics.dqMad _),
    "dq_ewma"               -> ((s: SparkSession, d: String) => Analytics.dqEwma(s, d)),
    "q32b_range_multibucket"-> (Analytics.rangeBucketJoinMulti _),
    "q33_gap_fill"          -> (Analytics.gapFill _),
    "q37_range_frame"       -> (Analytics.rangeFrameWindow _),
    "q38_frame_stats"       -> (Analytics.windowFrameStats _),
    "q39_exists_subquery"   -> (Queries.q39 _),
    "q13c_grouping_sets"    -> (Queries.q13c _),
    "q40_stats_agg"         -> (Analytics.statsSummary _),
    // pipeline operators (SURVEY §2.A), driven end-to-end
    "a01_jdbc_pushdown"     -> (PipelineQueries.a01JdbcPushdown _),
    "a02_jdbc_partitioned"  -> (PipelineQueries.a02JdbcPartitioned _),
    "a03_default_projection"-> (PipelineQueries.a03DefaultProjection _),
    "a04_catalog_scan"      -> (PipelineQueries.a04CatalogScan _),
    "a04b_mysql_catalog"    -> (PipelineQueries.a04bMysqlCatalog _),
    "a04c_mysql_quirks"     -> (PipelineQueries.a04cMysqlQuirks _),
    "a04d_pg_quirks"        -> (PipelineQueries.a04dPgQuirks _),
    "a04e_mssql_quirks"     -> (PipelineQueries.a04eMssqlQuirks _),
    "a05_type_mapping"      -> (PipelineQueries.a05TypeMapping _),
    "a06_schema_json"       -> (PipelineQueries.a06SchemaJson _),
    "a07_csv_roundtrip"     -> (PipelineQueries.a07CsvRoundtrip _),
    "a08_chunk_roundtrip"   -> (PipelineQueries.a08ChunkRoundtrip _),
    "a09_overwrite_snapshot"-> (PipelineQueries.a09OverwriteSnapshot _),
    "a10_merge_helper"      -> (PipelineQueries.a10MergeHelper _),
    "a11_sync_pipeline"     -> (PipelineQueries.a11SyncPipeline _),
    "a12_throttled_sync"    -> (PipelineQueries.a12ThrottledSync _),
    "a13_retry_sync"        -> (PipelineQueries.a13RetrySync _),
    "a14_schedule"          -> (PipelineQueries.a14Schedule _),
    "a15_run_date"          -> (PipelineQueries.a15RunDate _),
    "a16_scd2_merge"        -> (PipelineQueries.a16Scd2Merge _),
    "a17_incremental_sync"  -> (PipelineQueries.a17IncrementalSync _),
    "a18_bucketed_merge"    -> (PipelineQueries.a18BucketedMerge _),
    "a19_schema_evolution"  -> (PipelineQueries.a19SchemaEvolution _),
    "a20_partition_pruning" -> (PipelineQueries.a20PartitionPruning _),
    "a21_jdbc_publish"      -> (PipelineQueries.a21JdbcPublish _),
    "a22_cdc_merge"         -> (PipelineQueries.a22CdcMerge _),
    "a23_backfill"          -> (PipelineQueries.a23PartitionBackfill _),
    "a26_export_timeout"    -> (PipelineQueries.a26ExportTimeout _),
    "a30_incremental_dedup_sync" -> (PipelineQueries.a30IncrementalDedupSync _),
    "a31_scd2_lookup"       -> (PipelineQueries.a31Scd2Lookup _),
    "a32_schema_evolution"  -> (PipelineQueries.a32SchemaEvolution _),
    "a33_schema_conflict"   -> (PipelineQueries.a33SchemaConflict _),
    "a34_pgwire_pushdown"   -> (PipelineQueries.a34PgwirePushdown _),
    "a35_pgwire_partitioned" -> (PipelineQueries.a35PgwirePartitioned _),
    "a36_pgwire_catalog"    -> (PipelineQueries.a36PgwireCatalog _),
    "a45_mysqlwire_pushdown" -> (PipelineQueries.a45MysqlwirePushdown _),
    "a46_mysqlwire_partitioned" -> (PipelineQueries.a46MysqlwirePartitioned _),
    "a47_mysqlwire_quirks"  -> (PipelineQueries.a47MysqlwireQuirks _),
    "a48_kafka_roundtrip"   -> (PipelineQueries.a48KafkaRoundtrip _),
    "a49_gzip_jsonl"        -> (PipelineQueries.a49GzipJsonl _),
    "a50_pgwire_tls"        -> (PipelineQueries.a50PgwireTls _),
    "a51_mssqlwire_pushdown" -> (PipelineQueries.a51MssqlwirePushdown _),
    "a51b_mssqlwire_quirks" -> (PipelineQueries.a51bMssqlwireQuirks _),
    "a52_mysqlwire_tls"     -> (PipelineQueries.a52MysqlwireTls _),
    "a37_bus_roundtrip"     -> (PipelineQueries.a37BusRoundtrip _),
    "a38_bus_sync"          -> (PipelineQueries.a38BusSync _),
    "a39_snapshot_diff"     -> (PipelineQueries.a39SnapshotDiff _),
    "a40_gdpr_delete"       -> (PipelineQueries.a40GdprDelete _),
    "a41_atomic_publish"    -> (PipelineQueries.a41AtomicMultiPublish _),
    "a42_retention_vacuum"  -> (PipelineQueries.a42RetentionVacuum _),
    "a43_late_arriving"     -> (PipelineQueries.a43LateArriving _),
    "a44_write_audit_publish" -> (PipelineQueries.a44WriteAuditPublish _),
    // LLM-data-pipeline operators (north-star extensions)
    "asof_join"             -> (LlmQueries.asofJoin _),
    "asof_nearest"          -> (LlmQueries.asofNearest _),
    "asof_tolerance"        -> (LlmQueries.asofTolerance _),
    "asof_join_native"      -> (LlmQueries.asofJoinNative _),
    "dedup_approx_hll"      -> (LlmQueries.dedupApproxHll _),
    "dedup_exact"           -> (LlmQueries.dedupExact _),
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
    "sim_mmr"               -> (LlmQueries.simMmr _),
    "sim_lsh_ann"           -> (LlmQueries.simLshAnn _),
    "text_tokens"           -> (LlmQueries.textTokens _),
    "text_zipf"             -> (LlmQueries.textZipf _),
    "text_normalize"        -> (LlmQueries.textNormalize _),
    "text_chi2"             -> (LlmQueries.textChi2 _),
    "text_url_canon"        -> (LlmQueries.textUrlCanon _),
    "text_rake"             -> (LlmQueries.textRake _),
    "graph_kcore"           -> (Graph.graphKCore _),
    "text_langid"           -> (LlmQueries.textLangId _),
    "text_quality"          -> (LlmQueries.textQuality _),
    "text_fingerprint"      -> (LlmQueries.textFingerprint _),
    "text_segments"         -> (LlmQueries.textSegments _),
    "text_repetition"       -> (LlmQueries.textRepetition _),
    "text_pmi"              -> (LlmQueries.textPmi _),
    "text_hashtf"           -> (LlmQueries.textHashTf _),
    "text_bigram_lm"        -> (LlmQueries.textBigramLm _),
    "text_kneser_ney"       -> (LlmQueries.textKneserNey _),
    "text_kneser_ney3"      -> (LlmQueries.textKneserNey3 _),
    "text_ngrams_native"    -> (LlmQueries.textNgramsNative _),
    "dedup_linkage_entities" -> (LlmQueries.dedupLinkageEntities _),
    "text_bpe_pairs"        -> (LlmQueries.textBpePairs _),
    "text_bpe_train"        -> (LlmQueries.textBpeTrain _),
    "text_unigram_lm"       -> (LlmQueries.textUnigramLm _),
    "text_unigram_encode"   -> (LlmQueries.textUnigramEncode _),
    "text_bpe_encode"       -> (LlmQueries.textBpeEncode _),
    "text_contamination"    -> (LlmQueries.textContamination _),
    "text_lm_score"         -> (LlmQueries.textLmScore _),
    "mm_binary_meta"        -> (LlmQueries.mmBinaryMeta _),
    "mm_decode"             -> (LlmQueries.mmDecode _),
    "mm_frame_sample"       -> (LlmQueries.mmFrameSample _),
    "mm_audio_frames"       -> (LlmQueries.mmAudioFrames _),
    "mm_scene_detect"       -> (LlmQueries.mmSceneDetect _),
    "prep_balance"          -> (LlmQueries.prepBalance _),
    "mm_resize"             -> (LlmQueries.mmResize _),
    "sim_ivf_ann"           -> (LlmQueries.simIvfAnn _),
    "sim_ivf_nprobe"        -> (LlmQueries.simIvfNprobe _),
    "sim_recall"            -> (LlmQueries.simRecall _),
    "sim_hnsw_recall"       -> (LlmQueries.simHnswRecall _),
    "sim_pq_ann"            -> (LlmQueries.simPqAnn _),
    "sim_pq_recall"         -> (LlmQueries.simPqRecall _),
    "sim_ivfpq_ann"         -> (LlmQueries.simIvfPqAnn _),
    "sim_ivfpq_recall"      -> (LlmQueries.simIvfPqRecall _),
    "dedup_normalized"      -> (LlmQueries.dedupNormalized _),
    "dedup_containment"     -> (LlmQueries.dedupContainment _),
    "dedup_span"            -> (LlmQueries.dedupSpan _),
    "dedup_linkage"         -> (LlmQueries.dedupLinkage _),
    "dedup_soft"            -> (LlmQueries.dedupSoft _),
    "prep_interleave"       -> (LlmQueries.prepInterleave _),
    "prep_curriculum"       -> (LlmQueries.prepCurriculum _),
    "prep_token_budget"     -> (LlmQueries.prepTokenBudget _),
    "mm_binary_dedup"       -> (LlmQueries.mmBinaryDedup _),
    "mm_phash_neardup"      -> (LlmQueries.mmPhashNearDup _),
    "mm_phash_recall"       -> (LlmQueries.mmPhashRecall _),
    "mm_png_decode"         -> (LlmQueries.mmPngDecode _),
    "mm_jpeg_decode"        -> (LlmQueries.mmJpegDecode _),
    "mm_jpeg_color"         -> (LlmQueries.mmJpegColor _),
    "mm_jpeg_progressive"   -> (LlmQueries.mmJpegProgressive _),
    "mm_gif_frames"         -> (LlmQueries.mmGifFrames _),
    "mm_video_frames"       -> (LlmQueries.mmVideoFrames _),
    "mm_gif_scene"          -> (LlmQueries.mmGifScene _),
    "mm_wav_decode"         -> (LlmQueries.mmWavDecode _),
    "mm_flac_decode"        -> (LlmQueries.mmFlacDecode _),
    "mm_wav_frames"         -> (LlmQueries.mmWavFrames _),
    "mm_stft_power"         -> (LlmQueries.mmStftPower _),
    "mm_rotate90"           -> (LlmQueries.mmRotate90 _),
    "mm_frame_dct"          -> (LlmQueries.mmFrameDct _),
    "mm_bmp_decode"         -> (LlmQueries.mmBmpDecode _),
    "mm_gif_decode"         -> (LlmQueries.mmGifDecode _),
    "mm_tiff_decode"        -> (LlmQueries.mmTiffDecode _),
    "mm_incremental_phash"  -> (LlmQueries.mmIncrementalPhash _),
    "mm_cdc_chunking"       -> (LlmQueries.mmCdcDedup _),
    "a27_orc_roundtrip"     -> (PipelineQueries.a27OrcRoundtrip _),
    "a28_jsonl_roundtrip"   -> (PipelineQueries.a28JsonlRoundtrip _),
    "a29_corrupt_records"   -> (PipelineQueries.a29CorruptRecords _),
    "dq_drift"              -> (LlmQueries.dqDrift _),
    "sim_mips_topk"         -> (LlmQueries.simMipsTopK _),
    "sim_scalar_quant"      -> (LlmQueries.simScalarQuant _),
    "sim_sq_recall"         -> (LlmQueries.simSqRecall _),
    "sim_maxsim"            -> (LlmQueries.simMaxsim _),
    "sim_hybrid_rrf"        -> (LlmQueries.simHybridRrf _),
    "dedup_incremental_lsh" -> (LlmQueries.dedupIncrementalLsh _),
    "prep_weighted_sample"  -> (LlmQueries.prepWeightedSample _),
    "sim_range_search"      -> (LlmQueries.simRangeSearch _),
    "text_pii"              -> (LlmQueries.textPii _),
    "sim_twostage"          -> (LlmQueries.simTwoStage _),
    "sim_twostage_recall"   -> (LlmQueries.simTwoStageRecall _),
    "a24_compaction"        -> (PipelineQueries.a24Compaction _),
    "a25_manifest"          -> (PipelineQueries.a25Manifest _),
    "prep_split"            -> (LlmQueries.prepSplit _),
    "prep_leakage_split"    -> (LlmQueries.prepLeakageSplit _),
    "prep_kfold"            -> (LlmQueries.prepKfold _),
    "prep_mix"              -> (LlmQueries.prepMix _),
    "prep_pack"             -> (LlmQueries.prepPack _),
    "prep_chunk"            -> (LlmQueries.prepChunk _),
    "prep_augment"          -> (LlmQueries.prepAugment _),
    "prep_shuffle"          -> (LlmQueries.prepShuffle _),
    "udaf_centroid"         -> (LlmQueries.udafCentroid _),
    "text_tfidf"            -> (LlmQueries.textTfidf _),
    "text_bm25"             -> (LlmQueries.textBm25 _),
    "text_winnowing"        -> (LlmQueries.textWinnowing _),
    "text_bpe_apply"        -> (LlmQueries.textBpeApply _),
    "ml_kmeans"             -> (LlmQueries.mlKmeans _),
    "ml_linreg"             -> (Regression.mlLinReg _),
    "ml_logreg"             -> (LogReg.mlLogReg _),
    "ml_calibration"        -> (LogReg.mlCalibration _),
    "ml_pca_power"          -> (Pca.mlPcaPower _),
    "ml_pca_top3"           -> (Pca.mlPcaTop3 _),
    "ml_naive_bayes"        -> (NaiveBayes.mlNaiveBayes _),
    "graph_pagerank"        -> (Graph.graphPageRank _),
    "graph_triangles"       -> (Graph.graphTriangles _),
    "graph_labelprop"       -> (Graph.graphLabelProp _),
    "graph_bfs"             -> (Graph.graphBfs _),
    "graph_jaccard"         -> (Graph.graphJaccard _),
    "graph_closeness"       -> (Graph.graphCloseness _),
    "graph_wcc"             -> (Graph.graphWcc _),
    "graph_spaths"          -> (Graph.graphSPaths _),
    "graph_betweenness"     -> (Graph.graphBetweenness _),
    "graph_mst"             -> (Graph.graphMst _),
    "graph_modularity"      -> (Graph.graphModularity _),
    "ml_stump"              -> (Regression.mlStump _),
    "ml_tree_depth2"        -> (Regression.mlTreeDepth2 _),
    "ml_ridge"              -> (Regression.mlRidge _),
    "ml_cv"                 -> (Regression.mlCv _),
    "ml_dbscan"             -> (Metrics.mlDbscan _),
    "ml_isotonic"           -> (Metrics.mlIsotonic _),
    "ml_ndcg"               -> (Metrics.mlNdcg _),
    "graph_ra"              -> (Graph.graphRa _),
    "ml_auc"                -> (Metrics.mlAuc _),
    "ml_knn"                -> (Metrics.mlKnn _),
    "ml_prf"                -> (Metrics.mlPrf _),
    "ml_boosted_stumps"     -> (Regression.mlBoostedStumps _),
    "q51_skyline"           -> (Analytics.skyline _),
    "q52_weighted_median"   -> (Analytics.weightedMedian _),
    "q53_mode"              -> (Analytics.modePerGroup _),
    "q54_merge_all"         -> (Queries.q54 _),
    "q55_seq_pattern"       -> (Queries.q55 _),
    "q56_rolling_slope"     -> (Analytics.rollingSlope _),
    "q57_attribution"       -> (Analytics.attribution _),
    "dq_benford"            -> (Analytics.dqBenford _),
    "dq_ks"                 -> (Analytics.dqKs _),
    "dq_cusum"              -> ((s, d) => Analytics.dqCusum(s, d)),
    "text_heavy_hitters"    -> (LlmQueries.textHeavyHitters _),
    "text_cms_probe"        -> (LlmQueries.textCmsProbe _),
    "text_overlap_kmv"      -> (LlmQueries.textOverlapKmv _),
  )

  /** The standard PPM-generator byte value (the [[operators.Multimodal
    * .ppmMedia]] formula) for oracle SQL, with `$b` the byte-index
    * variable; `seed`/`w`/`dlt` come from the surrounding dims CTE.
    */
  private def stdByteSql(b: String): String =
    s"""(seed * 31 + $b * 17 + (seed * $b) % 251
       |      + 40 * (($b // (w * 3)) % 6)
       |      + CASE WHEN $b < 6 THEN dlt ELSE 0 END) % 256""".stripMargin

  /** The CLAMPED generator byte ([[operators.Multimodal.ppmMediaClamped]]):
    * base compressed into 30..209, then a row-linear gradient of
    * amplitude `dlt` added OUTSIDE the mod (never wraps for dlt ≤ 46).
    */
  private def clampedByteSql(b: String): String =
    s"""((seed * 31 + $b * 17 + (seed * $b) % 251
       |      + 40 * (($b // (w * 3)) % 6)) % 256) * 180 // 256 + 30
       |      + ($b // (w * 3)) * dlt // h""".stripMargin

  /** DuckDB replay of the integer DCT pHash ([[operators.Multimodal]]
    * `dctPhash64`) from a `corpus(doc_id, seed, dlt)` CTE to per-doc
    * 4×16-bit `bands(doc_id, band, bv)`: 32×32 nearest-sample luma grid,
    * 1024·g − Σg mean-centering, two-stage DCT against the SAME
    * fixed-point cosine table the engine uses (interpolated from
    * [[operators.Multimodal.DctT]]), 63·F > ΣAC threshold bits.
    */
  private def dctBandsSql(byteSql: String => String): String =
    s"""dims AS (SELECT doc_id, seed, dlt,
       |  CAST(seed % 13 + 8 AS BIGINT) AS w,
       |  CAST(seed % 11 + 8 AS BIGINT) AS h FROM corpus),
       |grid AS MATERIALIZED (
       |  SELECT doc_id, seed, dlt, w, h, gx.cx, gy.cy,
       |    (gx.cx * w) // 32 AS px, (gy.cy * h) // 32 AS py
       |  FROM dims,
       |    LATERAL (SELECT unnest(range(0, 32)) AS cx) gx,
       |    LATERAL (SELECT unnest(range(0, 32)) AS cy) gy),
       |glum AS MATERIALIZED (
       |  SELECT doc_id, cx, cy, SUM(
       |    (CASE bb.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
       |    (${byteSql("bb.b")})) AS lum
       |  FROM grid, LATERAL (SELECT unnest(range(3 * (py * w + px),
       |    3 * (py * w + px) + 3)) AS b) bb
       |  GROUP BY 1, 2, 3),
       |gtot AS (SELECT doc_id, SUM(lum) AS gt FROM glum GROUP BY 1),
       |gcen AS (SELECT g.doc_id, cx, cy, 1024 * lum - gt AS v
       |  FROM glum g JOIN gtot USING (doc_id)),
       |dct AS (SELECT * FROM (VALUES ${operators.Multimodal.dctTableSql})
       |  v(u, x, t)),
       |r1 AS (SELECT doc_id, d.u, gcen.cy AS cy, SUM(d.t * gcen.v) AS rv
       |  FROM gcen JOIN dct d ON d.x = gcen.cx GROUP BY 1, 2, 3),
       |fc AS MATERIALIZED (
       |  SELECT r1.doc_id, r1.u, d.u AS vfreq, SUM(d.t * r1.rv) AS fv
       |  FROM r1 JOIN dct d ON d.x = r1.cy GROUP BY 1, 2, 3),
       |ac AS (SELECT doc_id, SUM(fv) AS s FROM fc GROUP BY 1),
       |bits AS (SELECT fc.doc_id, (fc.u * 8 + fc.vfreq) // 16 AS band,
       |    CAST((fc.u * 8 + fc.vfreq) % 16 AS INT) AS bandbit,
       |    CASE WHEN 63 * fv > s THEN 1 ELSE 0 END AS bit
       |  FROM fc JOIN ac USING (doc_id)),
       |bands AS MATERIALIZED (SELECT doc_id, band,
       |    CAST(SUM(bit * (1::BIGINT << bandbit)) AS BIGINT) AS bv
       |  FROM bits GROUP BY 1, 2)""".stripMargin

  /** DuckDB replay of the 8×8 block-mean aHash (all-pixel walk) to
    * `abands(doc_id, band, bv)` — prefixed names so it composes with
    * [[dctBandsSql]] in one WITH chain (the recall oracle runs both).
    */
  private def ahashBandsSql(byteSql: String => String): String =
    s"""adims AS (SELECT doc_id, seed, dlt,
       |  CAST(seed % 13 + 8 AS BIGINT) AS w,
       |  CAST(seed % 11 + 8 AS BIGINT) AS h FROM corpus),
       |apx AS MATERIALIZED (SELECT doc_id,
       |    (((g.b // 3) // w) * 8 // h) * 8 + (((g.b // 3) % w) * 8 // w)
       |      AS cell,
       |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
       |    (${byteSql("g.b")}) AS lum
       |  FROM adims, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g),
       |acells AS (SELECT doc_id, cell, SUM(lum) AS cs, COUNT(*) AS cc
       |  FROM apx GROUP BY 1, 2),
       |atot AS (SELECT doc_id, SUM(cs) AS ts, SUM(cc) AS tc
       |  FROM acells GROUP BY 1),
       |abits AS (SELECT c.doc_id, c.cell // 16 AS band,
       |    CAST(c.cell % 16 AS INT) AS bandbit,
       |    CASE WHEN c.cs * t.tc > t.ts * c.cc THEN 1 ELSE 0 END AS bit
       |  FROM acells c JOIN atot t USING (doc_id)),
       |abands AS MATERIALIZED (SELECT doc_id, band,
       |    CAST(SUM(bit * (1::BIGINT << bandbit)) AS BIGINT) AS bv
       |  FROM abits GROUP BY 1, 2)""".stripMargin

  /** Full oracle for the DCT near-dup rows: generator corpus (originals
    * + perturbed copies), [[dctBandsSql]] signatures, band-collision
    * candidates, exact-hamming verify. `deltaInvolving` restricts the
    * pair class to delta-involving pairs (the incremental surface).
    */
  private def phashDctOracleSql(deltaInvolving: Boolean): String =
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |corpus AS (
       |  SELECT doc_id, doc_id AS seed, 0 AS dlt FROM ids
       |  UNION ALL SELECT doc_id + 1000000, doc_id, 8 FROM ids),
       |${dctBandsSql(stdByteSql)},
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
       |  ${if (deltaInvolving) "WHERE y.doc_id >= 1000000" else ""}),
       |hx AS (SELECT c.a, c.b, SUM(bit_count(xor(x.bv, y.bv))) AS hamming
       |  FROM cand c
       |  JOIN bands x ON x.doc_id = c.a
       |  JOIN bands y ON y.doc_id = c.b AND y.band = x.band
       |  GROUP BY 1, 2)
       |SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM hx
       |WHERE hamming <= 3 ORDER BY a, b""".stripMargin

  /** Oracle for mm_phash_recall: both signature pipelines over the
    * clamped gradient fixture; per-planted-pair hamming (banding is
    * exhaustive at ≤ 3, so direct hamming IS the banded operator's
    * recall); one row per method.
    */
  private def phashRecallOracleSql: String =
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |corpus AS (
       |  SELECT doc_id, doc_id AS seed, 0 AS dlt FROM ids
       |  UNION ALL SELECT doc_id + 1000000, doc_id, 12 FROM ids),
       |${dctBandsSql(clampedByteSql)},
       |${ahashBandsSql(clampedByteSql)},
       |n AS (SELECT COUNT(*) AS np FROM ids),
       |dham AS (SELECT i.doc_id AS a, SUM(bit_count(xor(x.bv, y.bv))) AS hm
       |  FROM ids i
       |  JOIN bands x ON x.doc_id = i.doc_id
       |  JOIN bands y ON y.doc_id = i.doc_id + 1000000 AND y.band = x.band
       |  GROUP BY 1),
       |aham AS (SELECT i.doc_id AS a, SUM(bit_count(xor(x.bv, y.bv))) AS hm
       |  FROM ids i
       |  JOIN abands x ON x.doc_id = i.doc_id
       |  JOIN abands y ON y.doc_id = i.doc_id + 1000000 AND y.band = x.band
       |  GROUP BY 1)
       |SELECT * FROM (
       |  SELECT 'ahash_block_mean' AS method, CAST(np AS BIGINT) AS n_planted,
       |    CAST((SELECT COUNT(*) FROM aham WHERE hm <= 3) AS BIGINT)
       |      AS n_found,
       |    ROUND((SELECT COUNT(*) FROM aham WHERE hm <= 3)
       |      / CAST(np AS DOUBLE), 4) AS recall
       |  FROM n
       |  UNION ALL
       |  SELECT 'phash_dct', CAST(np AS BIGINT),
       |    CAST((SELECT COUNT(*) FROM dham WHERE hm <= 3) AS BIGINT),
       |    ROUND((SELECT COUNT(*) FROM dham WHERE hm <= 3)
       |      / CAST(np AS DOUBLE), 4)
       |  FROM n)
       |ORDER BY method""".stripMargin

  /** The unrolled BPE-training recurrence as a DuckDB WITH chain:
    * `v0` = spaced distinct-token vocabulary with corpus counts, then per
    * round r: `p_r` (piece-pair counts over `v_{r-1}`), `m_r` (argmax
    * pair, lexicographic tie-break — the engine's exact rule), `v_r`
    * (exhaustive leftmost replace with BOTH piece boundaries guarded via
    * the double-space-and-pad spelling — the engine's
    * `TextAnalysis.mergeGuarded`, mirrored glyph-for-glyph).
    * MATERIALIZED per multi-referenced
    * CTE, or DuckDB's inlining explodes exponentially across rounds.
    */
  private def bpeRecurrenceSql(rounds: Int): String = {
    val v0 =
      """toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |v0 AS MATERIALIZED (
        |  SELECT tok, trim(regexp_replace(tok, '(.)', '\1 ', 'g')) AS sp,
        |    CAST(COUNT(*) AS BIGINT) AS tc
        |  FROM toks GROUP BY 1, 2)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""p$r AS (SELECT t.sl[g.i] || ' ' || t.sl[g.i + 1] AS pair,
         |    SUM(tc) AS w
         |  FROM v${r - 1} v,
         |    LATERAL (SELECT string_split(v.sp, ' ') AS sl) t,
         |    LATERAL (SELECT unnest(range(1, len(t.sl))) AS i) g
         |  GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT pair, w FROM p$r
         |  ORDER BY w DESC, pair LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT tok, replace(trim(replace(
         |      '  ' || replace(sp, ' ', '  ') || '  ',
         |      ' ' || replace((SELECT pair FROM m$r), ' ', '  ') || ' ',
         |      ' ' || replace((SELECT pair FROM m$r), ' ', '') || ' ')),
         |    '  ', ' ') AS sp, tc
         |  FROM v${r - 1})""".stripMargin
    }
    (v0 +: rs).mkString(",\n")
  }

  /** Oracle for text_bpe_train: the learned `(round, merge, weight)` list
    * from the unrolled recurrence.
    */
  private def bpeTrainOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)}
       |SELECT * FROM (
       |  ${(1 to rounds).map(r =>
           s"SELECT CAST($r AS BIGINT) AS round, pair AS merge, " +
             s"CAST(w AS BIGINT) AS weight FROM m$r")
           .mkString("\n  UNION ALL ")}
       |) ORDER BY round""".stripMargin

  /** Oracle for text_bpe_apply (trained list consumed end-to-end): the
    * recurrence's FINAL vocabulary state, counted piece-wise — trainer
    * and applier share exhaustive leftmost-replace semantics, so the
    * applied corpus equals `v_rounds` exactly.
    */
  private def bpeApplyOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)},
       |pieces AS (SELECT unnest(string_split(sp, ' ')) AS piece, tc
       |  FROM v$rounds)
       |SELECT piece, CAST(SUM(tc) AS BIGINT) AS n_occ
       |FROM pieces GROUP BY piece ORDER BY n_occ DESC, piece LIMIT 20"""
      .stripMargin

  /** Oracle for text_bpe_encode: the recurrence's final vocabulary state
    * (token kept through every round) joined back onto each document's
    * token stream — per-doc piece statistics.
    */
  private def bpeEncodeOracleSql(rounds: Int): String =
    s"""WITH ${bpeRecurrenceSql(rounds)},
       |vf AS (SELECT tok, len(string_split(sp, ' ')) AS np,
       |  length(tok) AS nc FROM v$rounds),
       |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  ROUND(SUM(nc) / CAST(SUM(np) AS DOUBLE), 4) AS compression
       |FROM dt JOIN vf USING (tok)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB oracle SQL per query (SURVEY §2.B; DuckDB spellings per its
    * footnotes: json_extract_string, list_dot_product with a DOUBLE[] cast
    * so float math matches Spark's double-precision HOF bit-for-bit).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q02_filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_returnflag IN ('A', 'R')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02b_like_null_regex" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE source LIKE 'src1%' AND lang IS NOT NULL AND lang <> 'zh'
        |  AND regexp_matches(text, '^[a-z]')
        |ORDER BY doc_id""".stripMargin,
    "q03_hash_aggregate" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sq,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev,
        |  ROUND(AVG(l_quantity), 2) AS aq,
        |  COUNT(*) AS c
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q04_star_join" ->
      """SELECT r_name, n_name,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q07_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q08_merge_upsert" ->
      """WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
        |     stage AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.o_orderstatus, e.o_orderstatus) AS st
        |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    "q09_theta_join" ->
      """SELECT o_orderkey, COUNT(*) AS n
        |FROM orders o JOIN lineitem l
        |  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        |GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q10_window_topk" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) AS ranked
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q11_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_count_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS dp,
        |       COUNT(DISTINCT l_suppkey) AS ds FROM lineitem""".stripMargin,
    "q13_rollup_grouping" ->
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name) AS INT) AS g1,
        |  CAST(GROUPING(n_name) AS INT) AS g2,
        |  COUNT(*) AS c
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY g1, g2, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q13b_cube_grouping" ->
      """SELECT r_name, n_name,
        |  CAST(GROUPING(r_name) AS INT) AS g1,
        |  CAST(GROUPING(n_name) AS INT) AS g2,
        |  COUNT(*) AS c
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY g1, g2, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q14_string_functions" ->
      """SELECT doc_id, UPPER(lang) AS ul,
        |  REPLACE(REPLACE(source, ' ', '_'), '/', '_and_') AS s2,
        |  CAST(LENGTH(text) AS BIGINT) AS n,
        |  SUBSTRING(text, 1, 10) AS t10
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "q15_datetime" ->
      """SELECT CAST(ts AS DATE) AS d,
        |  CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
        |  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
        |  COUNT(*) AS c
        |FROM events GROUP BY 1, 2, 3 ORDER BY d, h""".stripMargin,
    "q16_global_topk" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
        |ORDER BY p DESC, o_orderkey LIMIT 10""".stripMargin,
    "q17_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin,
    "q17b_except" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin,
    "q17c_union_all" ->
      """SELECT k, COUNT(*) AS c FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey AS k FROM supplier) AS u
        |GROUP BY k ORDER BY k""".stripMargin,
    "q18_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_cosine_topk" ->
      """SELECT e2.vec_id,
        |  ROUND(
        |    list_dot_product(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(e1.embedding AS DOUBLE[]), CAST(e1.embedding AS DOUBLE[])))
        |       * sqrt(list_dot_product(CAST(e2.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])))),
        |    4) AS cos
        |FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id = 0 AND e2.vec_id <> 0
        |ORDER BY cos DESC, e2.vec_id LIMIT 10""".stripMargin,
    "q20_time_bucket_agg" ->
      """SELECT user_id, date_trunc('hour', ts) AS w,
        |  COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY user_id, date_trunc('hour', ts)
        |ORDER BY user_id, w""".stripMargin,
    "q21_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(ROUND(o_totalprice, 2), 1) OVER w AS prev_p,
        |  lead(ROUND(o_totalprice, 2), 1) OVER w AS next_p,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q22_percentiles" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    list(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |         ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS xs,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND(xs[CAST(floor((n - 1) * 0.5) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.5) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.5) AS INT) + 1])
        |      * ((n - 1) * 0.5 - floor((n - 1) * 0.5)), 0) / 100.0 AS med,
        |  ROUND(xs[CAST(floor((n - 1) * 0.9) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.9) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.9) AS INT) + 1])
        |      * ((n - 1) * 0.9 - floor((n - 1) * 0.9)), 0) / 100.0 AS p90,
        |  ROUND(xs[CAST(floor((n - 1) * 0.99) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.99) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.99) AS INT) + 1])
        |      * ((n - 1) * 0.99 - floor((n - 1) * 0.99)), 0) / 100.0 AS p99
        |FROM s ORDER BY l_returnflag""".stripMargin,
    // Tolerance oracle: the engine emits the exact percentiles (the q22
    // cents formulation, hash-stable cross-engine) plus approx_ok = the
    // sketch estimate landed in the exact q±0.002 value band. DuckDB
    // recomputes the exact values and asserts TRUE — a drifting sketch
    // flips the flag and fails the hash compare.
    "q22b_approx_percentiles" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    list(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |         ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS xs,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  ROUND(xs[CAST(floor((n - 1) * 0.5) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.5) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.5) AS INT) + 1])
        |      * ((n - 1) * 0.5 - floor((n - 1) * 0.5)), 0) / 100.0 AS med,
        |  ROUND(xs[CAST(floor((n - 1) * 0.9) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.9) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.9) AS INT) + 1])
        |      * ((n - 1) * 0.9 - floor((n - 1) * 0.9)), 0) / 100.0 AS p90,
        |  ROUND(xs[CAST(floor((n - 1) * 0.99) AS INT) + 1]
        |    + (xs[CAST(ceil((n - 1) * 0.99) AS INT) + 1]
        |       - xs[CAST(floor((n - 1) * 0.99) AS INT) + 1])
        |      * ((n - 1) * 0.99 - floor((n - 1) * 0.99)), 0) / 100.0 AS p99,
        |  TRUE AS approx_ok
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q23_correlated_scalar" ->
      """SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "q24_math_functions" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(ABS(l_discount - 0.05)), 2) AS s_abs,
        |  CAST(SUM(FLOOR(l_extendedprice / 1000)) AS BIGINT) AS s_floor,
        |  CAST(SUM(CEIL(l_quantity / 7)) AS BIGINT) AS s_ceil,
        |  ROUND(SUM(SQRT(l_quantity)), 2) AS s_sqrt,
        |  ROUND(SUM(LN(l_extendedprice)), 2) AS s_ln,
        |  ROUND(AVG(EXP(l_discount)), 4) AS a_exp,
        |  ROUND(SUM(POWER(l_tax, 2)), 4) AS s_pow,
        |  CAST(SUM(CAST(l_partkey AS BIGINT) % 97) AS BIGINT) AS s_mod
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // --- pipeline operators (A*): round-trip/merge outputs the oracle
    // reproduces straight from the source tables ---
    "a01_jdbc_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a02_jdbc_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a03_default_projection" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "a12_throttled_sync" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
        |  UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |  UNION ALL SELECT 'region', COUNT(*) FROM region
        |) AS t ORDER BY table_name""".stripMargin,
    "a13_retry_sync" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    // timed-out first attempt + successful retry publish the same snapshot
    // a healthy run would
    "a26_export_timeout" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "a14_schedule" ->
      """SELECT * FROM (VALUES
        |  ('2020-03-07T05:30', '2020-03-07T06:00', '2020-03-06'),
        |  ('2020-03-07T06:00', '2020-03-08T06:00', '2020-03-07'),
        |  ('2020-03-07T23:59', '2020-03-08T06:00', '2020-03-07')
        |) AS t(probe, next_fire, data_date) ORDER BY probe""".stripMargin,
    "a04_catalog_scan" ->
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'BIGINT', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('c_name', 'CLOB(2147483647)', 'STRING', 2),
        |  ('c_nationkey', 'INTEGER', 'INTEGER', 3),
        |  ('c_acctbal', 'DOUBLE', 'FLOAT', 4),
        |  ('c_mktsegment', 'CLOB(2147483647)', 'STRING', 5)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // the MySQL-shaped catalog path: expected output of the reference's
    // literal INFORMATION_SCHEMA query + type map over the appdb.accounts
    // fixture (decoy schema/table rows must NOT appear)
    "a04b_mysql_catalog" ->
      """SELECT * FROM (VALUES
        |  ('id', 'bigint', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('flags', 'tinyint', 'INTEGER', 2),
        |  ('region_id', 'mediumint', 'INTEGER', 3),
        |  ('balance', 'decimal', 'FLOAT', 4),
        |  ('ratio', 'double', 'FLOAT', 5),
        |  ('score', 'float', 'FLOAT', 6),
        |  ('created_at', 'datetime', 'DATETIME', 7),
        |  ('birth_date', 'date', 'DATE', 8),
        |  ('updated_at', 'timestamp', 'DATETIME', 9),
        |  ('bio', 'text', 'STRING', 10),
        |  ('name', 'varchar', 'STRING', 11),
        |  ('location', 'point', 'INTEGER', 12),
        |  ('prefs', 'json', 'STRING', 13),
        |  ('last_login', 'datetime', 'DATETIME', 14)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // Dialect-quirk contract pinned as a literal truth table: zero-date →
    // NULL (CONVERT_TO_NULL), unsigned BIGINT max survives via
    // DECIMAL(20,0), tinyint(1) stays the reference-faithful INTEGER.
    "a04c_mysql_quirks" ->
      """SELECT * FROM (VALUES
        |  ('big_id', 'bigint unsigned', 'INTEGER', 'decimal(20,0)', '18446744073709551615'),
        |  ('born', 'datetime', 'DATETIME', 'timestamp_ntz', NULL),
        |  ('is_active', 'tinyint(1)', 'INTEGER', 'bigint', '1'),
        |  ('price', 'decimal(10,2) unsigned', 'FLOAT', 'double', '999.99'),
        |  ('small_id', 'bigint unsigned', 'INTEGER', 'decimal(20,0)', '42'),
        |  ('updated', 'datetime', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    // The Postgres sibling truth table: serial/boolean/numeric names fall
    // through the MySQL-tuned reference map to STRING (faithful), the
    // engine keeps native types; timestamptz normalizes to the UTC
    // instant; infinity sentinels → NULL; numeric-without-scale survives
    // at DECIMAL(38,9) under the fidelity flag.
    "a04d_pg_quirks" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'numeric', 'STRING', 'decimal(38,9)', '12345678901234567890.123456789'),
        |  ('big_id', 'bigserial', 'STRING', 'bigint', '9223372036854775807'),
        |  ('created_at', 'timestamp with time zone', 'DATETIME', 'timestamp', '2024-05-01 08:30:00'),
        |  ('expires_at', 'timestamptz', 'DATETIME', 'timestamp', NULL),
        |  ('id', 'serial', 'STRING', 'bigint', '2147483647'),
        |  ('is_active', 'boolean', 'STRING', 'boolean', 'true'),
        |  ('is_deleted', 'boolean', 'STRING', 'boolean', 'false'),
        |  ('seq_no', 'integer', 'INTEGER', 'bigint', '2147483647'),
        |  ('sid', 'smallserial', 'STRING', 'bigint', '32767')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    // The SQL Server sibling truth table: bit/money/uniqueidentifier fall
    // through the substring map to STRING (faithful — "BIT" contains no
    // "INT"), engine keeps boolean/exact-decimal; datetime2's 7th
    // fractional digit truncates at engine microseconds; datetimeoffset
    // normalizes to the UTC instant; tinyint is unsigned, 255 survives.
    "a04e_mssql_quirks" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'money', 'STRING', 'decimal(19,4)', '922337203685477.5807'),
        |  ('created_at', 'datetime2', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00.123456'),
        |  ('event_at', 'datetimeoffset', 'DATETIME', 'timestamp', '2024-05-01 08:30:00'),
        |  ('flag_off', 'bit', 'STRING', 'boolean', 'false'),
        |  ('is_active', 'bit', 'STRING', 'boolean', 'true'),
        |  ('modified_at', 'smalldatetime', 'DATETIME', 'timestamp_ntz', '2024-05-01 10:30:00'),
        |  ('qty', 'tinyint', 'INTEGER', 'bigint', '255'),
        |  ('row_guid', 'uniqueidentifier', 'STRING', 'string', '6f9619ff-8b86-d011-b42d-00c04fc964ff'),
        |  ('tip', 'smallmoney', 'STRING', 'decimal(10,4)', '214748.3647'),
        |  ('title', 'nvarchar(100)', 'STRING', 'string', 'naïve café')
        |) AS t(col_name, raw_type, bq_type, spark_type, parsed)
        |ORDER BY col_name""".stripMargin,
    "a05_type_mapping" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'decimal', 'balance', 'FLOAT', 'double'),
        |  ('born', 'datetime', 'born', 'DATETIME', 'timestamp_ntz'),
        |  ('either/or', 'varchar', 'either_and_or', 'STRING', 'string'),
        |  ('full name', 'varchar', 'full_name', 'STRING', 'string'),
        |  ('id', 'int', 'id', 'INTEGER', 'bigint'),
        |  ('note', 'text', 'note', 'STRING', 'string'),
        |  ('pt', 'point', 'pt', 'INTEGER', 'bigint'),
        |  ('ratio', 'double', 'ratio', 'FLOAT', 'double'),
        |  ('start_date', 'date', 'start_date', 'DATE', 'date'),
        |  ('ts_col', 'timestamp', 'ts_col', 'DATETIME', 'timestamp_ntz')
        |) AS t(raw_name, raw_type, col_name, bq_type, spark_type)
        |ORDER BY raw_name""".stripMargin,
    "a06_schema_json" ->
      """SELECT '[{"name": "id", "type": "INTEGER", "mode": "NULLABLE"}, {"name": "full_name", "type": "STRING", "mode": "NULLABLE"}, {"name": "either_and_or", "type": "STRING", "mode": "NULLABLE"}, {"name": "born", "type": "DATETIME", "mode": "NULLABLE"}, {"name": "start_date", "type": "DATE", "mode": "NULLABLE"}, {"name": "balance", "type": "FLOAT", "mode": "NULLABLE"}, {"name": "ratio", "type": "FLOAT", "mode": "NULLABLE"}, {"name": "note", "type": "STRING", "mode": "NULLABLE"}, {"name": "ts_col", "type": "DATETIME", "mode": "NULLABLE"}, {"name": "pt", "type": "INTEGER", "mode": "NULLABLE"}]' AS schema_json""".stripMargin,
    "a07_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,
    "a08_chunk_roundtrip" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "a09_overwrite_snapshot" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "a10_merge_helper" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus AS st,
        |       ROUND(o_totalprice + 1000, 2) AS p FROM orders WHERE o_orderkey % 2 = 0),
        |     stage AS (SELECT o_orderkey, o_orderstatus AS st,
        |       ROUND(o_totalprice, 2) AS p FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p
        |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    "a11_sync_pipeline" ->
      """WITH existing AS (SELECT o_orderkey, o_orderstatus,
        |       ROUND(o_totalprice + 1000, 2) AS p FROM orders WHERE o_orderkey % 2 = 0),
        |     stage AS (SELECT o_orderkey, o_orderstatus,
        |       ROUND(o_totalprice, 2) AS p FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS o_orderkey,
        |       COALESCE(s.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
        |       COALESCE(s.p, e.p) AS p
        |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "a15_run_date" ->
      """SELECT DISTINCT strftime(o_orderdate, '%Y%m%d') AS ds FROM orders
        |ORDER BY ds LIMIT 100""".stripMargin,
    // --- LLM-pipeline operators: ground-truth oracles (near-dup corpora
    // constructed identically; the oracle computes all-pairs truth, so the
    // engine's bucketed path is checked for RECALL, not just consistency) ---
    "asof_join" ->
      """SELECT c.event_id, c.user_id, p.event_id AS p_id,
        |       ROUND(p.value, 2) AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "asof_join_native" ->
      """SELECT c.event_id, c.user_id, p.event_id AS p_id,
        |       ROUND(p.value, 2) AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    // Unbounded ASOF match CASE-nulled at the same 1 h cutoff: the as-of
    // match is the LATEST preceding row, so out-of-window implies no row
    // is in-window — the conditional IS the tolerance semantics.
    // DuckDB has no NEAREST direction: the oracle takes the definitional
    // per-row LATERAL argmin over |dist| with the (dist, earlier-ts,
    // greatest-payload) tie order the engine guarantees by construction
    "asof_nearest" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p0 AS (
        |  SELECT user_id, ts, event_id AS p_id, ROUND(value, 2) AS p_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC, p_value DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, p_id, p_value FROM p0 WHERE rn = 1)
        |SELECT c.event_id, c.user_id, n.p_id, n.p_value
        |FROM c LEFT JOIN LATERAL (
        |  SELECT p.p_id, p.p_value FROM p
        |  WHERE p.user_id = c.user_id
        |  ORDER BY ABS(epoch_us(p.ts) - epoch_us(c.ts)), p.ts
        |  LIMIT 1) n ON TRUE
        |ORDER BY c.event_id""".stripMargin,
    "asof_tolerance" ->
      """SELECT c.event_id, c.user_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN p.event_id END AS p_id,
        |  CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR THEN ROUND(p.value, 2) END AS p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
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
    "mm_binary_meta" ->
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
        |  md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "udaf_centroid" ->
      """SELECT label, CAST(g.i AS BIGINT) AS i,
        |  ROUND(AVG(CAST(embedding[g.i] AS DOUBLE)), 4) + 0.0 AS v
        |FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g
        |GROUP BY label, g.i ORDER BY label, i""".stripMargin,
    "q25_pivot" ->
      """SELECT EXTRACT(year FROM o_orderdate) AS yr,
        |  ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
        |  ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
        |  ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q26_unpivot" ->
      """WITH w AS (
        |  SELECT c_nationkey AS nation,
        |         ROUND(CAST(COUNT(*) AS DOUBLE), 2) AS n_cust,
        |         ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
        |           / COUNT(*), 0) / 100.0 AS avg_bal,
        |         ROUND(MAX(c_acctbal), 2) AS max_bal
        |  FROM customer GROUP BY 1)
        |SELECT nation, 'avg_bal' AS metric, avg_bal AS value FROM w
        |UNION ALL SELECT nation, 'max_bal', max_bal FROM w
        |UNION ALL SELECT nation, 'n_cust', n_cust FROM w
        |ORDER BY nation, metric""".stripMargin,
    "q27_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR CAST(floor(epoch(ts)) AS BIGINT)
        |              - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |sq AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM b)
        |SELECT user_id, session_seq, MIN(ts) AS session_start,
        |       COUNT(*) AS n_events,
        |       CAST(floor(epoch(MAX(ts))) AS BIGINT)
        |         - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec
        |FROM sq GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q29_profile" ->
      """WITH p AS (
        |  SELECT 'c_acctbal' AS col_name, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    COUNT(DISTINCT c_acctbal) AS n_distinct,
        |    ROUND(MIN(CAST(c_acctbal AS DOUBLE)), 2) AS min_v,
        |    ROUND(MAX(CAST(c_acctbal AS DOUBLE)), 2) AS max_v
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_custkey', COUNT(*),
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT c_custkey),
        |    ROUND(MIN(CAST(c_custkey AS DOUBLE)), 2), ROUND(MAX(CAST(c_custkey AS DOUBLE)), 2)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(*),
        |    CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT c_mktsegment),
        |    ROUND(MIN(CAST(length(c_mktsegment) AS DOUBLE)), 2),
        |    ROUND(MAX(CAST(length(c_mktsegment) AS DOUBLE)), 2)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_name', COUNT(*),
        |    CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT c_name),
        |    ROUND(MIN(CAST(length(c_name) AS DOUBLE)), 2),
        |    ROUND(MAX(CAST(length(c_name) AS DOUBLE)), 2)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', COUNT(*),
        |    CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    COUNT(DISTINCT c_nationkey),
        |    ROUND(MIN(CAST(c_nationkey AS DOUBLE)), 2), ROUND(MAX(CAST(c_nationkey AS DOUBLE)), 2)
        |  FROM customer)
        |SELECT * FROM p ORDER BY col_name""".stripMargin,
    "q30_hash_sample" ->
      """SELECT c_custkey, c_nationkey, ROUND(c_acctbal, 2) AS bal
        |FROM customer
        |WHERE (c_nationkey < 10
        |       AND ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10 < 2)
        |   OR (c_nationkey >= 10
        |       AND ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 10 < 1)
        |ORDER BY c_custkey""".stripMargin,
    "q31_bloom_semi_join" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines, ROUND(SUM(l_extendedprice), 2) AS rev
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l_orderkey AND o.o_totalprice > 400000.0)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q32_range_bucket_join" ->
      """WITH w AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start
        |  FROM events WHERE event_type = 'error')
        |SELECT win_start, COUNT(*) AS n_events
        |FROM events e JOIN w ON date_trunc('day', e.ts) = w.win_start
        |  AND e.ts >= w.win_start AND e.ts < w.win_start + INTERVAL 1 DAY
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    // Direct (un-bucketed) interval-overlap truth: the oracle joins on
    // the raw overlap predicate; the engine's bucketed first-shared-
    // bucket emission must produce the identical pair set.
    "q41_interval_overlap" ->
      """WITH w AS (
        |  SELECT DISTINCT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS win_start
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000),
        |w2 AS (SELECT win_start, win_start + INTERVAL 2 DAY AS win_last FROM w),
        |li AS (
        |  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS sd,
        |    CAST(date_trunc('day', l_shipdate) AS TIMESTAMP)
        |      + (CAST(l_quantity AS INT) % 7 + 1) * INTERVAL 1 DAY AS rd
        |  FROM lineitem)
        |SELECT win_start, COUNT(*) AS n_overlaps,
        |  ROUND(AVG(datediff('day', GREATEST(sd, win_start),
        |    LEAST(rd, win_last)) + 1), 4) AS avg_overlap_days
        |FROM li JOIN w2 ON sd <= win_last AND rd >= win_start
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
    // Same stacked running-max windowed-funnel formulation; strict >
    // comparisons make same-instant steps non-qualifying, so tie order
    // is irrelevant.
    "q43_funnel" ->
      """WITH w1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    MAX(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS t1r
        |  FROM events),
        |w2 AS (
        |  SELECT *, MAX(CASE WHEN event_type = 'click' AND t1r IS NOT NULL
        |                      AND ts > t1r AND ts <= t1r + INTERVAL 6 HOUR
        |                      THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS t2r
        |  FROM w1),
        |w3 AS (
        |  SELECT *, MAX(CASE WHEN event_type = 'purchase' AND t2r IS NOT NULL
        |                      AND ts > t2r AND ts <= t2r + INTERVAL 6 HOUR
        |                      THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS UNBOUNDED PRECEDING) AS t3r
        |  FROM w2),
        |pu AS (
        |  SELECT user_id,
        |    MAX(t1r IS NOT NULL) AS s1, MAX(t2r IS NOT NULL) AS s2,
        |    MAX(t3r IS NOT NULL) AS s3
        |  FROM w3 GROUP BY user_id),
        |st AS (
        |  SELECT SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS v,
        |         SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS c,
        |         SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS p
        |  FROM pu)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS name,
        |  CAST(v AS BIGINT) AS n_users, ROUND(v / CAST(v AS DOUBLE), 4) AS conv FROM st
        |UNION ALL
        |SELECT 2, 'view>click', CAST(c AS BIGINT),
        |  ROUND(c / CAST(v AS DOUBLE), 4) FROM st
        |UNION ALL
        |SELECT 3, 'view>click>purchase', CAST(p AS BIGINT),
        |  ROUND(p / CAST(v AS DOUBLE), 4) FROM st
        |ORDER BY step""".stripMargin,
    // Same Monday-truncated week cohorts; (wk - cohort) is integer days in
    // DuckDB and always a multiple of 7, so // 7 is the exact offset.
    "q44_retention" ->
      """WITH m AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk,
        |    MIN(CAST(date_trunc('week', ts) AS DATE))
        |      OVER (PARTITION BY user_id) AS cohort
        |  FROM events),
        |c AS (
        |  SELECT cohort, CAST((wk - cohort) // 7 AS BIGINT) AS week_offset,
        |    COUNT(DISTINCT user_id) AS n_users
        |  FROM m GROUP BY 1, 2)
        |SELECT cohort, week_offset, n_users,
        |  ROUND(n_users / CAST(MAX(CASE WHEN week_offset = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort) AS DOUBLE), 4) AS retention
        |FROM c ORDER BY cohort, week_offset""".stripMargin,
    // Same dedup-then-scatter: distinct (user, day) first, each row
    // contributes to its 7 trailing target days, inner join keeps only
    // observed days.
    // Same interpolating medians, same 3 * 1.4826 * mad threshold spelled
    // identically so both engines fold the same double constant.
    "dq_mad" ->
      """WITH med AS (SELECT event_type, MEDIAN(value) AS med
        |             FROM events GROUP BY 1),
        |mad AS (SELECT e.event_type, ANY_VALUE(med) AS med,
        |          MEDIAN(ABS(value - med)) AS mad
        |        FROM events e JOIN med USING (event_type)
        |        GROUP BY e.event_type)
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(ANY_VALUE(med), 4) AS med, ROUND(ANY_VALUE(mad), 4) AS mad,
        |  CAST(SUM(CASE WHEN ABS(value - med) > 3.0 * 1.4826 * mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN mad USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // The closed-form EWMA replayed verbatim: same windowed ordered sum,
    // same pow factors, same band rule — exact integer day counts in,
    // identical IEEE expression tree after.
    "dq_ewma" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |              FROM events GROUP BY 1),
        |s1 AS (SELECT day, n,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) - 1 AS t
        |  FROM daily),
        |s2 AS (SELECT day, n, t,
        |    n * pow(1.0 / 0.7, t) AS term,
        |    CAST(FIRST_VALUE(n) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS x0
        |  FROM s1),
        |s3 AS (SELECT day, n, t, x0,
        |    SUM(term) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tt
        |  FROM s2),
        |s4 AS (SELECT day, n,
        |    pow(0.7, t) * (x0 + 0.3 * (tt - x0)) AS ewma
        |  FROM s3),
        |s5 AS (SELECT day, n, ewma,
        |    LAG(ewma, 1) OVER (ORDER BY day) AS ewma_prev
        |  FROM s4)
        |SELECT day, CAST(n AS BIGINT) AS n,
        |  ROUND(COALESCE(ewma_prev, CAST(n AS DOUBLE)), 4) AS expected,
        |  (ewma_prev IS NOT NULL AND
        |    (n > ewma_prev * 1.5 OR n < ewma_prev / 1.5)) AS is_anomaly
        |FROM s5 ORDER BY day""".stripMargin,
    // Full observed-range calendar vs per-day volume; MEDIAN matches
    // Spark's interpolating percentile(n, 0.5) on even day counts.
    "dq_freshness" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |              FROM events GROUP BY 1),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi, MEDIAN(n) AS med FROM daily),
        |cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |          AS day, med FROM b)
        |SELECT cal.day, CAST(COALESCE(n, 0) AS BIGINT) AS n_rows,
        |  CASE WHEN n IS NULL THEN 'missing'
        |       WHEN n < med * 0.5 THEN 'low' ELSE 'ok' END AS status
        |FROM cal LEFT JOIN daily ON cal.day = daily.day
        |ORDER BY cal.day""".stripMargin,
    // The map SEMANTICS recomputed relationally — cardinality = line
    // count, lookup = the line-1 quantity, key max / value sum / the
    // canonical k:v rendering via ordered string_agg.
    "q47_map_functions" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem WHERE l_orderkey <= 2000
        |  GROUP BY l_orderkey, l_linenumber)
        |SELECT l_orderkey,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(MAX(CASE WHEN l_linenumber = 1 THEN qty END) AS BIGINT)
        |    AS qty_line1,
        |  CAST(MAX(l_linenumber) AS BIGINT) AS max_line,
        |  CAST(SUM(qty) AS BIGINT) AS total_qty,
        |  string_agg(l_linenumber || ':' || qty, ',' ORDER BY l_linenumber)
        |    AS entries_csv
        |FROM li GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    // ntile arithmetic is exact on row numbers once the ordering carries
    // a unique tie-break (c_custkey); both engines share the standard
    // earlier-buckets-take-the-remainder rule.
    "q48_ntile_buckets" ->
      """WITH r AS (
        |  SELECT c_mktsegment, ROUND(c_acctbal, 2) AS bal,
        |    ntile(10) OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey) AS decile,
        |    first_value(ROUND(c_acctbal, 2)) OVER (
        |      PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS seg_top_bal,
        |    nth_value(ROUND(c_acctbal, 2), 3) OVER (
        |      PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS third_bal
        |  FROM customer)
        |SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(MIN(bal), 2) AS floor_bal,
        |  ROUND(MAX(bal), 2) AS ceil_bal,
        |  ROUND(MAX(seg_top_bal), 2) AS seg_top_bal,
        |  ROUND(MAX(third_bal), 2) AS seg_third_bal
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the SQL-standard top-N-per-key: DuckDB executes the same LATERAL
    // text; ties broken by l_linenumber keep both engines deterministic
    "q49_lateral_topn" ->
      """SELECT o.o_orderkey AS k, o.o_orderdate AS od, l.ln, l.rev
        |FROM orders o,
        |LATERAL (
        |  SELECT l_linenumber AS ln,
        |         FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS rev
        |  FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY rev DESC, l_linenumber
        |  LIMIT 2) l
        |WHERE o.o_orderdate >= DATE '1998-01-01'
        |ORDER BY k, rev DESC, ln""".stripMargin,
    // ancestor-chain walk over the k -> k/2 binary tree; DuckDB's own
    // recursive CTE replays the identical recurrence (// = DIV on
    // non-negative ids)
    "q50_recursive_cte" ->
      """WITH RECURSIVE chain(node, cur, depth, path_sum) AS (
        |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT), p_partkey
        |  FROM part
        |  UNION ALL
        |  SELECT node, cur // 2, depth + 1, path_sum + cur // 2
        |  FROM chain WHERE cur > 1)
        |SELECT node AS p, MAX(depth) AS depth, MAX(path_sum) AS path_sum
        |FROM chain GROUP BY node ORDER BY p""".stripMargin,
    "q46_rolling_distinct" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |daily AS (SELECT d AS day, COUNT(DISTINCT user_id) AS dau
        |          FROM ud GROUP BY 1),
        |c AS (SELECT user_id, d + CAST(g.i AS INT) AS day
        |      FROM ud, LATERAL (SELECT unnest(range(0, 7)) AS i) g),
        |w AS (SELECT day, COUNT(DISTINCT user_id) AS wau7 FROM c GROUP BY 1)
        |SELECT day, dau, wau7,
        |  ROUND(dau / CAST(wau7 AS DOUBLE), 4) AS stickiness
        |FROM daily JOIN w USING (day) ORDER BY day""".stripMargin,
    "q45_histogram" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT bucket, CAST(bucket * 5000.0 AS DOUBLE) AS bucket_lo, n,
        |  CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
        |  ROUND(n / CAST(SUM(n) OVER () AS DOUBLE), 4) AS share
        |FROM b ORDER BY bucket""".stripMargin,
    // Same 16+16-bit Morton interleave spelled as shift/mask arithmetic
    // (generated term list — 16 terms per dimension), same integer-div
    // grid scaling, so the z-cells match bit-for-bit.
    "q42_zorder" -> {
      val terms = (0 until 16).map(i =>
        s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH s AS (SELECT MAX(l_partkey) AS mpk, MAX(l_suppkey) AS msk FROM lineitem),
         |g AS (SELECT l_partkey AS pk, l_suppkey AS sk,
         |        (l_partkey * 65536) // (mpk + 1) AS x,
         |        (l_suppkey * 65536) // (msk + 1) AS y
         |      FROM lineitem, s),
         |b AS (SELECT pk, sk, ($terms) >> 27 AS bucket FROM g)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  MIN(pk) AS min_pk, MAX(pk) AS max_pk,
         |  MIN(sk) AS min_sk, MAX(sk) AS max_sk
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "q35_array_functions" ->
      """SELECT doc_id,
        |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',') AS first5,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(COALESCE(list_position(string_split(text, ' '), 'the'), 0) AS BIGINT) AS pos_the,
        |  string_split(text, ' ')[1] AS head_tok,
        |  string_split(text, ' ')[-1] AS tail_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_string_agg" ->
      """SELECT lang,
        |  array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'customer_name_null' AS rule, COUNT(*) AS violations
        |  FROM customer WHERE c_name IS NULL
        |  UNION ALL
        |  SELECT 'order_price_nonpositive', COUNT(*)
        |  FROM orders WHERE o_totalprice <= 0
        |  UNION ALL
        |  SELECT 'order_customer_fk', COUNT(*)
        |  FROM orders WHERE NOT EXISTS
        |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |  UNION ALL
        |  SELECT 'lineitem_pk_dup', COUNT(*) FROM (
        |    SELECT l_orderkey, l_linenumber FROM lineitem
        |    GROUP BY 1, 2 HAVING COUNT(*) > 1)
        |  UNION ALL
        |  SELECT 'doc_token_floor', COUNT(*)
        |  FROM documents WHERE len(string_split(text, ' ')) < 5
        |) ORDER BY rule""".stripMargin,
    "dq_embeddings" ->
      """WITH e AS (SELECT label,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |n AS (SELECT label, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e)
        |SELECT label,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN len(emb) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
        |  CAST(SUM(CASE WHEN len(list_filter(emb,
        |       x -> isnan(x) OR isinf(x))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
        |  CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  ROUND(MIN(nrm), 4) AS min_norm,
        |  ROUND(MAX(nrm), 4) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "dq_outliers" ->
      """WITH s AS (
        |  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd,
        |    COUNT(*) AS n
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, CAST(s.n AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN s.sd > 0 AND abs(e.value - s.mu) > 3 * s.sd
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  ROUND(SUM(CASE WHEN s.sd > 0 AND abs(e.value - s.mu) > 3 * s.sd
        |       THEN 1 ELSE 0 END) / CAST(s.n AS DOUBLE), 6) AS outlier_frac
        |FROM events e JOIN s USING (event_type)
        |GROUP BY e.event_type, s.n ORDER BY e.event_type""".stripMargin,
    "q34_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
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
    "q32b_range_multibucket" ->
      """WITH w AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start
        |  FROM events WHERE event_type = 'error')
        |SELECT win_start, COUNT(*) AS n_events
        |FROM events e JOIN w
        |  ON e.ts >= w.win_start AND e.ts < w.win_start + INTERVAL 3 DAY
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
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
    "q33_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
        |         ROUND(SUM(value), 2) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx
        |      FROM hourly GROUP BY 1),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
        |  FROM b),
        |j AS (
        |  SELECT s.event_type, s.hr, h.v
        |  FROM spine s LEFT JOIN hourly h
        |    ON s.event_type = h.event_type AND s.hr = h.hr)
        |SELECT event_type, hr,
        |  ROUND(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY hr ROWS UNBOUNDED PRECEDING), 2) AS v_filled,
        |  CAST(v IS NULL AS INT) AS was_gap
        |FROM j ORDER BY event_type, hr""".stripMargin,
    "a16_scd2_merge" ->
      """WITH c AS (
        |  SELECT c_custkey AS key, ROUND(c_acctbal, 2) AS bal, c_mktsegment AS seg
        |  FROM customer),
        |cur AS (
        |  SELECT key, bal, seg, '2024-01-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM c WHERE key <= 1200),
        |closed AS (
        |  SELECT key, ROUND(bal - 50, 2) AS bal, seg, '2023-01-01' AS valid_from,
        |         '2024-01-01' AS valid_to, 0 AS is_current
        |  FROM c WHERE key <= 1200 AND key % 100 = 0),
        |stage AS (
        |  SELECT key,
        |         CASE WHEN key % 3 = 0 THEN ROUND(bal + 100, 2) ELSE bal END AS bal,
        |         seg
        |  FROM c WHERE key > 100),
        |j AS (
        |  SELECT e.key AS ekey, e.bal AS ebal, e.seg AS eseg,
        |         e.valid_from AS evf, e.valid_to AS evt,
        |         s.key AS skey, s.bal AS sbal, s.seg AS sseg
        |  FROM cur e FULL OUTER JOIN stage s ON e.key = s.key),
        |kept AS (
        |  SELECT ekey AS key, ebal AS bal, eseg AS seg, evf AS valid_from,
        |    CASE WHEN skey IS NOT NULL
        |              AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)
        |         THEN '2024-06-01' ELSE evt END AS valid_to,
        |    CASE WHEN skey IS NOT NULL
        |              AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)
        |         THEN 0 ELSE 1 END AS is_current
        |  FROM j WHERE ekey IS NOT NULL),
        |opened AS (
        |  SELECT skey AS key, sbal AS bal, sseg AS seg, '2024-06-01' AS valid_from,
        |         CAST(NULL AS VARCHAR) AS valid_to, 1 AS is_current
        |  FROM j WHERE ekey IS NULL
        |     OR (skey IS NOT NULL
        |         AND (ebal IS DISTINCT FROM sbal OR eseg IS DISTINCT FROM sseg)))
        |SELECT * FROM closed
        |UNION ALL SELECT * FROM kept
        |UNION ALL SELECT * FROM opened
        |ORDER BY key, valid_from, is_current""".stripMargin,
    // layout-invariant: the day aggregate from the raw (unpartitioned) table
    "a20_partition_pruning" ->
      """SELECT event_type, COUNT(*) AS c, ROUND(SUM(value), 2) AS v
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-02'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a21_jdbc_publish" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a23_backfill" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        |  CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS v
        |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin,
    "a22_cdc_merge" ->
      """WITH e AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |             ROUND(o_totalprice, 2) AS p
        |           FROM orders WHERE o_orderkey % 2 = 0),
        |c AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |        ROUND(o_totalprice + 10, 2) AS p,
        |        CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op
        |      FROM orders WHERE o_orderkey % 3 <> 2)
        |SELECT CASE WHEN c.op IS NOT NULL THEN c.k ELSE e.k END AS k,
        |  CASE WHEN c.op IS NOT NULL THEN c.st ELSE e.st END AS st,
        |  CASE WHEN c.op IS NOT NULL THEN c.p ELSE e.p END AS p
        |FROM e FULL OUTER JOIN c ON e.k = c.k
        |WHERE c.op IS NULL OR c.op <> 'D'
        |ORDER BY k""".stripMargin,
    // rows that predate the new `pri` column carry NULL for it
    "a19_schema_evolution" ->
      """SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p,
        |       s.pri AS pri
        |FROM (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice + 1000, 2) AS p
        |      FROM orders WHERE o_orderkey % 2 = 0) e
        |FULL OUTER JOIN
        |     (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice, 2) AS p,
        |             o_orderpriority AS pri
        |      FROM orders WHERE o_orderkey % 3 = 0) s
        |  ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    // same merge semantics as a10 — bucketed-layout execution, identical result
    "a18_bucketed_merge" ->
      """SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS k,
        |       COALESCE(s.st, e.st) AS st, COALESCE(s.p, e.p) AS p
        |FROM (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice + 1000, 2) AS p
        |      FROM orders WHERE o_orderkey % 2 = 0) e
        |FULL OUTER JOIN
        |     (SELECT o_orderkey, o_orderstatus AS st, ROUND(o_totalprice, 2) AS p
        |      FROM orders WHERE o_orderkey % 3 = 0) s
        |  ON e.o_orderkey = s.o_orderkey
        |ORDER BY k""".stripMargin,
    "q37_range_frame" ->
      """WITH e AS (SELECT event_id, user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
        |SELECT event_id, user_id, es,
        |  COUNT(*) OVER w AS n_1h,
        |  ROUND(SUM(value) OVER w, 2) AS v_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q39_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q13c_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g1,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g2,
        |  COUNT(*) AS c, ROUND(SUM(o_totalprice), 2) AS rev
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q40_stats_agg" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    ROUND(MEDIAN(l_quantity), 4) AS med_qty,
        |    ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_price,
        |    ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        |    ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty,
        |    CAST(COUNT(*) AS BIGINT) AS mode_n,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY COUNT(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT s.l_returnflag, s.med_qty, m.mode_qty, m.mode_n,
        |  s.sd_price, s.var_qty, s.corr_qty_price
        |FROM s JOIN m ON s.l_returnflag = m.l_returnflag AND m.rn = 1
        |ORDER BY s.l_returnflag""".stripMargin,
    "q38_frame_stats" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(SUM(cents) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
        |    / (COUNT(*) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)) / 100.0 AS ma3,
        |  ROUND(percent_rank() OVER w, 4) AS pr,
        |  ROUND(cume_dist() OVER w, 4) AS cd
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
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
    "dq_drift" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |b AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |c AS (SELECT event_id,
        |    CASE WHEN event_type = 'click' THEN 'tap' ELSE event_type END AS event_type,
        |    value * 1.5 AS value
        |  FROM ev WHERE event_id % 2 = 1),
        |bc AS (SELECT event_type AS k, COUNT(*) AS n FROM b GROUP BY 1),
        |cc AS (SELECT event_type AS k, COUNT(*) AS n FROM c GROUP BY 1),
        |bt AS (SELECT SUM(n) AS tot FROM bc),
        |ct AS (SELECT SUM(n) AS tot FROM cc),
        |cat AS (
        |  SELECT 'event_type_psi' AS metric,
        |    ROUND(SUM((pc - pb) * ln(pc / pb)), 6) AS psi,
        |    CAST(MAX(nb) AS BIGINT) AS n_base, CAST(MAX(nc) AS BIGINT) AS n_curr
        |  FROM (
        |    SELECT GREATEST(COALESCE(bc.n / bt.tot, 0), 1e-6) AS pb,
        |           GREATEST(COALESCE(cc.n / ct.tot, 0), 1e-6) AS pc,
        |           bt.tot AS nb, ct.tot AS nc
        |    FROM bc FULL OUTER JOIN cc ON bc.k = cc.k, bt, ct)),
        |st AS (SELECT MIN(value) AS lo,
        |         GREATEST(MAX(value) - MIN(value), 1e-12) AS range FROM b),
        |bb AS (SELECT CAST(LEAST(GREATEST(FLOOR((value - st.lo) / st.range * 10), 0), 9)
        |         AS BIGINT) AS k, COUNT(*) AS n
        |  FROM b, st GROUP BY 1),
        |cb AS (SELECT CAST(LEAST(GREATEST(FLOOR((value - st.lo) / st.range * 10), 0), 9)
        |         AS BIGINT) AS k, COUNT(*) AS n
        |  FROM c, st GROUP BY 1),
        |bbt AS (SELECT SUM(n) AS tot FROM bb),
        |cbt AS (SELECT SUM(n) AS tot FROM cb),
        |num AS (
        |  SELECT 'value_psi' AS metric,
        |    ROUND(SUM((pc - pb) * ln(pc / pb)), 6) AS psi,
        |    CAST(MAX(nb) AS BIGINT) AS n_base, CAST(MAX(nc) AS BIGINT) AS n_curr
        |  FROM (
        |    SELECT GREATEST(COALESCE(bb.n / bbt.tot, 0), 1e-6) AS pb,
        |           GREATEST(COALESCE(cb.n / cbt.tot, 0), 1e-6) AS pc,
        |           bbt.tot AS nb, cbt.tot AS nc
        |    FROM bb FULL OUTER JOIN cb ON bb.k = cb.k, bbt, cbt))
        |SELECT * FROM cat UNION ALL SELECT * FROM num ORDER BY metric""".stripMargin,
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
    "mm_binary_dedup" ->
      """SELECT md5(text) AS content_md5, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_copies,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // Same base-31 polynomial cut rule over the trailing 4 bytes, same
    // prefix-sum chunk ids, same ordered reassembly + md5 — chunking and
    // overlap recomputed fully.
    "mm_cdc_chunking" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |corpus AS (SELECT doc_id, text FROM base
        |           UNION ALL SELECT doc_id + 1000000, 'XY ' || text FROM base),
        |d AS (SELECT doc_id, hex(encode(text)) AS hx,
        |        list_transform(range(1, CAST(octet_length(encode(text)) AS BIGINT) + 1),
        |          p -> ('0x' || substr(hex(encode(text)),
        |            CAST((p - 1) * 2 + 1 AS BIGINT), 2))::BIGINT) AS bv
        |      FROM corpus),
        |b AS (SELECT doc_id, g.p AS p,
        |        substr(hx, CAST((g.p - 1) * 2 + 1 AS BIGINT), 2) AS hp,
        |        CASE WHEN g.p >= 4 AND
        |          (bv[CAST(g.p - 3 AS BIGINT)] * 29791
        |           + bv[CAST(g.p - 2 AS BIGINT)] * 961
        |           + bv[CAST(g.p - 1 AS BIGINT)] * 31
        |           + bv[CAST(g.p AS BIGINT)]) % 16 = 0
        |        THEN 1 ELSE 0 END AS cut
        |      FROM d, LATERAL (SELECT unnest(range(1,
        |        CAST(len(hx) / 2 AS BIGINT) + 1)) AS p) g),
        |c AS (SELECT doc_id, p, hp,
        |        COALESCE(SUM(cut) OVER (PARTITION BY doc_id ORDER BY p
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
        |      FROM b),
        |ch AS (SELECT doc_id, cid, md5(string_agg(hp, '' ORDER BY p)) AS h
        |       FROM c GROUP BY doc_id, cid),
        |o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks_orig,
        |        CAST(COUNT(DISTINCT h) AS BIGINT) AS nd_orig
        |      FROM ch WHERE doc_id < 1000000 GROUP BY doc_id),
        |oh AS (SELECT DISTINCT doc_id, h FROM ch WHERE doc_id < 1000000),
        |sh AS (SELECT DISTINCT doc_id - 1000000 AS doc_id, h
        |       FROM ch WHERE doc_id >= 1000000),
        |sn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd_shift
        |       FROM sh GROUP BY doc_id),
        |sj AS (SELECT oh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        |       FROM oh JOIN sh ON oh.doc_id = sh.doc_id AND oh.h = sh.h
        |       GROUP BY oh.doc_id)
        |SELECT o.doc_id, n_chunks_orig, nd_orig, nd_shift,
        |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
        |  ROUND(COALESCE(n_shared, 0) / CAST(nd_orig AS DOUBLE), 4) AS resync_ratio
        |FROM o JOIN sn ON o.doc_id = sn.doc_id
        |LEFT JOIN sj ON o.doc_id = sj.doc_id
        |ORDER BY o.doc_id""".stripMargin,
    // DCT pHash over REAL decoded pixels: the engine parses actual P6
    // bytes, the oracle replays the integer signature pipeline from the
    // generator formula — same nearest-sample 32x32 luma grid, same
    // mean-centering, the SAME fixed-point cosine table (interpolated
    // from Multimodal.DctT), same 63*F > sumAC threshold, same 4x16-bit
    // banding + exact-hamming verify.
    "mm_phash_neardup" -> phashDctOracleSql(deltaInvolving = false),
    // The delta-involving subset of the mm_phash_neardup pair class
    // (the greater id of any such pair is a delta doc): the engine only
    // DECODES the delta and reads the persisted lake signature artifact;
    // the oracle recomputes both sides from the generator formula.
    "mm_incremental_phash" -> phashDctOracleSql(deltaInvolving = true),
    // Robustness contrast under a smooth luminance gradient: both
    // integer hash pipelines replayed bit-for-bit; recall per method.
    "mm_phash_recall" -> phashRecallOracleSql,
    "a27_orc_roundtrip" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev,
        |  CAST(COUNT(o_orderpriority) AS BIGINT) AS n_prio,
        |  CAST(MIN(o_orderdate) AS DATE) AS min_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // 7 malformed lines injected by construction; good-row count and the
    // content aggregate recompute from the original table.
    "a29_corrupt_records" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
        |  CAST(7 AS BIGINT) AS n_corrupt,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents""".stripMargin,
    // a49: the same content truth through the gzip-compressed leg — the
    // decompression path must be byte-lossless to match
    "a49_gzip_jsonl" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    // Recomputed from the ORIGINAL parquet — any JSON escape/unescape
    // mutation of any text flips the group's XOR-folded portable hash.
    "a28_jsonl_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(bit_xor(('0x' || substr(md5(text), 1, 15))::BIGINT) AS BIGINT)
        |    AS content_xor
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
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
    // unigram-LM tokenizer: the two-round lattice recurrence unrolled as
    // 10-step DP CTE chains per round (TextAnalysis.unigramOracleSql)
    "text_unigram_lm" -> operators.TextAnalysis.unigramOracleSql(),
    // the trained segmentation joined back over every document's tokens
    "text_unigram_encode" ->
      operators.TextAnalysis.unigramEncodeOracleSql(),
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
    "a25_manifest" ->
      """SELECT 'customer' AS table_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_name,
        |  CAST(bit_xor(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT)
        |    AS BIGINT) AS key_checksum
        |FROM customer""".stripMargin,
    "a24_compaction" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(o_totalprice), 2) AS rev
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
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
    // Additive evolution replayed: day-1 keys carry NULL in the column
    // the source gained on day 2; the regenerated schema doc is the A5/A6
    // map over the evolved catalog.
    "a32_schema_evolution" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey > 2000 THEN c_mktsegment END AS c_mktsegment,
        |  '[{"name": "c_custkey", "type": "INTEGER", "mode": "NULLABLE"}, {"name": "c_name", "type": "STRING", "mode": "NULLABLE"}, {"name": "c_mktsegment", "type": "STRING", "mode": "NULLABLE"}]'
        |    AS schema_json
        |FROM customer WHERE c_custkey <= 4000
        |ORDER BY c_custkey""".stripMargin,
    // The refusal-side truth table: verdicts from the reference's 5-type
    // warehouse system; two non-STRING label changes are incompatible
    // (loud refusal), STRING relaxation is the "fix it later" widening.
    "a33_schema_conflict" ->
      """SELECT * FROM (VALUES
        |  ('balance', 'FLOAT', 'INTEGER', 'incompatible', false),
        |  ('born', 'DATETIME', 'STRING', 'widened', false),
        |  ('email', '', 'STRING', 'added', false),
        |  ('id', 'INTEGER', 'INTEGER', 'unchanged', false),
        |  ('legacy_code', 'INTEGER', '', 'removed', false),
        |  ('name', 'STRING', 'STRING', 'unchanged', false),
        |  ('ratio', 'FLOAT', 'FLOAT', 'unchanged', false),
        |  ('start_date', 'DATE', 'DATETIME', 'incompatible', false)
        |) AS t(col_name, old_type, new_type, verdict, table_compatible)
        |ORDER BY col_name""".stripMargin,
    // a34-a36: the A1/A2/A4 scans through the live PostgreSQL-wire
    // listener; the data is bit-identical to the embedded legs (same
    // customer rows loaded THROUGH the socket), so the oracles are the
    // plain-parquet truths.
    "a34_pgwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a35_pgwire_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // catalog truth for the wire-created table: VARCHAR columns (the
    // embedded a04 table stores strings as CLOB via Spark's Derby
    // dialect; the wire DDL declares VARCHAR explicitly)
    "a36_pgwire_catalog" ->
      """SELECT * FROM (VALUES
        |  ('c_custkey', 'BIGINT', 'INTEGER', CAST(1 AS BIGINT)),
        |  ('c_name', 'VARCHAR(64)', 'STRING', 2),
        |  ('c_nationkey', 'INTEGER', 'INTEGER', 3),
        |  ('c_acctbal', 'DOUBLE', 'FLOAT', 4),
        |  ('c_mktsegment', 'VARCHAR(16)', 'STRING', 5)
        |) AS t(col_name, data_type, bq_type, pos) ORDER BY pos""".stripMargin,
    // a45-a47: the same scans through the live MYSQL-wire listener (the
    // reference's primary source protocol); data is loaded THROUGH the
    // socket, so the oracles are the plain-parquet truths again.
    "a45_mysqlwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a46_mysqlwire_partitioned" ->
      """SELECT c_nationkey, COUNT(*) AS n, ROUND(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // a50/a52: the pushdown scan with EVERY byte (DDL, batched load,
    // WHERE, streamed rows) inside the TLS-upgraded wire session — the
    // data is still bit-identical to the plain-parquet truth; only the
    // transport changed, and a handshake/framing mistake loses rows.
    "a50_pgwire_tls" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    // a51/a51b: the pushdown scan and the MSSQL value quirks through the
    // live TDS socket (three-part [db].[dbo].[table] naming, binary-typed
    // row tokens) — data loaded THROUGH the socket, truths recomputed
    // from parquet / literal fixtures.
    "a51_mssqlwire_pushdown" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    "a51b_mssqlwire_quirks" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 1, '922337203685477.5807', '214748.3647',
        |   '2024-05-01 10:30:00.123456', 'naïve café', 255),
        |  (2, 0, '-0.0001', NULL, '1999-12-31 23:59:59', NULL, -7),
        |  (3, NULL, NULL, '0.5000', NULL, 'plain', NULL)
        |) AS t(id, active_int, balance_str, tip_str, created_str, title,
        |       qty) ORDER BY id""".stripMargin,
    "a52_mysqlwire_tls" ->
      """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM customer
        |WHERE c_acctbal > 5000 ORDER BY c_custkey""".stripMargin,
    // a47: the MySQL value quirks over the live socket — tinyint(1) kept
    // integral, DECIMAL(20,0) carries 2^64-1 exactly, zero-date → NULL
    "a47_mysqlwire_quirks" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 1, '18446744073709551615', DATE '2024-03-15'),
        |  (2, 0, '0', NULL),
        |  (3, 1, '9223372036854775808', NULL)
        |) AS t(id, flag_int, big_str, last_seen) ORDER BY id""".stripMargin,
    // Bus round-trip truth: every document exactly once, partitioned by
    // doc_id mod 4, payload = text length — loss/dup/corruption across
    // the produce+stream network hops changes the row set.
    // a48: the same round-trip truth over the Kafka wire protocol — the
    // produce+fetch hops change, the reconciled row set must not
    "a48_kafka_roundtrip" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS bus_partition,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a37_bus_roundtrip" ->
      """SELECT doc_id, CAST(doc_id % 4 AS INT) AS bus_partition,
        |  CAST(length(text) AS BIGINT) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // warehouse truth after the multi-batch bus sync: the one-shot batch
    // aggregate — any lost/duplicated micro-batch merge changes a count
    "a38_bus_sync" ->
      """SELECT 's' || CAST(doc_id % 10 AS VARCHAR) AS key,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(length(text)) AS BIGINT) AS total
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Point-in-time semantics replayed: each event joins the dimension
    // version whose validity range covers its event date.
    "a31_scd2_lookup" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |dim AS (
        |  SELECT user_id, DATE '2023-01-01' AS valid_from,
        |         DATE '2024-01-15' AS valid_to,
        |         'S' || CAST(user_id % 3 AS VARCHAR) AS seg FROM u
        |  UNION ALL
        |  SELECT user_id, DATE '2024-01-15', NULL,
        |         'S' || CAST(user_id % 5 AS VARCHAR) FROM u)
        |SELECT dim.seg, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(e.value), 2) AS total_value
        |FROM events e JOIN dim ON e.user_id = dim.user_id
        |  AND CAST(e.ts AS DATE) >= dim.valid_from
        |  AND (dim.valid_to IS NULL OR CAST(e.ts AS DATE) < dim.valid_to)
        |GROUP BY dim.seg ORDER BY dim.seg""".stripMargin,
    // delta-sync ≡ full-sync: the published table after (snapshot run +
    // high-watermark incremental run) must equal one full export
    "a17_incremental_sync" ->
      """SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS p
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // The published table after (lake sync + signature artifact + delta
    // run deduped against the artifact) must equal: union corpus minus
    // delta docs holding a verified Jaccard >= 0.5 pair (the
    // dedup_incremental_lsh pair CTE — its green row proves banding
    // loses nothing at this threshold — with the drop rule replayed).
    "a30_incremental_dedup_sync" ->
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
        |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |drops AS (
        |  SELECT DISTINCT b AS doc_id
        |  FROM inter JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
        |  WHERE c / CAST(na.n + nb.n - c AS DOUBLE) >= 0.5 AND b >= 1000000)
        |SELECT doc_id, md5(text) AS fp FROM corpus
        |WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |ORDER BY doc_id""".stripMargin,
    // Same byte stream, same mean-centering (32·b − Σb, DC cancels),
    // the SAME interpolated cosine table — every coefficient reproduces.
    "mm_frame_dct" ->
      s"""WITH m AS (
         |  SELECT doc_id, encode(text) AS data,
         |    octet_length(encode(text)) AS n
         |  FROM documents WHERE octet_length(encode(text)) >= 32),
         |fr AS (
         |  SELECT doc_id, data,
         |    unnest(range(0, CAST(floor((n - 32) / 32) AS INT) + 1)) AS fi
         |  FROM m),
         |b AS (
         |  SELECT doc_id, fi, g.i - 1 AS x,
         |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT
         |      AS bv
         |  FROM fr, LATERAL (SELECT unnest(range(1, 33)) AS i) g),
         |c AS (SELECT doc_id, fi, SUM(bv) AS fsum FROM b GROUP BY 1, 2),
         |dct AS (SELECT * FROM (VALUES ${operators.Multimodal.dctTableSql})
         |  v(u, x, t)),
         |co AS (SELECT b.doc_id, b.fi, d.u,
         |    SUM(d.t * (32 * b.bv - c.fsum)) AS coeff
         |  FROM b JOIN c USING (doc_id, fi)
         |  JOIN dct d ON d.x = b.x AND d.u >= 1
         |  GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
         |  string_agg(CAST(coeff AS VARCHAR), ',' ORDER BY u) AS spec_csv
         |FROM co GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_audio_frames" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |fr AS (
        |  SELECT doc_id, data,
        |    unnest(range(0, CAST(floor((n - 64) / 32) AS INT) + 1)) AS fi
        |  FROM m),
        |b AS (
        |  SELECT doc_id, fi,
        |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT AS bv
        |  FROM fr, LATERAL (SELECT unnest(range(1, 65)) AS i) g)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(fi * 32 AS BIGINT) AS f_start,
        |  CAST(SUM(bv) AS BIGINT) AS energy, CAST(MAX(bv) AS BIGINT) AS peak
        |FROM b GROUP BY doc_id, fi ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_scene_detect" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) >= 64),
        |f0 AS (
        |  SELECT doc_id, data,
        |    unnest(range(0, CAST(floor((n - 64) / 32) AS INT) + 1)) AS fi
        |  FROM m),
        |b AS (
        |  SELECT doc_id, fi,
        |    ('0x' || substr(hex(data), 2 * (fi * 32 + g.i) - 1, 2))::BIGINT AS bv
        |  FROM f0, LATERAL (SELECT unnest(range(1, 65)) AS i) g),
        |fr AS (SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        |         CAST(SUM(bv) AS BIGINT) AS energy
        |       FROM b GROUP BY doc_id, fi),
        |lg AS (SELECT doc_id, frame_idx, energy,
        |         LAG(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_e
        |       FROM fr)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN prev_e IS NULL OR abs(energy - prev_e) > 300
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_scenes,
        |  CAST(MAX(abs(energy - COALESCE(prev_e, energy))) AS BIGINT) AS max_jump
        |FROM lg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
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
    // The engine PARSES real P6 bytes partition-wise; the oracle
    // recomputes the closed-form generator (w = id%13+8, h = id%11+8,
    // pixel byte i = (id*31 + i*17 + (id*i mod 251) + 40*((i div 3w)
    // mod 6)) % 256) — a green row proves the parsed geometry and the
    // decoded pixel features match the bytes' actual content.
    "mm_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, g.i % 4 AS j,
        |    SUM((doc_id * 31 + g.i * 17 + (doc_id * g.i) % 251
        |         + 40 * ((g.i // (w * 3)) % 6)) % 256) AS fv
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS i) g
        |  GROUP BY doc_id, g.i % 4)
        |SELECT d.doc_id,
        |  CAST(d.w AS INT) AS width,
        |  CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  (SELECT string_agg(CAST(fv AS BIGINT), ',' ORDER BY j) FROM f
        |   WHERE f.doc_id = d.doc_id) AS features_csv
        |FROM d ORDER BY d.doc_id""".stripMargin,
    // BMP leg: geometry from the little-endian header, luminance total
    // over the padded bottom-up BGR pixel walk — the oracle recomputes
    // from the generator (byte i of the pixel area is data when
    // i mod rowStride < 3w, value (id*37 + i*13) % 256, else padding;
    // BGR weight by in-row byte position; bottom-up order is
    // irrelevant to a SUM, stride and channel order are not).
    "mm_bmp_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(doc_id % 9 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 7 + 8 AS BIGINT) AS h,
        |    ((doc_id % 9 + 8) * 3 + 3) // 4 * 4 AS rs
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE (g.i % rs) % 3 WHEN 0 THEN 114 WHEN 1 THEN 587
        |          ELSE 299 END) *
        |    ((doc_id * 37 + g.i * 13) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, rs * h)) AS i) g
        |  WHERE g.i % rs < w * 3
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // PNG leg: the oracle sums the closed-form RAW pixel formula — the
    // engine only reproduces it by concatenating IDAT framing, inflating
    // the stored-block zlib stream, and reversing the Sub/Up row filters.
    // the oracle replays the closed-form index stream through the
    // closed-form palette; the engine must LZW-decode to match
    "mm_gif_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 8 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT d.doc_id,
        |    (d.seed * 29 + g.i * 23 + (d.seed * g.i) % 127) % 128 AS j
        |  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS i) g),
        |l AS (SELECT doc_id, SUM(
        |    299 * ((j * 2 + 5) % 256) + 587 * ((j * 7 + 11) % 256)
        |    + 114 * ((j * 13 + 17) % 256)) AS lum_total
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // animated GIF: per-frame COMPOSITED screen luminance — the oracle's
    // per-pixel CASE picks the latest covering frame (frame 2's
    // transparent index 13 falls through to the underlying composite);
    // the engine must LZW-decode all three frames and composite them
    "mm_gif_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 10 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 10 AS BIGINT) AS h
        |  FROM documents),
        |px AS (SELECT doc_id, seed, w, h, k.k AS frame_idx,
        |    g.p % w AS x, g.p // w AS y, g.p AS p
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, w * h)) AS p) g,
        |    LATERAL (SELECT unnest(range(0, 3)) AS k) k),
        |eff AS (SELECT doc_id, frame_idx, w, h,
        |    CASE
        |      WHEN frame_idx >= 2 AND x >= 1 AND x < w - 1
        |        AND y >= 1 AND y < 5
        |        AND (seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3)
        |          % 128 <> 13
        |      THEN (seed * 37 + ((y - 1) * (w - 2) + (x - 1)) * 17 + 3) % 128
        |      WHEN frame_idx >= 1 AND x >= 2 AND x < w - 2
        |        AND y >= 3 AND y < h - 2
        |      THEN (seed * 31 + ((y - 3) * (w - 4) + (x - 2)) * 19 + 7) % 128
        |      ELSE (seed * 29 + p * 23) % 128
        |    END AS j
        |  FROM px),
        |l AS (SELECT doc_id, frame_idx, w, h,
        |    SUM(299 * ((j * 2 + 5) % 256) + 587 * ((j * 7 + 11) % 256)
        |      + 114 * ((j * 13 + 17) % 256)) AS lum_total
        |  FROM eff GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(CASE frame_idx WHEN 0 THEN 10 WHEN 1 THEN 20 ELSE 30 END
        |    AS INT) AS delay_cs,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(lum_total AS BIGINT) AS lum_total
        |FROM l ORDER BY doc_id, frame_idx""".stripMargin,
    // scene cuts over REAL decoded GIF frames: gray-ramp palette makes
    // per-frame luminance n_px·2000·idx exactly; the lag rule flags the
    // guaranteed >=75-slot jump at frame 3 and nothing else
    "mm_gif_scene" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 5 + 10 AS BIGINT) AS w,
        |    CAST(doc_id % 4 + 10 AS BIGINT) AS h
        |  FROM documents),
        |f AS (SELECT doc_id, w * h AS n_px, k.k AS frame_idx,
        |    (CASE WHEN k.k < 3 THEN 8 + seed % 6
        |          ELSE 88 + seed % 6 END + k.k) AS idx
        |  FROM d, LATERAL (SELECT unnest(range(0, 6)) AS k) k),
        |g AS (SELECT doc_id, frame_idx, n_px,
        |    n_px * 2000 * idx AS lum_total,
        |    COALESCE(n_px * 2000 * idx - LAG(n_px * 2000 * idx) OVER
        |      (PARTITION BY doc_id ORDER BY frame_idx), 0) AS lum_diff
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(lum_total AS BIGINT) AS lum_total,
        |  CAST(lum_diff AS BIGINT) AS lum_diff,
        |  (abs(lum_diff) > 40 * 2000 * n_px) AS is_cut
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    // gray-8 TIFF through real MSB-first/early-change LZW; the oracle
    // sums the closed-form pixel bytes (1000x gray luminance)
    "mm_tiff_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST((doc_id % 3 + 2) * 4 AS BIGINT) AS w,
        |    CAST(doc_id % 5 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 *
        |    ((seed * 19 + g.i * 31 + (seed * g.i) % 251) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, d.w * d.h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "mm_png_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(
        |    (CASE g.b % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END) *
        |    ((seed * 31 + g.b * 17 + (seed * g.b) % 251
        |      + 40 * ((g.b // (w * 3)) % 6)) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h * 3)) AS b) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Baseline-JPEG grayscale leg: per-8×8-block-constant fixtures decode
    // EXACTLY (DC-only blocks survive quant(1)/integer-IDCT bit-for-bit),
    // so the oracle sums the closed-form block values; the engine only
    // reproduces it via real huffman + differential-DC + IDCT + crop.
    // Video (MJPEG-in-AVI) leg: 4 per-block-constant grayscale JPEG
    // frames per clip — value ((seed·7 + blk·29) mod 96) + f + 128·[f≥2],
    // 25 fps — with the scene-cut lag rule over the frame table; any
    // container-walk, alignment, per-frame JPEG or lag mistake changes
    // a row.
    "mm_video_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 13 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |fr AS (SELECT doc_id, seed, w, h, bw, CAST(fx.f AS INT) AS frame_idx
        |  FROM d, LATERAL (SELECT unnest(range(0, 4)) AS f) fx),
        |l AS (SELECT doc_id, frame_idx, MAX(w) AS w, MAX(h) AS h,
        |    SUM(1000 * (((seed * 7 +
        |        ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 29) % 96)
        |      + frame_idx + CASE WHEN frame_idx >= 2 THEN 128 ELSE 0 END))
        |      AS lum_total
        |  FROM fr, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id, frame_idx),
        |x AS (SELECT doc_id, frame_idx, w, h, lum_total,
        |    COALESCE(lum_total - LAG(lum_total) OVER
        |      (PARTITION BY doc_id ORDER BY frame_idx), 0) AS lum_diff
        |  FROM l)
        |SELECT doc_id, frame_idx, CAST(40 AS INT) AS frame_ms,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(lum_total AS BIGINT) AS lum_total,
        |  CAST(lum_diff AS BIGINT) AS lum_diff,
        |  (ABS(lum_diff) > 40000 * w * h) AS is_cut
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_jpeg_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 13 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 11 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 13 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 * ((seed * 7 +
        |      ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 29) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Progressive (SOF2) leg: the 7-scan successive-approximation file
    // decodes to the same per-block-constant closed form — the oracle is
    // the baseline shape with the progressive fixture's dims/values; the
    // engine can only reproduce it through the full Annex-G scan loop.
    "mm_jpeg_progressive" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 12 + 17 AS BIGINT) AS w,
        |    CAST(doc_id % 10 + 17 AS BIGINT) AS h,
        |    CAST((doc_id % 12 + 17 + 7) // 8 AS BIGINT) AS bw
        |  FROM documents),
        |l AS (SELECT doc_id, SUM(1000 * ((seed * 19 +
        |      ((g.i // (w * 8)) * bw + (g.i % w) // 8) * 31) % 256)) AS lum_total
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g
        |  GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(1 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // 4:2:0 color leg: per-MCU-constant chroma + per-block-constant luma
    // stay exact through subsampling/upsampling; the oracle applies the
    // SAME fixed-point BT.601 conversion (2^30 bias keeps every integer
    // division non-negative, so DuckDB // equals the JVM's >> 16).
    "mm_jpeg_color" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(doc_id % 17 + 20 AS BIGINT) AS w,
        |    CAST(doc_id % 13 + 20 AS BIGINT) AS h,
        |    CAST((doc_id % 17 + 20 + 15) // 16 AS BIGINT) AS mcx
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    (seed * 11 + ((g.i // (w * 8)) * 2 * mcx + (g.i % w) // 8) * 23)
        |      % 256 AS yy,
        |    (seed * 13 + ((g.i // (w * 16)) * mcx + (g.i % w) // 16) * 37)
        |      % 256 - 128 AS cbp,
        |    (seed * 17 + ((g.i // (w * 16)) * mcx + (g.i % w) // 16) * 41)
        |      % 256 - 128 AS crp
        |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS i) g),
        |l AS (SELECT doc_id, SUM(
        |    299 * least(255, greatest(0,
        |      yy + ((91881 * crp + 32768 + 1073741824) // 65536) - 16384)) +
        |    587 * least(255, greatest(0,
        |      yy - ((22554 * cbp + 46802 * crp + 32768 + 1073741824) // 65536)
        |         + 16384)) +
        |    114 * least(255, greatest(0,
        |      yy + ((116130 * cbp + 32768 + 1073741824) // 65536) - 16384))
        |    ) AS lum_total
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
        |  CAST(3 AS INT) AS channels, CAST(l.lum_total AS BIGINT) AS lum_total
        |FROM d JOIN l USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // WAV leg: the oracle recomputes the closed-form PCM16 sample stream;
    // the engine only reproduces it via the real RIFF chunk walk (odd
    // LIST chunk skipped word-aligned) + signed LE 16-bit decode.
    // FLAC leg: the SAME samples as mm_wav_decode round-tripped through
    // the reference FLAC encoder — lossless, so the WAV oracle is the
    // FLAC oracle verbatim (cross-format parity, the strongest pin).
    "mm_flac_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS n_frames
        |  FROM documents),
        |e AS (SELECT doc_id, SUM(s * s) AS energy, MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, ((seed * 13 + g.i * 29) % 65536) - 32768 AS s
        |        FROM d, LATERAL (SELECT unnest(range(0, n_frames * channels))
        |                         AS i) g)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |  CAST(e.energy AS BIGINT) AS energy, CAST(e.peak AS INT) AS peak
        |FROM d JOIN e USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "mm_wav_decode" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(8000 + 4000 * (doc_id % 3) AS INT) AS sample_rate,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS n_frames
        |  FROM documents),
        |e AS (SELECT doc_id, SUM(s * s) AS energy, MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, ((seed * 13 + g.i * 29) % 65536) - 32768 AS s
        |        FROM d, LATERAL (SELECT unnest(range(0, n_frames * channels))
        |                         AS i) g)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.channels, d.sample_rate, d.n_frames,
        |  CAST(e.energy AS BIGINT) AS energy, CAST(e.peak AS INT) AS peak
        |FROM d JOIN e USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // framing over DECODED channel-0 PCM: frame f covers per-channel
    // sample indices [f*32, f*32+64); interleaved word index = i*ch
    "mm_wav_frames" ->
      """WITH d AS (SELECT doc_id, doc_id AS seed,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
        |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
        |  FROM documents),
        |f AS (SELECT doc_id, g.f AS frame_id, seed, ch
        |  FROM d, LATERAL (SELECT unnest(range(0, (nf - 64) // 32 + 1)) AS f) g),
        |e AS (SELECT doc_id, frame_id, SUM(s * s) AS energy,
        |    MAX(abs(s)) AS peak
        |  FROM (SELECT doc_id, frame_id,
        |          ((seed * 13 + (frame_id * 32 + h.i) * ch * 29) % 65536)
        |            - 32768 AS s
        |        FROM f, LATERAL (SELECT unnest(range(0, 64)) AS i) h)
        |  GROUP BY doc_id, frame_id)
        |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
        |  CAST(energy AS BIGINT) AS energy, CAST(peak AS INT) AS peak
        |FROM e ORDER BY doc_id, frame_id""".stripMargin,
    // closed-form rotation probes: 90-deg CW sends old bottom-left to the
    // new top-left corner, the old first COLUMN to the new first row,
    // and leaves the luminance total invariant
    "mm_rotate90" -> {
      def f(i: String) =
        s"((seed * 31 + ($i) * 17 + (seed * ($i)) % 251" +
          s" + 40 * ((($i) // (w * 3)) % 6)) % 256)"
      def lum(p: String) =
        s"(299 * ${f(s"($p) * 3")} + 587 * ${f(s"($p) * 3 + 1")}" +
          s" + 114 * ${f(s"($p) * 3 + 2")})"
      s"""WITH d AS (SELECT doc_id, doc_id AS seed,
         |    CAST(doc_id % 13 + 8 AS BIGINT) AS w,
         |    CAST(doc_id % 11 + 8 AS BIGINT) AS h
         |  FROM documents),
         |tot AS (
         |  SELECT doc_id, SUM(${lum("g.p")}) AS lum_total
         |  FROM d, LATERAL (SELECT unnest(range(0, w * h)) AS p) g
         |  GROUP BY doc_id),
         |r0 AS (
         |  SELECT doc_id, SUM(${lum("g.q * w")}) AS row0
         |  FROM d, LATERAL (SELECT unnest(range(0, h)) AS q) g
         |  GROUP BY doc_id)
         |SELECT d.doc_id, CAST(d.h AS INT) AS width, CAST(d.w AS INT) AS height,
         |  CAST(tot.lum_total AS BIGINT) AS lum_total,
         |  CAST(${lum("(h - 1) * w")} AS BIGINT) AS tl,
         |  CAST(${lum("0")} AS BIGINT) AS tr,
         |  CAST(${lum("(h - 1) * w + (w - 1)")} AS BIGINT) AS bl,
         |  CAST(${lum("w - 1")} AS BIGINT) AS br,
         |  CAST(r0.row0 AS BIGINT) AS row0
         |FROM d JOIN tot USING (doc_id) JOIN r0 USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    // closed-form channel-0 samples against the engine's interpolated
    // fixed-point DFT basis (Wav.stftTableSql) — integer-exact powers
    "mm_stft_power" ->
      s"""WITH d AS (SELECT doc_id, doc_id AS seed,
         |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
         |    CAST(200 + doc_id % 50 AS BIGINT) AS nf
         |  FROM documents),
         |tbl(k, i, c, s) AS (VALUES ${graft.operators.Wav.stftTableSql}),
         |f AS (SELECT doc_id, g.f AS frame_id, seed, ch
         |  FROM d, LATERAL (SELECT unnest(range(0, (nf - 16) // 8 + 1)) AS f) g),
         |r AS (SELECT doc_id, frame_id, t.k,
         |    SUM((((seed * 13 + (frame_id * 8 + t.i) * ch * 29) % 65536)
         |      - 32768) * t.c) AS re,
         |    SUM((((seed * 13 + (frame_id * 8 + t.i) * ch * 29) % 65536)
         |      - 32768) * t.s) AS im
         |  FROM f, tbl t GROUP BY doc_id, frame_id, t.k),
         |p AS (SELECT doc_id, k AS bin, SUM(re * re + im * im) AS power,
         |    COUNT(*) AS n_frames
         |  FROM r GROUP BY doc_id, k)
         |SELECT doc_id, CAST(bin AS INT) AS bin, CAST(power AS BIGINT) AS power,
         |  CAST(n_frames AS BIGINT) AS n_frames
         |FROM p ORDER BY doc_id, bin""".stripMargin,
    "mm_resize" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 13 + 8 AS INT) AS width,
        |             CAST(doc_id % 11 + 8 AS INT) AS height FROM documents)
        |SELECT doc_id, width, height,
        |  CASE WHEN width * 224 <= height * 256
        |       THEN greatest(1, CAST(floor(width * 224 / height) AS INT))
        |       ELSE 256 END AS rw,
        |  CASE WHEN width * 224 <= height * 256
        |       THEN 224
        |       ELSE greatest(1, CAST(floor(height * 256 / width) AS INT)) END AS rh
        |FROM d ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, encode(text) AS data, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(floor((n - 1) / 7) + 1 AS BIGINT) AS n_samples,
        |  (SELECT string_agg(substr(hex(data), 2 * g.i - 1, 2), '' ORDER BY g.i)
        |   FROM (SELECT unnest(range(1, n + 1)) AS i) g
        |   WHERE (g.i - 1) % 7 = 0) AS sample_hex
        |FROM m ORDER BY doc_id""".stripMargin,
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
    "ml_kmeans" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cid, emb AS cemb FROM v WHERE vec_id < 4),
        |a1 AS (
        |  SELECT vec_id, emb, cid FROM (
        |    SELECT v.vec_id, v.emb, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |        (list_dot_product(v.emb, c.cemb)
        |         / (sqrt(list_dot_product(v.emb, v.emb))
        |            * sqrt(list_dot_product(c.cemb, c.cemb)))) DESC, c.cid) AS rn
        |    FROM v, c0 c) z WHERE rn = 1),
        |c1 AS (
        |  SELECT cid, list(av ORDER BY pos) AS cemb FROM (
        |    SELECT cid, g.i AS pos, ROUND(AVG(emb[g.i]), 6) AS av
        |    FROM a1, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY cid, g.i) z GROUP BY cid),
        |a2 AS (
        |  SELECT vec_id, emb, cid FROM (
        |    SELECT v.vec_id, v.emb, c.cid,
        |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
        |        (list_dot_product(v.emb, c.cemb)
        |         / (sqrt(list_dot_product(v.emb, v.emb))
        |            * sqrt(list_dot_product(c.cemb, c.cemb)))) DESC, c.cid) AS rn
        |    FROM v, c1 c) z WHERE rn = 1),
        |c2 AS (
        |  SELECT cid, list(av ORDER BY pos) AS cemb FROM (
        |    SELECT cid, g.i AS pos, ROUND(AVG(emb[g.i]), 6) AS av
        |    FROM a2, (SELECT unnest(range(1, 65)) AS i) g
        |    GROUP BY cid, g.i) z GROUP BY cid)
        |SELECT a.cid, COUNT(*) AS n_members,
        |  ROUND(AVG(list_dot_product(a.emb, c.cemb)
        |    / (sqrt(list_dot_product(a.emb, a.emb))
        |       * sqrt(list_dot_product(c.cemb, c.cemb)))), 4) AS avg_cos
        |FROM a2 a JOIN c2 c ON a.cid = c.cid
        |GROUP BY a.cid ORDER BY a.cid""".stripMargin,
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
    // Same degree-ordered orientation spelled in SQL: rank = d·2^20 + id,
    // acyclic, one apex per triangle — the join structure is the spec.
    // Multi-referenced CTEs are MATERIALIZED: the default inlining
    // re-expands the 4-table e0 join once per reference down the 7-CTE
    // chain (observed: 100+ GB / unbounded runtime at sf0.1; 0.1 s
    // materialized). quantile_cont matches Spark's exact `percentile`.
    "graph_triangles" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |und AS MATERIALIZED (
        |  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, SUM(w) AS w
        |  FROM e0 WHERE src != dst GROUP BY 1, 2),
        |kept AS MATERIALIZED (
        |  SELECT u, v FROM und, (SELECT quantile_cont(w, 0.7) AS q FROM und) qs
        |  WHERE w > q),
        |deg AS MATERIALIZED (
        |  SELECT n, COUNT(*) AS d FROM
        |    (SELECT u AS n FROM kept UNION ALL SELECT v FROM kept) x
        |  GROUP BY n),
        |rnk AS MATERIALIZED (SELECT n, d * 1048576 + n AS r FROM deg),
        |ori AS MATERIALIZED (
        |  SELECT CASE WHEN ru.r < rv.r THEN k.u ELSE k.v END AS a,
        |         CASE WHEN ru.r < rv.r THEN k.v ELSE k.u END AS b,
        |         GREATEST(ru.r, rv.r) AS rb
        |  FROM kept k JOIN rnk ru ON k.u = ru.n
        |              JOIN rnk rv ON k.v = rv.n),
        |w2 AS (SELECT e1.a AS apex, e1.b AS x, e2.b AS y
        |       FROM ori e1 JOIN ori e2
        |         ON e1.a = e2.a AND e1.rb < e2.rb),
        |tri AS MATERIALIZED (
        |  SELECT apex, x, y FROM w2
        |  JOIN ori ON w2.x = ori.a AND w2.y = ori.b),
        |pn AS (SELECT n, COUNT(*) AS nt FROM
        |         (SELECT apex AS n FROM tri UNION ALL
        |          SELECT x FROM tri UNION ALL SELECT y FROM tri) z
        |       GROUP BY n)
        |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(COALESCE(pn.nt, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN deg.d < 2 THEN 0.0
        |       ELSE ROUND(2.0 * COALESCE(pn.nt, 0) / (deg.d * (deg.d - 1)), 6)
        |  END AS coef
        |FROM deg LEFT JOIN pn ON deg.n = pn.n ORDER BY node""".stripMargin,
    // Unrolled 5-iteration damped power iteration (the engine's recurrence
    // verbatim: per-iteration ROUND(.,6) re-pins the compounding float
    // noise, no dangling redistribution — Graph.pageRank's contract).
    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst,
        |         CAST(COUNT(*) AS DOUBLE) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT e.src, e.dst, e.w / ow.ow AS share
        |  FROM e JOIN (SELECT src, SUM(w) AS ow FROM e GROUP BY src) ow
        |    ON e.src = ow.src),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        |r0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), 6) AS rank FROM nodes),
        |r1 AS (SELECT nd.node, ROUND((1 - 0.85) / (SELECT n FROM nn)
        |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
        |       FROM nodes nd
        |       LEFT JOIN sh s ON s.dst = nd.node
        |       LEFT JOIN r0 r ON r.node = s.src
        |       GROUP BY nd.node),
        |r2 AS (SELECT nd.node, ROUND((1 - 0.85) / (SELECT n FROM nn)
        |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
        |       FROM nodes nd
        |       LEFT JOIN sh s ON s.dst = nd.node
        |       LEFT JOIN r1 r ON r.node = s.src
        |       GROUP BY nd.node),
        |r3 AS (SELECT nd.node, ROUND((1 - 0.85) / (SELECT n FROM nn)
        |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
        |       FROM nodes nd
        |       LEFT JOIN sh s ON s.dst = nd.node
        |       LEFT JOIN r2 r ON r.node = s.src
        |       GROUP BY nd.node),
        |r4 AS (SELECT nd.node, ROUND((1 - 0.85) / (SELECT n FROM nn)
        |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
        |       FROM nodes nd
        |       LEFT JOIN sh s ON s.dst = nd.node
        |       LEFT JOIN r3 r ON r.node = s.src
        |       GROUP BY nd.node),
        |r5 AS (SELECT nd.node, ROUND((1 - 0.85) / (SELECT n FROM nn)
        |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
        |       FROM nodes nd
        |       LEFT JOIN sh s ON s.dst = nd.node
        |       LEFT JOIN r4 r ON r.node = s.src
        |       GROUP BY nd.node)
        |SELECT r.node, n.n_name, r.rank
        |FROM r5 r JOIN nation n ON r.node = n.n_nationkey
        |ORDER BY r.node""".stripMargin,
    // Same Laplace-smoothed counts, same per-class fallback, same
    // (score DESC, cls) argmax — ln sums differ only at summation-order
    // ulps, far under the 4-decimal rounding and inter-class gaps.
    "ml_naive_bayes" ->
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 11 <> 0),
        |probes AS (SELECT * FROM documents WHERE doc_id % 11 = 0),
        |toks AS (SELECT lang AS cls, unnest(string_split(text, ' ')) AS t
        |         FROM train),
        |ct AS (SELECT cls, t, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        |ctot AS (SELECT cls, SUM(c) AS ctot FROM ct GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT t) AS v FROM ct),
        |pri AS (SELECT lang AS cls,
        |          ln(COUNT(*) / CAST((SELECT COUNT(*) FROM train) AS DOUBLE))
        |            AS prior
        |        FROM train GROUP BY 1),
        |model AS (SELECT ct.cls, ct.t,
        |            ln((c + 1) / CAST(ctot + v AS DOUBLE)) AS ll
        |          FROM ct JOIN ctot USING (cls) CROSS JOIN v),
        |fb AS (SELECT cls, ln(1 / CAST(ctot + v AS DOUBLE)) AS fb
        |       FROM ctot CROSS JOIN v),
        |pt AS (SELECT doc_id, lang AS true_cls,
        |         unnest(string_split(text, ' ')) AS t FROM probes),
        |sc AS (SELECT doc_id, true_cls, fb.cls,
        |         SUM(COALESCE(ll, fb.fb)) AS loglik
        |       FROM pt CROSS JOIN fb
        |       LEFT JOIN model ON model.cls = fb.cls AND model.t = pt.t
        |       GROUP BY 1, 2, 3),
        |ps AS (SELECT doc_id, true_cls, sc.cls, loglik + prior AS score
        |       FROM sc JOIN pri ON sc.cls = pri.cls),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, cls) AS rn FROM ps)
        |SELECT doc_id, true_cls, cls AS pred_cls, ROUND(score, 4) AS score,
        |  true_cls = cls AS correct
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // One sufficient-statistics aggregate over exact-integer columns, then
    // the SAME Cramer expression strings the engine uses (shared source of
    // truth in Regression.fitSql) — identical IEEE op order, bit parity.
    // Same integer moments, same unrolled power recurrence (ordered-list
    // sums pin the fold order), same projection — generated from one
    // source of truth for scale/iterations (Pca.oracleSql).
    "ml_pca_power" -> Pca.oracleSql(),
    // The k = 3 chain exercises a SECOND deflation (top-2 never does);
    // same generated recurrence, one more prefix.
    "ml_pca_top3" -> Pca.oracleSql(components = 3),
    // Same quantization, same ALGEBRAIC sigmoid string (IEEE-exact on
    // any engine, unlike exp), same integer gradient sums, same
    // 12-decimal weight re-sync per unrolled iteration.
    "ml_logreg" -> LogReg.oracleSql(iters = 12, lr = 8.0),
    // Reliability diagram over the same replayed training run.
    "ml_calibration" ->
      s"""WITH scored AS (${LogReg.oracleSql(iters = 12, lr = 8.0)})
         |SELECT LEAST(9, CAST(floor(p * 10) AS BIGINT)) AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ROUND(AVG(p), 4) AS mean_p,
         |  ROUND(AVG(CAST(y AS DOUBLE)), 4) AS frac_pos,
         |  ROUND(AVG(p) - AVG(CAST(y AS DOUBLE)), 4) + 0.0 AS gap
         |FROM scored GROUP BY 1 ORDER BY bucket""".stripMargin,
    "ml_linreg" -> {
      val fit = Regression.fitSql
        .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
      s"""WITH v AS (
         |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         |    CAST(ROUND(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem),
         |st AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
         |    CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         |    CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         |    CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
         |    CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
         |    CAST(SUM(x2 * y) AS DOUBLE) AS s2y,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy
         |  FROM v GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  $fit
         |FROM st ORDER BY l_returnflag""".stripMargin
    },
    // same stats CTE; lambda added to the slope diagonal before the
    // identical Cramer solve (Regression.RidgeLambda, intercept free)
    "ml_ridge" -> {
      val fit = Regression.fitSql
        .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
      val lam = Regression.RidgeLambda
      s"""WITH v AS (
         |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         |    CAST(ROUND(l_extendedprice) AS BIGINT) AS y
         |  FROM lineitem),
         |st AS (
         |  SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
         |    CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         |    CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         |    CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
         |    CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
         |    CAST(SUM(x2 * y) AS DOUBLE) AS s2y,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy
         |  FROM v GROUP BY l_returnflag),
         |str AS (
         |  SELECT l_returnflag, n, s1, s2, sy, s11 + $lam AS s11, s12,
         |    s22 + $lam AS s22, s1y, s2y, syy
         |  FROM st),
         |ols AS (SELECT l_returnflag, $fit FROM st),
         |rid AS (SELECT l_returnflag, $fit FROM str)
         |SELECT o.l_returnflag, o.beta1 AS b1_ols, o.beta2 AS b2_ols,
         |  r.beta0 AS b0_ridge, r.beta1 AS b1_ridge, r.beta2 AS b2_ridge
         |FROM ols o JOIN rid r USING (l_returnflag)
         |ORDER BY o.l_returnflag""".stripMargin
    },
    // Unrolled 3-round min-plus BFS over the DISTINCT directed trade
    // edges — the engine's full-outer merge recurrence verbatim.
    "graph_bfs" -> {
      val rounds = (1 to 3).map { i =>
        s"""d$i AS (SELECT COALESCE(p.node, m.node) AS node,
           |  LEAST(COALESCE(p.d, m.nd), COALESCE(m.nd, p.d)) AS d
           |  FROM d${i - 1} p FULL OUTER JOIN (
           |    SELECT e.dst AS node, MIN(l.d) + 1 AS nd
           |    FROM e JOIN d${i - 1} l ON l.node = e.src
           |    GROUP BY e.dst) m ON p.node = m.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         |d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d),
         |$rounds
         |SELECT d3.node, n.n_name, d3.d AS dist
         |FROM d3 JOIN nation n ON d3.node = n.n_nationkey
         |ORDER BY d3.node""".stripMargin
    },
    // Unrolled 5-round synchronous min-label propagation (generated round
    // CTEs — the engine's recurrence verbatim: each node takes the min of
    // its own and its in-neighbors' labels; star edges to per-group hubs).
    "graph_labelprop" -> {
      val rounds = (1 to 5).map { i =>
        s"""l$i AS (SELECT n.node,
           |  LEAST(n.label, COALESCE(m.nmin, n.label)) AS label
           |  FROM l${i - 1} n LEFT JOIN (
           |    SELECT e.dst AS node, MIN(l.label) AS nmin
           |    FROM edges e JOIN l${i - 1} l ON l.node = e.src
           |    GROUP BY e.dst) m USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH st AS (
         |  SELECT p, hub FROM (
         |    SELECT CAST(p_partkey AS BIGINT) AS p,
         |      CAST(MIN(p_partkey) OVER (PARTITION BY p_brand, p_size) AS BIGINT) AS hub
         |    FROM part) WHERE p <> hub
         |  UNION ALL
         |  SELECT p, hub FROM (
         |    SELECT CAST(p_partkey AS BIGINT) AS p,
         |      CAST(MIN(p_partkey) OVER (PARTITION BY p_type) AS BIGINT) AS hub
         |    FROM part) WHERE p <> hub),
         |edges AS (SELECT p AS src, hub AS dst FROM st
         |          UNION ALL SELECT hub, p FROM st),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |$rounds
         |SELECT node, label,
         |  COUNT(*) OVER (PARTITION BY label) AS community_size
         |FROM l5 ORDER BY node""".stripMargin
    },
    // resource-allocation link prediction: same shared-neighbor pair
    // derivation, weights in exact 1e6-div-degree micro-units
    "graph_ra" ->
      """WITH st AS (
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_brand, p_size) AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub
        |  UNION ALL
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_type) AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub),
        |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT p AS src, hub AS dst FROM st
        |  UNION ALL SELECT hub, p FROM st)),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |ef AS MATERIALIZED (
        |  SELECT a.src AS u, a.dst AS n, 1000000 // deg.d AS w
        |  FROM edges a JOIN deg ON a.dst = deg.src WHERE deg.d <= 64),
        |pairs AS (
        |  SELECT x.u AS u, y.u AS v, COUNT(*) AS common,
        |    SUM(x.w) AS ra_e6
        |  FROM ef x JOIN ef y ON x.n = y.n AND x.u < y.u
        |  GROUP BY 1, 2)
        |SELECT u, v, CAST(common AS BIGINT) AS common,
        |  CAST(du.d AS BIGINT) AS du, CAST(dv.d AS BIGINT) AS dv,
        |  CAST(ra_e6 AS BIGINT) AS ra_e6
        |FROM pairs JOIN deg du ON pairs.u = du.src
        |           JOIN deg dv ON pairs.v = dv.src
        |WHERE common >= 2
        |ORDER BY ra_e6 DESC, u, v LIMIT 100""".stripMargin,
    // same hub-star edge derivation as graph_labelprop; pairs only via a
    // shared neighbor (never |V|^2), jaccard = exact-int division
    "graph_jaccard" ->
      """WITH st AS (
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_brand, p_size) AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub
        |  UNION ALL
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_type) AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub),
        |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT p AS src, hub AS dst FROM st
        |  UNION ALL SELECT hub, p FROM st)),
        |deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |ef AS MATERIALIZED (
        |  SELECT a.src AS u, a.dst AS n FROM edges a
        |  JOIN deg ON a.dst = deg.src WHERE deg.d <= 64),
        |pairs AS (
        |  SELECT x.u AS u, y.u AS v, COUNT(*) AS common
        |  FROM ef x JOIN ef y ON x.n = y.n AND x.u < y.u
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT u, v, CAST(common AS BIGINT) AS common,
        |    CAST(du.d AS BIGINT) AS du, CAST(dv.d AS BIGINT) AS dv,
        |    ROUND(common / CAST(du.d + dv.d - common AS DOUBLE), 6) AS jaccard
        |  FROM pairs JOIN deg du ON pairs.u = du.src
        |             JOIN deg dv ON pairs.v = dv.src)
        |SELECT u, v, common, du, dv, jaccard FROM j
        |WHERE jaccard >= 0.25
        |ORDER BY jaccard DESC, u, v LIMIT 100""".stripMargin,
    // the 3-round boosting recurrence unrolled as MATERIALIZED CTEs,
    // every formula shared textually with the engine
    "ml_boosted_stumps" -> Regression.boostedOracleSql(),
    // three stump-search chains (root + per-leaf behind the root winner's
    // scalar subquery); leaf stats from shared SSE fragments
    "ml_tree_depth2" -> Regression.treeOracleSql(),
    // 3 unrolled folds: per fold a stump chain trained on the OTHER two
    // folds + held-out RMSE from per-side integer sufficient statistics
    "ml_cv" -> {
      val sse = Regression.stumpSseSql
      val folds = (0 to 2).map { f =>
        val m = s"(CASE WHEN is_left THEN (SELECT ml FROM w_$f)" +
          s" ELSE (SELECT mr FROM w_$f) END)"
        s"""perq_$f AS MATERIALIZED (
           |  SELECT q, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
           |  FROM li WHERE fold <> $f GROUP BY q),
           |pre_$f AS (
           |  SELECT q,
           |    SUM(n) OVER w AS nl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl,
           |    SUM(n) OVER () AS nt, SUM(s) OVER () AS st, SUM(ss) OVER () AS sst
           |  FROM perq_$f
           |  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |sp_$f AS (
           |  SELECT q, nl, sl, ssl, nt - nl AS nr, st - sl AS sr,
           |    sst - ssl AS ssr
           |  FROM pre_$f WHERE nt - nl > 0),
           |w_$f AS MATERIALIZED (
           |  SELECT q, nl, nr,
           |    CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS ml,
           |    CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mr
           |  FROM sp_$f ORDER BY $sse, q LIMIT 1),
           |ho_$f AS (
           |  SELECT (q <= (SELECT q FROM w_$f)) AS is_left, COUNT(*) AS n,
           |    SUM(v) AS sy, SUM(v * v) AS syy
           |  FROM li WHERE fold = $f GROUP BY 1),
           |r_$f AS (
           |  SELECT CAST($f AS BIGINT) AS fold,
           |    (SELECT q FROM w_$f) AS threshold,
           |    (SELECT CAST(nl + nr AS BIGINT) FROM w_$f) AS n_train,
           |    CAST(SUM(n) AS BIGINT) AS n_test,
           |    CAST(FLOOR(SQRT(SUM(CAST(syy AS DOUBLE) - 2.0 * $m
           |        * CAST(sy AS DOUBLE) + CAST(n AS DOUBLE) * $m * $m)
           |      / CAST(SUM(n) AS DOUBLE)) * 10000) AS BIGINT)
           |      AS rmse_test_e4
           |  FROM ho_$f)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS MATERIALIZED (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v,
         |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#'
         |      || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 3
         |      AS fold
         |  FROM lineitem),
         |$folds
         |SELECT * FROM r_0 UNION ALL SELECT * FROM r_1
         |UNION ALL SELECT * FROM r_2 ORDER BY fold""".stripMargin
    },
    // tie-corrected Mann-Whitney AUC: all-integer doubled-rank algebra,
    // shared verbatim with the engine (operators/Metrics.scala)
    "ml_auc" -> Metrics.mlAucOracle,
    // density clustering: quadratic definitional neighbor counts + the
    // per-column gaps-and-islands connectivity closed form (exact for
    // the 250-spaced fixture; the engine runs the general 2-D grid)
    "ml_dbscan" -> Metrics.mlDbscanOracle,
    // isotonic calibration via the exact min-max characterization over
    // the bounded per-score frame; fractions too small to collide in
    // doubles, fits floor-quantized
    "ml_isotonic" -> Metrics.mlIsotonicOracle,
    // nDCG@10 with fixed-point log2 discounts shared as literals (no
    // libm inside either engine), all-integer discounted sums
    "ml_ndcg" -> Metrics.mlNdcgOracle,
    // exact integer distances over the shared quantized grid; majority
    // vote is an integer sum, ranking ties break on candidate id
    "ml_knn" -> Metrics.mlKnnOracle,
    // confusion matrix + per-class P/R/F1 off the knn oracle's scored
    // frame; conditional integer sums, three final divisions
    "ml_prf" -> Metrics.mlPrfOracle,
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
    // the labelprop recurrence + exact integer modularity over the common
    // denominator 4m^2 (4m*e_c - d_c^2); the division is display only
    "graph_modularity" -> {
      val rounds = (1 to 5).map { i =>
        s"""l$i AS (SELECT n.node,
           |  LEAST(n.label, COALESCE(m.nmin, n.label)) AS label
           |  FROM l${i - 1} n LEFT JOIN (
           |    SELECT e.dst AS node, MIN(l.label) AS nmin
           |    FROM edges e JOIN l${i - 1} l ON l.node = e.src
           |    GROUP BY e.dst) m USING (node))""".stripMargin
      }.mkString(",\n")
      s"""WITH st AS (
         |  SELECT p, hub FROM (
         |    SELECT CAST(p_partkey AS BIGINT) AS p,
         |      CAST(MIN(p_partkey) OVER (PARTITION BY p_brand, p_size) AS BIGINT) AS hub
         |    FROM part) WHERE p <> hub),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT LEAST(p, hub) AS u, GREATEST(p, hub) AS v
         |  FROM st),
         |edges AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM und
         |  UNION ALL SELECT v, u FROM und),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |$rounds,
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |ein AS (
         |  SELECT a.label, COUNT(*) AS e_in
         |  FROM und JOIN l5 a ON und.u = a.node JOIN l5 b ON und.v = b.node
         |  WHERE a.label = b.label GROUP BY a.label),
         |deg AS (
         |  SELECT l.label, COUNT(*) AS d_tot
         |  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) x
         |  JOIN l5 l USING (node) GROUP BY l.label),
         |sizes AS (SELECT label, COUNT(*) AS n_nodes FROM l5 GROUP BY label)
         |SELECT s.label, CAST(s.n_nodes AS BIGINT) AS n_nodes,
         |  CAST(COALESCE(e.e_in, 0) AS BIGINT) AS e_in,
         |  CAST(d.d_tot AS BIGINT) AS d_tot,
         |  CAST(4 * mm.m * COALESCE(e.e_in, 0) - d.d_tot * d.d_tot
         |    AS BIGINT) AS q_num,
         |  ROUND(CAST(4 * mm.m * COALESCE(e.e_in, 0) - d.d_tot * d.d_tot
         |    AS DOUBLE) / (4.0 * mm.m * mm.m), 6) AS q_contrib
         |FROM sizes s JOIN deg d USING (label)
         |LEFT JOIN ein e USING (label), mm
         |ORDER BY s.label""".stripMargin
    },
    // 3 unrolled Boruvka rounds (min outgoing edge per component with the
    // (w,u,v) tie-break, then min-label + pointer-jump contraction)
    "graph_mst" -> {
      def labelRounds(r: Int): String = (1 to 5).map { j =>
        s"""nb_${r}_$j AS (
           |  SELECT ce.dst AS node, MIN(l.p) AS np
           |  FROM ce_$r ce JOIN lbl_${r}_${j - 1} l ON l.node = ce.src
           |  GROUP BY ce.dst),
           |m_${r}_$j AS MATERIALIZED (
           |  SELECT l.node, LEAST(l.p, COALESCE(nb.np, l.p)) AS p
           |  FROM lbl_${r}_${j - 1} l LEFT JOIN nb_${r}_$j nb USING (node)),
           |lbl_${r}_$j AS MATERIALIZED (
           |  SELECT a.node, COALESCE(b.p, a.p) AS p
           |  FROM m_${r}_$j a LEFT JOIN m_${r}_$j b ON a.p = b.node)"""
          .stripMargin
      }.mkString(",\n")
      val rounds = (1 to 3).map { r =>
        s"""e2_$r AS (
           |  SELECT e.u, e.v, e.w, a.c AS cu, b.c AS cv
           |  FROM und e
           |  JOIN comp_${r - 1} a ON e.u = a.node
           |  JOIN comp_${r - 1} b ON e.v = b.node
           |  WHERE a.c <> b.c),
           |cand_$r AS (
           |  SELECT cu AS cc, u, v, w, cu, cv FROM e2_$r
           |  UNION ALL SELECT cv AS cc, u, v, w, cu, cv FROM e2_$r),
           |chosen_$r AS MATERIALIZED (
           |  SELECT DISTINCT u, v, w, cu, cv FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cc
           |      ORDER BY w, u, v) AS rk FROM cand_$r) WHERE rk = 1),
           |mst_$r AS MATERIALIZED (
           |  SELECT u, v, w FROM mst_${r - 1}
           |  UNION ALL SELECT u, v, w FROM chosen_$r),
           |ce_$r AS MATERIALIZED (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT cu AS src, cv AS dst FROM chosen_$r
           |    UNION ALL SELECT cv, cu FROM chosen_$r)),
           |lbl_${r}_0 AS (
           |  SELECT DISTINCT c AS node, c AS p FROM comp_${r - 1}),
           |${labelRounds(r)},
           |comp_$r AS MATERIALIZED (
           |  SELECT cp.node, COALESCE(l.p, cp.c) AS c
           |  FROM comp_${r - 1} cp
           |  LEFT JOIN lbl_${r}_5 l ON cp.c = l.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH und AS MATERIALIZED (
         |  SELECT LEAST(CAST(c.c_nationkey AS BIGINT),
         |               CAST(s.s_nationkey AS BIGINT)) AS u,
         |    GREATEST(CAST(c.c_nationkey AS BIGINT),
         |             CAST(s.s_nationkey AS BIGINT)) AS v,
         |    COUNT(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey
         |  GROUP BY 1, 2),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT u AS node FROM und UNION ALL SELECT v FROM und)),
         |comp_0 AS (SELECT node, node AS c FROM nodes),
         |mst_0 AS (SELECT CAST(NULL AS BIGINT) AS u,
         |  CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS w
         |  WHERE 1 = 0),
         |$rounds
         |SELECT u, v, CAST(w AS BIGINT) AS w
         |FROM mst_3 ORDER BY u, v""".stripMargin
    },
    // forward sigma rounds + Brandes' backward dependency accumulation in
    // integer micro-units ((sig_v*(1e6+del_w)) // sig_w), depths descending
    "graph_betweenness" -> {
      val fwd = (1 to 4).map { r =>
        s"""c_$r AS (
           |  SELECT f.s, e.dst AS node, SUM(f.sig) AS sig
           |  FROM st_${r - 1} f JOIN e ON f.node = e.src
           |  WHERE f.d = ${r - 1}
           |  GROUP BY f.s, e.dst),
           |st_$r AS MATERIALIZED (
           |  SELECT s, node, d, sig FROM st_${r - 1}
           |  UNION ALL
           |  SELECT c.s, c.node, $r AS d, c.sig
           |  FROM c_$r c
           |  WHERE NOT EXISTS (SELECT 1 FROM st_${r - 1} x
           |    WHERE x.s = c.s AND x.node = c.node))""".stripMargin
      }.mkString(",\n")
      val bwd = (3 to 0 by -1).map { t =>
        s"""ct_$t AS (
           |  SELECT v.s, v.node,
           |    SUM((v.sig * (1000000 + dl.del)) // w.sig) AS cdel
           |  FROM st_4 v
           |  JOIN e ON v.node = e.src
           |  JOIN st_4 w ON w.s = v.s AND w.node = e.dst AND w.d = ${t + 1}
           |  JOIN d_${t + 1} dl ON dl.s = v.s AND dl.node = e.dst
           |  WHERE v.d = $t
           |  GROUP BY v.s, v.node),
           |d_$t AS MATERIALIZED (
           |  SELECT b.s, b.node, COALESCE(c.cdel, 0) AS del
           |  FROM (SELECT s, node FROM st_4 WHERE d = $t) b
           |  LEFT JOIN ct_$t c ON c.s = b.s AND c.node = b.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  WHERE c.c_nationkey <> s.s_nationkey),
         |nodes AS (SELECT DISTINCT s FROM (
         |  SELECT src AS s FROM e UNION ALL SELECT dst FROM e)),
         |st_0 AS (SELECT s, s AS node, CAST(0 AS BIGINT) AS d,
         |  CAST(1 AS BIGINT) AS sig FROM nodes),
         |$fwd,
         |d_4 AS (SELECT s, node, CAST(0 AS BIGINT) AS del
         |  FROM st_4 WHERE d = 4),
         |$bwd,
         |acc AS (
         |  SELECT s, node, del FROM d_4
         |  UNION ALL SELECT s, node, del FROM d_3
         |  UNION ALL SELECT s, node, del FROM d_2
         |  UNION ALL SELECT s, node, del FROM d_1
         |  UNION ALL SELECT s, node, del FROM d_0),
         |b AS (SELECT node, SUM(del) AS bc_micro
         |  FROM acc WHERE node <> s GROUP BY node)
         |SELECT b.node, n.n_name, CAST(b.bc_micro AS BIGINT) AS bc_micro,
         |  ROUND(b.bc_micro / 1000000.0, 4) AS bc
         |FROM b JOIN nation n ON b.node = n.n_nationkey
         |ORDER BY b.bc_micro DESC, b.node""".stripMargin
    },
    // 4 unrolled sigma rounds: new nodes at depth r sum their depth-(r-1)
    // predecessors' counts — Brandes' forward pass, exact integers
    "graph_spaths" -> {
      val rounds = (1 to 4).map { r =>
        s"""c_$r AS (
           |  SELECT f.s, e.dst AS node, SUM(f.sig) AS sig
           |  FROM st_${r - 1} f JOIN e ON f.node = e.src
           |  WHERE f.d = ${r - 1}
           |  GROUP BY f.s, e.dst),
           |st_$r AS MATERIALIZED (
           |  SELECT s, node, d, sig FROM st_${r - 1}
           |  UNION ALL
           |  SELECT c.s, c.node, $r AS d, c.sig
           |  FROM c_$r c
           |  WHERE NOT EXISTS (SELECT 1 FROM st_${r - 1} x
           |    WHERE x.s = c.s AND x.node = c.node))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         |nodes AS (SELECT DISTINCT s FROM (
         |  SELECT src AS s FROM e UNION ALL SELECT dst FROM e)),
         |st_0 AS (SELECT s, s AS node, CAST(0 AS BIGINT) AS d,
         |  CAST(1 AS BIGINT) AS sig FROM nodes),
         |$rounds
         |SELECT s AS src, node, CAST(d AS BIGINT) AS dist,
         |  CAST(sig AS BIGINT) AS paths
         |FROM st_4 WHERE d > 0 ORDER BY src, node""".stripMargin
    },
    // 8 unrolled neighbor-min + pointer-jump rounds — the engine's
    // doubling recurrence verbatim on the 97-segment part-key chain
    "graph_wcc" -> {
      val rounds = (1 to 8).map { i =>
        s"""nb_$i AS MATERIALIZED (
           |  SELECT e.dst AS node, MIN(l.p) AS np
           |  FROM e JOIN p_${i - 1} l ON l.node = e.src GROUP BY e.dst),
           |m_$i AS MATERIALIZED (
           |  SELECT p.node, LEAST(p.p, COALESCE(nb.np, p.p)) AS p
           |  FROM p_${i - 1} p LEFT JOIN nb_$i nb USING (node)),
           |p_$i AS MATERIALIZED (
           |  SELECT a.node, COALESCE(b.p, a.p) AS p
           |  FROM m_$i a LEFT JOIN m_$i b ON a.p = b.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH keys AS (SELECT CAST(p_partkey AS BIGINT) AS k FROM part),
         |fwd AS (
         |  SELECT a.k AS src, a.k + 1 AS dst
         |  FROM keys a JOIN keys b ON b.k = a.k + 1
         |  WHERE a.k % 97 <> 0),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM fwd UNION ALL SELECT dst, src FROM fwd)),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |p_0 AS (SELECT node, node AS p FROM nodes),
         |$rounds
         |SELECT p AS component, CAST(COUNT(*) AS BIGINT) AS size,
         |  MIN(node) AS lo, MAX(node) AS hi
         |FROM p_8 GROUP BY p ORDER BY component""".stripMargin
    },
    // 4 unrolled per-source BFS rounds (the graph_bfs recurrence keyed by
    // pivot source); harmonic score is the exact-integer 12/d sum
    "graph_closeness" -> {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT COALESCE(p.s, m.s) AS s, COALESCE(p.node, m.node) AS node,
           |    LEAST(COALESCE(p.d, m.nd), COALESCE(m.nd, p.d)) AS d
           |  FROM d${i - 1} p FULL OUTER JOIN (
           |    SELECT l.s, e.dst AS node, MIN(l.d) + 1 AS nd
           |    FROM e JOIN d${i - 1} l ON l.node = e.src
           |    GROUP BY l.s, e.dst) m ON p.s = m.s AND p.node = m.node)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         |nodes AS (SELECT DISTINCT s FROM (
         |  SELECT src AS s FROM e UNION ALL SELECT dst FROM e)),
         |d0 AS (SELECT s, s AS node, CAST(0 AS BIGINT) AS d FROM nodes),
         |$rounds,
         |h AS (
         |  SELECT node, CAST(COUNT(*) AS BIGINT) AS reached,
         |    CAST(SUM(CASE d WHEN 1 THEN 12 WHEN 2 THEN 6
         |      WHEN 3 THEN 4 ELSE 3 END) AS BIGINT) AS h12
         |  FROM d4 WHERE d > 0 GROUP BY node)
         |SELECT h.node, n.n_name, h.reached, h.h12
         |FROM h JOIN nation n ON h.node = n.n_nationkey
         |ORDER BY h.h12 DESC, h.node""".stripMargin
    },
    // 8 unrolled peel rounds over the triangles-style sparsified trade
    // graph; bounded-round semantics identical in both engines
    "graph_kcore" -> {
      val rounds = (0 until 8).map { i =>
        s"""k_$i AS MATERIALIZED (
           |  SELECT src AS n FROM s_$i GROUP BY src HAVING COUNT(*) >= 3),
           |s_${i + 1} AS MATERIALIZED (
           |  SELECT e.src, e.dst FROM s_$i e
           |  JOIN k_$i a ON e.src = a.n JOIN k_$i b ON e.dst = b.n)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst, COUNT(*) AS w
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  GROUP BY 1, 2),
         |und AS MATERIALIZED (
         |  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, SUM(w) AS w
         |  FROM e0 WHERE src != dst GROUP BY 1, 2),
         |kept AS MATERIALIZED (
         |  SELECT u, v FROM und, (SELECT quantile_cont(w, 0.7) AS q FROM und) qs
         |  WHERE w > q),
         |s_0 AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM kept
         |  UNION ALL SELECT v, u FROM kept),
         |$rounds
         |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
         |FROM s_8 GROUP BY src ORDER BY node""".stripMargin
    },
    // exact stump split-search: integer sufficient stats + the SHARED
    // double SSE expression (Regression.stumpSseSql) on both engines.
    // Emissions floor-quantize to integer units (ROUND on a double hit
    // a real HALF_UP-vs-binary tie at sf0.01 — see Regression.mlStump)
    "ml_stump" ->
      s"""WITH li AS (
         |  SELECT CAST(l_quantity AS BIGINT) AS q,
         |    CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v
         |  FROM lineitem),
         |perq AS (
         |  SELECT q, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
         |  FROM li GROUP BY q),
         |pre AS (
         |  SELECT q,
         |    SUM(n) OVER w AS nl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl,
         |    SUM(n) OVER () AS nt, SUM(s) OVER () AS st, SUM(ss) OVER () AS sst
         |  FROM perq
         |  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |sp AS (
         |  SELECT q, nl, sl, ssl,
         |    nt - nl AS nr, st - sl AS sr, sst - ssl AS ssr
         |  FROM pre WHERE nt - nl > 0)
         |SELECT q AS threshold, CAST(nl AS BIGINT) AS n_left,
         |  CAST(nr AS BIGINT) AS n_right,
         |  CAST(floor((CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)) * 10000) AS BIGINT) AS mean_left_e4,
         |  CAST(floor((CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)) * 10000) AS BIGINT) AS mean_right_e4,
         |  CAST(floor(${Regression.stumpSseSql} * 100) AS BIGINT) AS sse_cents
         |FROM sp ORDER BY sse_cents, threshold LIMIT 3""".stripMargin,
    // oracle takes the definitional quadratic NOT EXISTS; the engine's
    // prefix-max plan must reproduce it exactly
    "q51_skyline" ->
      """SELECT p_partkey AS k, ROUND(p_retailprice, 2) AS price,
        |  p_size AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part o
        |  WHERE o.p_retailprice <= p.p_retailprice
        |    AND o.p_size >= p.p_size
        |    AND (o.p_retailprice < p.p_retailprice
        |         OR o.p_size > p.p_size))
        |ORDER BY k""".stripMargin,
    // exact mode: integer counts, (n DESC, v ASC) rank, share of total
    // identical strictly-prior first/last IGNORE NULLS windows, identical
    // (ts, event_id) ordering
    "q57_attribution" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    first_value(CASE WHEN event_type IN ('click', 'view')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events),
        |p AS (SELECT * FROM e
        |      WHERE event_type = 'purchase' AND last_touch IS NOT NULL)
        |SELECT 'first_touch' AS model, first_touch AS touch,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM p GROUP BY first_touch
        |UNION ALL
        |SELECT 'last_touch', last_touch, COUNT(*), ROUND(SUM(value), 2)
        |FROM p GROUP BY last_touch
        |ORDER BY model, touch""".stripMargin,
    // exact integer window sums; the slope division is the only float
    "q56_rolling_slope" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT day, n,
        |    CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x
        |  FROM daily),
        |win AS (
        |  SELECT day, n,
        |    COUNT(*) OVER w AS n7, SUM(x) OVER w AS sx,
        |    SUM(n) OVER w AS sy, SUM(x * n) OVER w AS sxy,
        |    SUM(x * x) OVER w AS sxx
        |  FROM d2
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(n AS BIGINT) AS n,
        |  ROUND(CAST(n7 * sxy - sx * sy AS DOUBLE)
        |    / CAST(n7 * sxx - sx * sx AS DOUBLE), 6) AS slope7
        |FROM win WHERE n7 = 7 ORDER BY day""".stripMargin,
    // identical per-user letter strings (ts, event_id order), identical
    // regex semantics (leftmost non-overlapping, greedy runs)
    "q55_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(substring(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  md5(seq) AS fp,
        |  CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels,
        |  CAST(COALESCE(list_max(list_transform(
        |    regexp_extract_all(seq, 'c+'), x -> len(x))), 0) AS BIGINT)
        |    AS max_click_run,
        |  regexp_matches(seq, 's.*p') AS converted_signup
        |FROM s ORDER BY user_id""".stripMargin,
    // the identical branch CASE over a full-outer join, ANSI clause
    // order (delete evaluated before update on matched rows)
    "q54_merge_all" ->
      """WITH e AS (
        |  SELECT c_custkey AS k, c_nationkey AS nat,
        |    ROUND(c_acctbal, 2) AS bal
        |  FROM customer),
        |s AS (
        |  SELECT k, nat, ROUND(bal - 2500, 2) AS bal FROM e WHERE k % 7 < 3
        |  UNION ALL
        |  SELECT k + 1000000, nat, bal FROM e WHERE k % 11 = 0),
        |j AS (
        |  SELECT e.k AS ek, e.nat AS enat, e.bal AS ebal,
        |         s.k AS sk, s.nat AS snat, s.bal AS sbal
        |  FROM e FULL OUTER JOIN s ON e.k = s.k),
        |a AS (
        |  SELECT *,
        |    CASE WHEN ek IS NOT NULL AND sk IS NOT NULL AND sbal < 0
        |           THEN NULL
        |         WHEN ek IS NOT NULL AND sk IS NOT NULL AND sbal >= 0
        |           THEN 'U'
        |         WHEN ek IS NOT NULL AND sk IS NOT NULL THEN 'K'
        |         WHEN ek IS NULL THEN 'I'
        |         WHEN sk IS NULL AND enat = 3 THEN NULL
        |         ELSE 'K' END AS action
        |  FROM j)
        |SELECT CASE WHEN action IN ('I', 'U') THEN sk ELSE ek END AS k,
        |  CASE WHEN action IN ('I', 'U') THEN snat ELSE enat END AS nat,
        |  CASE WHEN action IN ('I', 'U') THEN sbal ELSE ebal END AS bal,
        |  action
        |FROM a WHERE action IS NOT NULL ORDER BY k""".stripMargin,
    "q53_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT g, v, n,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY n DESC, v) AS rn,
        |    SUM(n) OVER (PARTITION BY g) AS tot
        |  FROM c)
        |SELECT g, v AS mode_v, CAST(n AS BIGINT) AS n,
        |  ROUND(n / CAST(tot AS DOUBLE), 6) AS share
        |FROM r WHERE rn = 1 ORDER BY g""".stripMargin,
    // RANGE frame => tie rows share one cumulative weight, so the lower
    // weighted median is order-independent; mean over exact cents
    "q52_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (
        |  SELECT g, v, w,
        |    SUM(w) OVER (PARTITION BY g ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY g) AS tot,
        |    SUM(cents * w) OVER (PARTITION BY g) AS cw
        |  FROM li)
        |SELECT g, ROUND(MIN(v), 2) AS wmedian,
        |  CAST(MAX(tot) AS BIGINT) AS total_w,
        |  ROUND(MAX(cw) / (MAX(tot) * 100.0), 4) AS wmean
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY g ORDER BY g""".stripMargin,
    // both tables must resolve through the SAME manifest version (the
    // full second publish), so the oracle is the plain base-table join
    "a41_atomic_publish" ->
      """SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
    // rule counts recomputed from the base table + injection formula;
    // the surviving row count proves batch 2 never reached the pointer
    "a44_write_audit_publish" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, ROUND(c_acctbal, 2) AS bal FROM customer),
        |inj AS (SELECT k, ROUND(bal * 100, 2) AS bal FROM c
        |        WHERE k % 100 = 0),
        |bad AS (SELECT * FROM c UNION ALL SELECT * FROM inj)
        |SELECT CAST(1 AS BIGINT) AS batch, 'dup_keys' AS rule,
        |  CAST(0 AS BIGINT) AS violations, TRUE AS published
        |UNION ALL SELECT 1, 'null_keys', 0, TRUE
        |UNION ALL SELECT 1, 'range_violations', 0, TRUE
        |UNION ALL SELECT 2, 'dup_keys',
        |  (SELECT COUNT(*) - COUNT(DISTINCT k) FROM bad), FALSE
        |UNION ALL SELECT 2, 'null_keys', 0, FALSE
        |UNION ALL SELECT 2, 'range_violations',
        |  (SELECT COUNT(*) FROM bad WHERE bal < -1000 OR bal > 10000),
        |  FALSE
        |UNION ALL SELECT 9, 'published_rows',
        |  (SELECT COUNT(*) FROM c), TRUE
        |ORDER BY batch, rule""".stripMargin,
    // stage totals recomputed from the base tables; the engine must
    // reproduce them through the park/merge/retry storage hops
    "a43_late_arriving" ->
      """WITH f AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |    ROUND(o_totalprice, 2) AS p
        |  FROM orders)
        |SELECT 'enriched_pass_1' AS stage, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(p), 2) AS total
        |FROM f WHERE ck % 3 <> 0
        |UNION ALL
        |SELECT 'enriched_pass_2', COUNT(*), ROUND(SUM(p), 2)
        |FROM f WHERE ck % 3 = 0 AND ck % 9 <> 0
        |UNION ALL
        |SELECT 'pending', COUNT(*), ROUND(SUM(p), 2)
        |FROM f WHERE ck % 9 = 0
        |ORDER BY stage""".stripMargin,
    // vacuumed versions are pinned literally as refused sentinel rows;
    // retained slices recomputed from the base table (the engine must
    // serve them from post-vacuum storage)
    "a42_retention_vacuum" ->
      """SELECT CAST(1 AS BIGINT) AS version, FALSE AS readable,
        |  CAST(-1 AS BIGINT) AS n, CAST(0.0 AS DOUBLE) AS total
        |UNION ALL
        |SELECT 2, FALSE, -1, 0.0
        |UNION ALL
        |SELECT 3, TRUE, COUNT(*),
        |  ROUND(SUM(ROUND(o_totalprice, 2)), 2)
        |FROM orders WHERE o_orderkey % 10 < 3
        |UNION ALL
        |SELECT 4, TRUE, COUNT(*),
        |  ROUND(SUM(ROUND(o_totalprice, 2)), 2)
        |FROM orders WHERE o_orderkey % 10 < 4
        |ORDER BY version""".stripMargin,
    // survivor-set aggregate after the purge-delete; the engine must
    // read it back from post-erasure storage
    "a40_gdpr_delete" ->
      """SELECT c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(ROUND(c_acctbal, 2)), 2) AS total_bal,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |   WHERE c_nationkey = 7) AS n_deleted
        |FROM customer WHERE c_nationkey <> 7
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // the oracle recomputes both snapshot versions from the base table;
    // the engine must produce the identical feed from STORAGE
    "a39_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, ROUND(o_totalprice + 1000, 2) AS p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (
        |  SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS p
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(v1.k, v2.k) AS k,
        |  CASE WHEN v1.k IS NULL THEN 'I'
        |       WHEN v2.k IS NULL THEN 'D'
        |       ELSE 'U' END AS change,
        |  v1.p AS old_p, v2.p AS new_p
        |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |WHERE v1.k IS NULL OR v2.k IS NULL OR v1.p <> v2.p
        |ORDER BY k""".stripMargin,
    // first digit from the decimal rendering of exact cents (no libm
    // log10); expectations are shared 6-digit literals
    // the CUSUM recursion as the exact prefix identity
    // S_t = P_t - min(0, min prefix P); integer arithmetic throughout
    "dq_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1),
        |p1 AS (
        |  SELECT day, n, SUM(n - 6) OVER w AS p
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |pre AS (
        |  SELECT day, n, p, MIN(p) OVER w AS mp
        |  FROM p1
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(n AS BIGINT) AS n,
        |  CAST(p - LEAST(0, mp) AS BIGINT) AS cusum,
        |  p - LEAST(0, mp) > 40 AS alarm
        |FROM pre ORDER BY day""".stripMargin,
    // exact two-sample KS by integer cross-multiplication; smallest
    // argmax value reported; Smirnov alpha=0.05 critical compare shared
    "dq_ks" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice + 0.5) AS BIGINT) AS v,
        |    CAST(o_orderdate < TIMESTAMP '1998-01-01' AS BIGINT) AS g1
        |  FROM orders),
        |perv AS (
        |  SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2
        |  FROM o GROUP BY v),
        |cum AS (
        |  SELECT v,
        |    SUM(c1) OVER w AS cum1, SUM(c2) OVER w AS cum2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        |  FROM perv
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |d AS (
        |  SELECT v, n1, n2, ABS(cum1 * n2 - cum2 * n1) AS dnum,
        |    MAX(ABS(cum1 * n2 - cum2 * n1)) OVER () AS mx
        |  FROM cum)
        |SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
        |  CAST(MAX(dnum) AS BIGINT) AS d_num,
        |  CAST(MIN(v) AS BIGINT) AS at_dollars,
        |  ROUND(CAST(MAX(dnum) AS DOUBLE)
        |    / CAST(MAX(n1) * MAX(n2) AS DOUBLE), 6) AS ks,
        |  CAST(MAX(dnum) AS DOUBLE) * CAST(MAX(dnum) AS DOUBLE) >
        |    1.8440661112 * CAST(MAX(n1) * MAX(n2) AS DOUBLE)
        |      * CAST(MAX(n1) + MAX(n2) AS DOUBLE) AS drift
        |FROM d WHERE dnum = mx""".stripMargin,
    "dq_benford" -> {
      val cases = graft.operators.Analytics.benfordProbs.map { case (i, p) =>
        s"WHEN $i THEN CAST($p AS DOUBLE)" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT CAST(SUBSTR(CAST(CAST(floor(l_extendedprice * 100 + 0.5)
         |    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM lineitem),
         |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
         |r AS (
         |  SELECT digit, CAST(n AS BIGINT) AS n,
         |    ROUND(n / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share,
         |    CASE digit $cases END AS benford_p
         |  FROM g)
         |SELECT digit, n, share, benford_p,
         |  ROUND(ABS(share - benford_p), 6) AS abs_dev
         |FROM r ORDER BY digit""".stripMargin
    },
  )
}
