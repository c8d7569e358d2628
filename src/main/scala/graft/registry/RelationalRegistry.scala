package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Declared relational surface (SURVEY.md §2.B/§2.E): q01–q57 families,
  * data-quality rows, and the UDAF surface.
  *
  * Split from the monolithic SparkEntry registry (round-12 hygiene);
  * keys and SQL are unchanged.
  */
object RelationalRegistry {
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
    "dq_entropy"            -> (Analytics.dqEntropy _),
    "dq_outliers"           -> ((s, d) => Analytics.dqOutliers(s, d)),
    "dq_iqr"                -> (Analytics.dqIqr _),
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
    "dq_drift"              -> (LlmQueries.dqDrift _),
    "udaf_centroid"         -> (LlmQueries.udafCentroid _),
    "q51_skyline"           -> (Analytics.skyline _),
    "q52_weighted_median"   -> (Analytics.weightedMedian _),
    "q53_mode"              -> (Analytics.modePerGroup _),
    "q54_merge_all"         -> (Queries.q54 _),
    "q55_seq_pattern"       -> (Queries.q55 _),
    "q56_rolling_slope"     -> (Analytics.rollingSlope _),
    "q57_attribution"       -> (Analytics.attribution _),
    "q58_bitwise_agg"       -> (Analytics.bitwiseAgg _),
    "q59_percentile_disc"   -> (Analytics.percentileDisc _),
    "q59b_approx_percentile_disc" -> (Analytics.approxPercentileDisc _),
    "dq_benford"            -> (Analytics.dqBenford _),
    "dq_gaps"               -> (Analytics.dqGaps _),
    "dq_ks"                 -> (Analytics.dqKs _),
    "dq_cusum"              -> ((s, d) => Analytics.dqCusum(s, d)),
    "dq_seasonal"           -> (Analytics.dqSeasonal _),
  )

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
    // Per-weekday median band: DuckDB numbers Sunday=0 where Spark's
    // dayofweek is Sunday=1, hence the +1; the 40% band compares in
    // integer-valued doubles on both engines.
    "dq_seasonal" ->
      """WITH daily AS MATERIALIZED (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |med AS (SELECT dayofweek(day) + 1 AS dow, MEDIAN(n) AS med
        |        FROM daily GROUP BY 1)
        |SELECT d.day, CAST(dayofweek(d.day) + 1 AS INT) AS dow,
        |  CAST(d.n AS BIGINT) AS n, ROUND(m.med, 1) AS wd_median,
        |  CASE WHEN d.n * 10.0 < m.med * 6.0 THEN 'low'
        |       WHEN d.n * 10.0 > m.med * 14.0 THEN 'high'
        |       ELSE 'ok' END AS status
        |FROM daily d JOIN med m ON dayofweek(d.day) + 1 = m.dow
        |ORDER BY d.day""".stripMargin,
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
    // column information profile: identical (col,value) counts, same
    // ln seam as text_pmi (ROUND 4), same division spellings
    "dq_entropy" ->
      """WITH u AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders),
        |c AS (SELECT col_name, v, COUNT(*) AS c FROM u GROUP BY 1, 2),
        |t AS (SELECT col_name, SUM(c) AS n FROM c GROUP BY 1)
        |SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  ROUND(-SUM((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))), 4)
        |    AS entropy_nats,
        |  ROUND(1.0 - SUM((c / CAST(n AS DOUBLE)) * (c / CAST(n AS DOUBLE))), 4)
        |    AS gini,
        |  ROUND(MAX(c) / CAST(ANY_VALUE(n) AS DOUBLE), 4) AS mode_share
        |FROM c JOIN t USING (col_name)
        |GROUP BY col_name ORDER BY col_name""".stripMargin,
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
    // Tukey fences: same exact interpolated quartiles (percentile ==
    // quantile_cont), one shared fence expression, e4 floor emissions
    "dq_iqr" ->
      """WITH s AS (
        |  SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3, COUNT(*) AS n
        |  FROM events GROUP BY event_type),
        |f AS (SELECT event_type, q1, q3, n,
        |        q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
        |      FROM s)
        |SELECT e.event_type, CAST(f.n AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  ROUND(SUM(CASE WHEN e.value < f.lo OR e.value > f.hi
        |       THEN 1 ELSE 0 END) / CAST(f.n AS DOUBLE), 6) AS outlier_frac,
        |  CAST(FLOOR(f.q1 * 10000) AS BIGINT) AS q1_e4,
        |  CAST(FLOOR(f.q3 * 10000) AS BIGINT) AS q3_e4,
        |  CAST(FLOOR(f.lo * 10000) AS BIGINT) AS lo_e4,
        |  CAST(FLOOR(f.hi * 10000) AS BIGINT) AS hi_e4
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type, f.n, f.q1, f.q3, f.lo, f.hi
        |ORDER BY e.event_type""".stripMargin,
    "q34_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  ROUND(SUM(l_extendedprice), 2) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q32b_range_multibucket" ->
      """WITH w AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start
        |  FROM events WHERE event_type = 'error')
        |SELECT win_start, COUNT(*) AS n_events
        |FROM events e JOIN w
        |  ON e.ts >= w.win_start AND e.ts < w.win_start + INTERVAL 3 DAY
        |GROUP BY win_start ORDER BY win_start""".stripMargin,
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
    // discrete percentiles return actual data values (exact integers);
    // quantile_disc matches PERCENTILE_DISC's smallest-reaching rule
    "q59_percentile_disc" ->
      """SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(quantile_disc(c, 0.25) AS BIGINT) AS p25_disc,
        |  CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_disc,
        |  CAST(quantile_disc(c, 0.75) AS BIGINT) AS p75_disc,
        |  CAST(quantile_cont(c, 0.5) * 2 AS BIGINT) AS p50_cont_x2
        |FROM (SELECT l_returnflag,
        |        CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY g""".stripMargin,
    // Tolerance oracle (the q22b shape): the engine emits the exact
    // discrete percentiles plus approx_ok = the GK sketch estimate
    // landed in the exact q±0.002 discrete-value band. DuckDB
    // recomputes the exact values and asserts TRUE — a drifting
    // sketch flips the flag and fails the hash compare.
    "q59b_approx_percentile_disc" ->
      """SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(quantile_disc(c, 0.25) AS BIGINT) AS p25_disc,
        |  CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_disc,
        |  CAST(quantile_disc(c, 0.75) AS BIGINT) AS p75_disc,
        |  TRUE AS approx_ok
        |FROM (SELECT l_returnflag,
        |        CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        |      FROM lineitem)
        |GROUP BY l_returnflag ORDER BY g""".stripMargin,
    // bitwise folds are order-insensitive (XOR/AND/OR are commutative
    // monoids), so any partial-aggregation tree agrees bit-for-bit
    "q58_bitwise_agg" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, bit_or(1::BIGINT << l_linenumber) AS mask,
        |    bit_xor(CAST(l_partkey AS BIGINT)) AS xr
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  bit_xor(xr) AS xor_all, bit_and(xr) AS and_all
        |FROM per_order GROUP BY mask ORDER BY mask""".stripMargin,
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
    // key-sequence completeness: bucket-local islands-and-gaps — the
    // same lag-within-span and edge-run closure, replayed in SQL
    "dq_gaps" ->
      """WITH k AS (SELECT o_orderkey AS k, o_orderkey // 1024 AS bucket
        |  FROM orders),
        |runs AS (SELECT bucket, k,
        |    k - COALESCE(LAG(k) OVER (PARTITION BY bucket ORDER BY k),
        |                 bucket * 1024 - 1) - 1 AS run_before
        |  FROM k)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_present,
        |  CAST(1024 - COUNT(*) AS BIGINT) AS n_missing,
        |  CAST(SUM(CASE WHEN run_before > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gaps_interior,
        |  CAST(GREATEST(MAX(run_before),
        |    MAX(bucket) * 1024 + 1023 - MAX(k)) AS BIGINT) AS max_run
        |FROM runs GROUP BY bucket ORDER BY bucket""".stripMargin,
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
