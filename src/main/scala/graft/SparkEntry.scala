package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Queries

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
    "q14_string_functions"  -> (Queries.q14 _),
    "q15_datetime"          -> (Queries.q15 _),
    "q16_global_topk"       -> (Queries.q16 _),
    "q17_intersect"         -> (Queries.q17 _),
    "q17b_except"           -> (Queries.q17b _),
    "q17c_union_all"        -> (Queries.q17c _),
    "q18_json_extract"      -> (Queries.q18 _),
    "q19_cosine_topk"       -> (Queries.q19 _),
    "q20_time_bucket_agg"   -> (Queries.q20 _),
  )

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
  )
}
