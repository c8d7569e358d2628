package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** ML + graph tier: ml_* trainers/metrics and graph_* algorithms.
  *
  * Split from the monolithic SparkEntry registry (round-12 hygiene);
  * keys and SQL are unchanged.
  */
object MlRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_kcore"           -> (Graph.graphKCore _),
    "ml_kmeans"             -> (LlmQueries.mlKmeans _),
    "ml_linreg"             -> (Regression.mlLinReg _),
    "ml_conformal"          -> (Regression.mlConformal _),
    "ml_logreg"             -> (LogReg.mlLogReg _),
    "ml_calibration"        -> (LogReg.mlCalibration _),
    "ml_pca_power"          -> (Pca.mlPcaPower _),
    "ml_pca_top3"           -> (Pca.mlPcaTop3 _),
    "ml_naive_bayes"        -> (NaiveBayes.mlNaiveBayes _),
    "graph_pagerank"        -> (Graph.graphPageRank _),
    "graph_ppr"             -> (Graph.graphPpr _),
    "graph_katz"            -> (Graph.graphKatz _),
    "graph_assortativity"   -> (Graph.graphAssortativity _),
    "graph_reciprocity"     -> (Graph.graphReciprocity _),
    "graph_triangles"       -> (Graph.graphTriangles _),
    "graph_transitivity"    -> (Graph.graphTransitivity _),
    "graph_labelprop"       -> (Graph.graphLabelProp _),
    "graph_bfs"             -> (Graph.graphBfs _),
    "graph_eccentricity"    -> (Graph.graphEccentricity _),
    "graph_degree_hist"     -> (Graph.graphDegreeHist _),
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
    "ml_lift"               -> (Metrics.mlLift _),
    "ml_abtest"             -> (Metrics.mlAbTest _),
    "ml_anova"              -> (Metrics.mlAnova _),
    "ml_kaplan_meier"       -> (Metrics.mlKaplanMeier _),
    "ml_roc_points"         -> (Metrics.mlRocPoints _),
    "ml_pinball"            -> (Metrics.mlPinball _),
    "ml_parity"             -> (Metrics.mlParity _),
    "ml_pr_auc"             -> (Metrics.mlPrAuc _),
    "ml_knn"                -> (Metrics.mlKnn _),
    "ml_prf"                -> (Metrics.mlPrf _),
    "ml_mcc"                -> (Metrics.mlMcc _),
    "ml_boosted_stumps"     -> (Regression.mlBoostedStumps _),
    "ml_bagging"            -> (Regression.mlBagging _),
    "ml_target_encode"      -> (Regression.mlTargetEncode _),
    "graph_hits"            -> (Graph.graphHits _),
    "graph_scc"             -> (Graph.graphScc _),
    "ml_apriori"            -> (Associations.marketBasket _),
  )

  def oracleSql: Map[String, String] = Map(
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
    // Global transitivity 3T/W off the same oriented-triangle CTEs:
    // wedges and triangle incidences are one aggregate over the
    // per-node frame, the ratio a single rounded division
    "graph_transitivity" ->
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
        |agg AS (SELECT COUNT(*) AS n_nodes,
        |          SUM(d * (d - 1)) AS wd2,
        |          (SELECT 3 * COUNT(*) FROM tri) AS t3
        |        FROM deg)
        |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(wd2 // 2 AS BIGINT) AS wedges,
        |  CAST(t3 // 3 AS BIGINT) AS n_triangles,
        |  CASE WHEN wd2 = 0 THEN 0.0
        |       ELSE ROUND(2.0 * t3 / wd2, 6) END AS transitivity
        |FROM agg""".stripMargin,
    // Unrolled 5-iteration damped power iteration (the engine's recurrence
    // verbatim: per-iteration ROUND(.,6) re-pins the compounding float
    // noise, no dangling redistribution — Graph.pageRank's contract).
    "graph_ppr" -> Graph.pprOracleSql(),
    "graph_katz" -> Graph.katzOracleSql(),
    "graph_assortativity" -> Graph.assortativityOracleSql(),
    "graph_reciprocity" -> Graph.reciprocityOracleSql(),
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
    // split-conformal: md5 folds, train-only OLS (rounded betas), the
    // k-th-smallest calibration score at the INTEGER rank
    // (9(n+1)+9)//10, coverage on test — every stage engine-portable
    "ml_conformal" -> {
      val fit = Regression.fitSql.take(3)
        .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
      val score = Regression.conformalScoreSql
      s"""WITH v AS (
         |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
         |    CAST(ROUND(l_extendedprice) AS BIGINT) AS y,
         |    ('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15))
         |      ::BIGINT % 10 AS fold
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
         |  FROM v WHERE fold < 6 GROUP BY l_returnflag),
         |ft AS (SELECT l_returnflag, $fit FROM st),
         |calsc AS (
         |  SELECT v.l_returnflag, x1, x2, y, $score AS score
         |  FROM v JOIN ft USING (l_returnflag)
         |  WHERE fold >= 6 AND fold < 8),
         |q AS (SELECT l_returnflag, n_cal, score AS qh FROM (
         |    SELECT l_returnflag, score,
         |      ROW_NUMBER() OVER (PARTITION BY l_returnflag
         |        ORDER BY score, x1, x2, y) AS rn,
         |      CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT)
         |        AS n_cal
         |    FROM calsc)
         |  WHERE rn = (9 * (n_cal + 1) + 9) // 10),
         |tst AS (
         |  SELECT v.l_returnflag, $score AS score
         |  FROM v JOIN ft USING (l_returnflag) WHERE fold >= 8)
         |SELECT t.l_returnflag, MAX(q.n_cal) AS n_cal,
         |  CAST(COUNT(*) AS BIGINT) AS n_test,
         |  ROUND(MAX(q.qh), 4) AS q_hat,
         |  CAST(SUM(CASE WHEN t.score <= q.qh THEN 1 ELSE 0 END)
         |    AS BIGINT) AS covered,
         |  ROUND(SUM(CASE WHEN t.score <= q.qh THEN 1 ELSE 0 END)
         |    / CAST(COUNT(*) AS DOUBLE), 4) AS coverage
         |FROM tst t JOIN q USING (l_returnflag)
         |GROUP BY 1 ORDER BY 1""".stripMargin
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
    // degree histogram over the undirected simple star graph;
    // cumulative share in integer micro-units
    "graph_degree_hist" ->
      """WITH st AS (
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_brand, p_size)
        |        AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub
        |  UNION ALL
        |  SELECT p, hub FROM (
        |    SELECT CAST(p_partkey AS BIGINT) AS p,
        |      CAST(MIN(p_partkey) OVER (PARTITION BY p_type) AS BIGINT) AS hub
        |    FROM part) WHERE p <> hub),
        |e0 AS (SELECT p AS src, hub AS dst FROM st
        |       UNION ALL SELECT hub, p FROM st),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |        FROM e0 WHERE src != dst),
        |deg AS (SELECT n, COUNT(*) AS d FROM
        |    (SELECT u AS n FROM und UNION ALL SELECT v FROM und) x
        |  GROUP BY n),
        |h AS (SELECT d, COUNT(*) AS n_nodes FROM deg GROUP BY d),
        |c AS (SELECT d, n_nodes,
        |        SUM(n_nodes) OVER (ORDER BY d
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        SUM(n_nodes) OVER () AS tot
        |      FROM h)
        |SELECT CAST(d AS BIGINT) AS degree, CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(cum * 1000000 // tot AS BIGINT) AS cum_share_e6
        |FROM c ORDER BY degree""".stripMargin,
    // Double-sweep replayed: first unrolled BFS from 0, the (d DESC,
    // node) LIMIT 1 pick, then a second unrolled BFS from that node
    "graph_eccentricity" -> {
      def sweep(pfx: String, seed: String) = {
        val rounds = (1 to 3).map { i =>
          s"""$pfx$i AS (SELECT COALESCE(p.node, m.node) AS node,
             |  LEAST(COALESCE(p.d, m.nd), COALESCE(m.nd, p.d)) AS d
             |  FROM $pfx${i - 1} p FULL OUTER JOIN (
             |    SELECT e.dst AS node, MIN(l.d) + 1 AS nd
             |    FROM e JOIN $pfx${i - 1} l ON l.node = e.src
             |    GROUP BY e.dst) m ON p.node = m.node)""".stripMargin
        }.mkString(",\n")
        s"$pfx" + "0 AS (" + seed + "),\n" + rounds
      }
      s"""WITH e AS (
         |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
         |         CAST(s.s_nationkey AS BIGINT) AS dst
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
         |${sweep("d", "SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS d")},
         |u AS (SELECT node, d FROM d3 ORDER BY d DESC, node LIMIT 1),
         |${sweep("s", "SELECT node, CAST(0 AS BIGINT) AS d FROM u")}
         |SELECT CAST(0 AS BIGINT) AS pivot, u.node AS far_node,
         |  u.d AS ecc_pivot,
         |  (SELECT MAX(d) FROM s3) AS pseudo_diameter,
         |  (SELECT COUNT(*) FROM s3) AS n_reached
         |FROM u""".stripMargin
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
    "ml_bagging" -> Regression.baggingOracleSql(),
    // smoothed target encoding: identical integer n/Σy per category,
    // identical prior and shrinkage division, floor-quantized
    "ml_target_encode" ->
      """WITH f AS (
        |  SELECT CAST(s.s_nationkey AS BIGINT) AS cat,
        |    CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |pc AS (SELECT cat, COUNT(*) AS n, SUM(y) AS s FROM f GROUP BY cat),
        |pr AS (SELECT CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
        |         AS prior FROM pc)
        |SELECT cat, CAST(n AS BIGINT) AS n,
        |  CAST(FLOOR(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 100) AS BIGINT)
        |    AS raw_mean_e2,
        |  CAST(FLOOR((CAST(s AS DOUBLE) + 50.0 * prior)
        |    / CAST(n + 50 AS DOUBLE) * 100) AS BIGINT) AS code_e2,
        |  CAST(FLOOR(prior * 100) AS BIGINT) AS prior_e2
        |FROM pc, pr ORDER BY cat""".stripMargin,
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
    "ml_lift" -> Metrics.mlLiftOracle,
    "ml_abtest" -> Metrics.mlAbTestOracle,
    "ml_anova" -> Metrics.mlAnovaOracle,
    "ml_kaplan_meier" -> Metrics.mlKaplanMeierOracle,
    "ml_roc_points" -> Metrics.mlRocPointsOracle,
    "ml_pinball" -> Metrics.mlPinballOracle,
    "ml_parity" -> Metrics.mlParityOracle,
    "ml_mcc" -> Metrics.mlMccOracle,
    "ml_pr_auc" -> Metrics.mlPrAucOracle,
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
    // Unrolled 2-round HITS with the engine's exact integer discipline:
    // ppm max-normalization by floor division at every half-step (edge
    // weights, then each auth/hub frame) — every sum an exact 64-bit
    // integer, so both engines are bit-identical at any order.
    "graph_hits" ->
      """WITH e0 AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst,
        |         CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT src, dst, w * 1000000 // (SELECT MAX(w) FROM e0) AS wn
        |  FROM e0),
        |nodes AS MATERIALIZED (
        |  SELECT src AS node FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
        |a1r AS (SELECT e.dst AS node, SUM(e.wn * h.h) AS araw
        |        FROM e JOIN h0 h ON h.node = e.src GROUP BY 1),
        |a1 AS MATERIALIZED (
        |  SELECT n.node,
        |    CAST(CAST(COALESCE(r.araw, 0) AS HUGEINT) * 1000000 // (SELECT MAX(araw) FROM a1r) AS BIGINT) AS a
        |  FROM nodes n LEFT JOIN a1r r ON r.node = n.node),
        |h1r AS (SELECT e.src AS node, SUM(e.wn * a.a) AS hraw
        |        FROM e JOIN a1 a ON a.node = e.dst GROUP BY 1),
        |h1 AS MATERIALIZED (
        |  SELECT n.node,
        |    CAST(CAST(COALESCE(r.hraw, 0) AS HUGEINT) * 1000000 // (SELECT MAX(hraw) FROM h1r) AS BIGINT) AS h
        |  FROM nodes n LEFT JOIN h1r r ON r.node = n.node),
        |a2r AS (SELECT e.dst AS node, SUM(e.wn * h.h) AS araw
        |        FROM e JOIN h1 h ON h.node = e.src GROUP BY 1),
        |a2 AS MATERIALIZED (
        |  SELECT n.node,
        |    CAST(CAST(COALESCE(r.araw, 0) AS HUGEINT) * 1000000 // (SELECT MAX(araw) FROM a2r) AS BIGINT) AS a
        |  FROM nodes n LEFT JOIN a2r r ON r.node = n.node),
        |h2r AS (SELECT e.src AS node, SUM(e.wn * a.a) AS hraw
        |        FROM e JOIN a2 a ON a.node = e.dst GROUP BY 1),
        |h2 AS MATERIALIZED (
        |  SELECT n.node,
        |    CAST(CAST(COALESCE(r.hraw, 0) AS HUGEINT) * 1000000 // (SELECT MAX(hraw) FROM h2r) AS BIGINT) AS h
        |  FROM nodes n LEFT JOIN h2r r ON r.node = n.node)
        |SELECT a2.node, na.n_name, a2.a AS auth_ppm, h2.h AS hub_ppm
        |FROM a2 JOIN h2 ON a2.node = h2.node
        |JOIN nation na ON a2.node = na.n_nationkey
        |ORDER BY a2.node""".stripMargin,
    // SCC is definitional, so the oracle needs no recurrence replay:
    // reach = recursive closure, scc_id(v) = MIN over mutual reach
    // (self included) — the engine's closure-squaring must land on the
    // same fixed point exactly.
    "graph_scc" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        |         CAST(s.s_nationkey AS BIGINT) AS dst,
        |         CAST(COUNT(*) AS DOUBLE) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |kept AS MATERIALIZED (
        |  SELECT src, dst
        |  FROM e0, (SELECT quantile_cont(w, 0.7) AS q FROM e0) qs
        |  WHERE w > q AND src <> dst),
        |nodes AS MATERIALIZED (
        |  SELECT src AS node FROM kept UNION SELECT dst FROM kept),
        |reach AS (
        |  SELECT src, dst FROM kept
        |  UNION
        |  SELECT r.src, k.dst FROM reach r JOIN kept k ON r.dst = k.src),
        |c AS MATERIALIZED (
        |  SELECT src, dst FROM reach
        |  UNION SELECT node, node FROM nodes),
        |m AS MATERIALIZED (
        |  SELECT a.src AS node, MIN(a.dst) AS scc_id
        |  FROM c a JOIN c b ON a.src = b.dst AND a.dst = b.src
        |  GROUP BY a.src),
        |sz AS (SELECT scc_id, COUNT(*) AS scc_size FROM m GROUP BY scc_id)
        |SELECT m.node, n.n_name, m.scc_id,
        |  CAST(sz.scc_size AS BIGINT) AS scc_size
        |FROM m JOIN sz USING (scc_id)
        |JOIN nation n ON m.node = n.n_nationkey
        |ORDER BY m.node""".stripMargin,
    // Same three Apriori stages: distinct collapse, frequent-1 prune
    // with HAVING, basket self-join; metrics are the same composed
    // integer divisions.
    "ml_apriori" ->
      """WITH bi AS MATERIALIZED (
        |  SELECT DISTINCT CAST(l.l_orderkey AS BIGINT) AS basket,
        |                  p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (SELECT COUNT(DISTINCT basket) AS nb FROM bi),
        |f1 AS MATERIALIZED (
        |  SELECT item, COUNT(*) AS cnt FROM bi GROUP BY item
        |  HAVING COUNT(*) * 1000000 >= 20000 * (SELECT nb FROM nb)),
        |bif AS MATERIALIZED (
        |  SELECT bi.basket, bi.item, f1.cnt
        |  FROM bi JOIN f1 ON bi.item = f1.item),
        |pairs AS (
        |  SELECT x.item AS b1, y.item AS b2, x.cnt AS cnt1, y.cnt AS cnt2,
        |         COUNT(*) AS pair_cnt
        |  FROM bif x JOIN bif y ON x.basket = y.basket AND x.item < y.item
        |  GROUP BY 1, 2, 3, 4
        |  HAVING COUNT(*) * 1000000 >= 20000 * (SELECT nb FROM nb))
        |SELECT b1, b2, pair_cnt, cnt1, cnt2,
        |  pair_cnt * 1000000 // cnt1 AS conf_ppm,
        |  (pair_cnt * 1000000 // cnt1) * (SELECT nb FROM nb) // cnt2
        |    AS lift_ppm
        |FROM pairs
        |ORDER BY pair_cnt DESC, b1, b2 LIMIT 20""".stripMargin,
  )
}
