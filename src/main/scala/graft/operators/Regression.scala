package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Closed-form linear regression via sufficient statistics — the
  * "distributed ML without an iterative solver" pattern: a two-feature
  * OLS fit `y = β0 + β1·x1 + β2·x2` needs only the per-group sums
  * (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y, plus Σy² for R²),
  * which ONE map-side-combined aggregate produces; the 3×3 normal
  * equations then solve row-locally by Cramer's rule on the tiny
  * aggregated frame. This is how regression actually runs at 100 TB —
  * the fact table is touched exactly once, nothing iterative, no driver
  * round-trips, and the shuffle carries |groups| rows of ten doubles.
  *
  * Determinism contract: callers pass INTEGER-TYPED columns. The
  * sufficient statistics aggregate in the INPUT type — for LONG inputs
  * every partial and final sum (including Σy²) is exact 64-bit integer
  * arithmetic, order-independent up to 2^63, matching an oracle engine's
  * exact integer summation (DuckDB sums BIGINT into HUGEINT) — and only
  * the finished statistics are cast to double, so the closed-form
  * determinant arithmetic is the identical IEEE expression tree on
  * identical inputs: bit-for-bit reproducible. (Summing doubles instead
  * would be order-dependent past 2^53 — Σy² over whole-dollar prices
  * crosses that near sf1 — fine for statistics, fatal for a
  * hash-compared oracle. Past 2^63 the LONG sum fails loudly under ANSI
  * overflow checking rather than drifting silently; rescale y there.)
  */
object Regression {

  /** Cramer determinants for the normal system
    *   [ n   s1  s2  ] [b0]   [ sy  ]
    *   [ s1  s11 s12 ] [b1] = [ s1y ]
    *   [ s2  s12 s22 ] [b2]   [ s2y ]
    * as SQL strings — det, then the three numerators — shared verbatim
    * by the Spark plan and the DuckDB oracle so both engines evaluate
    * the same operations in the same order.
    */
  private[graft] val cramerSql: Seq[String] = Seq(
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)" +
      " + s2 * (s1 * s12 - s11 * s2))",
    "(sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)" +
      " + s2 * (s1y * s12 - s11 * s2y))",
    "(n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2)" +
      " + s2 * (s1 * s2y - s1y * s2))",
    "(n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)" +
      " + sy * (s1 * s12 - s11 * s2))")

  /** The closing projection (betas + R² + n) over the sufficient-stats
    * columns, shared by both engines.
    */
  private[graft] def fitSql: Seq[(String, String)] = {
    val Seq(det, d0, d1, d2) = cramerSql
    Seq(
      "beta0" -> s"ROUND($d0 / $det, 6)",
      "beta1" -> s"ROUND($d1 / $det, 6)",
      "beta2" -> s"ROUND($d2 / $det, 6)",
      "r2" -> (s"ROUND(1.0 - (syy - (($d0 / $det) * sy + ($d1 / $det) * s1y" +
        s" + ($d2 / $det) * s2y)) / (syy - sy * sy / n), 6)"),
      "n" -> "CAST(n AS BIGINT)")
  }

  /** The sufficient-statistics aggregate behind [[olsTwoFeature]] and
    * [[mlRidge]]: ONE map-side-combined pass in the INPUT type (exact
    * long arithmetic for integer-typed callers — the determinism
    * contract above); the cast to double happens on the FINISHED
    * statistics, after the last partial merge, mirroring the oracle's
    * CAST(SUM(..) AS DOUBLE).
    */
  private[graft] def suffStats(df: DataFrame, groupCol: String, x1: Column,
                               x2: Column, y: Column): DataFrame = {
    val raw = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x1).as("s1"),
        sum(x2).as("s2"),
        sum(y).as("sy"),
        sum(x1 * x1).as("s11"),
        sum(x1 * x2).as("s12"),
        sum(x2 * x2).as("s22"),
        sum(x1 * y).as("s1y"),
        sum(x2 * y).as("s2y"),
        sum(y * y).as("syy"))
    val statCols = Seq("n", "s1", "s2", "sy", "s11", "s12", "s22",
      "s1y", "s2y", "syy")
    raw.select(
      col(groupCol) +: statCols.map(c => col(c).cast("double").as(c)): _*)
  }

  /** The row-local Cramer solve over a sufficient-statistics frame. */
  private[graft] def fitFromStats(stats: DataFrame,
                                  groupCol: String): DataFrame =
    stats.select(col(groupCol) +: fitSql.map { case (name, sql) =>
      expr(sql).as(name) }: _*)

  /** Per-group OLS with intercept over two regressors: one aggregate
    * pass, then the row-local Cramer solve.
    */
  def olsTwoFeature(df: DataFrame, groupCol: String, x1: Column, x2: Column,
                    y: Column): DataFrame =
    fitFromStats(suffStats(df, groupCol, x1, x2, y), groupCol)

  /** Registered query: whole-dollar price regressed on quantity and
    * discount-in-cents per return flag. The columns stay LONG into the
    * aggregate, so every sufficient statistic (including Σy² ≈ 1.4e9 per
    * row) is exact integer arithmetic to 2^63 — order-independent at any
    * scale factor the sum can represent, matching DuckDB's exact BIGINT
    * summation.
    */
  def mlLinReg(s: SparkSession, dir: String): DataFrame =
    olsTwoFeature(
      Tables.load(s, dir, "lineitem"),
      "l_returnflag",
      col("l_quantity").cast("long"),
      round(col("l_discount") * 100).cast("long"),
      round(col("l_extendedprice")).cast("long"))
      .orderBy("l_returnflag")

  /** The shared conformity score: |y − ŷ| under the ROUNDED OLS betas
    * ([[fitSql]] emits 6-dp betas, so both engines predict from the
    * same doubles) — one IEEE expression tree, reused verbatim by the
    * oracle.
    */
  private[graft] val conformalScoreSql: String =
    "abs(CAST(y AS DOUBLE) - (beta0 + beta1 * CAST(x1 AS DOUBLE)" +
      " + beta2 * CAST(x2 AS DOUBLE)))"

  /** ml_conformal — split-conformal prediction intervals (Vovk's
    * inductive conformal regression; Lei et al. 2018): the
    * distribution-free coverage guarantee for ANY point predictor.
    * The portable-hash fold (the [[Prep]] split convention: md5 of the
    * row key, engine-reproducible, no RNG state) carves
    * train (60%) / calibration (20%) / test (20%); the [[mlLinReg]]
    * closed-form OLS fits per group on train only; the conformal
    * radius q̂ is the ⌈(1−α)(n+1)⌉-th smallest calibration score at
    * α = 0.1 — computed with the INTEGER rank (9(n+1)+9) div 10, so no
    * engine's 0.9·(n+1) float spelling can straddle a ceil boundary —
    * and the row reports the guaranteed-≥90% empirical coverage on the
    * held-out test fold.
    *
    * Determinism: folds are md5-exact; betas are 6-dp-rounded doubles
    * from exact integer sufficient statistics; scores are one shared
    * expression over identical inputs; the quantile is a rank-selected
    * ORDER STATISTIC (the k-th smallest VALUE is multiset-determined —
    * ties cannot move it); coverage counts compare identical doubles.
    *
    * Scale: fit is one map-side-combined aggregate; calibration
    * ranking is a per-group sort (3 groups — the q59 ordered-statistic
    * class, spill-backed; the sketch path for a wide-group corpus is
    * approx_percentile on the scores, the q22b convention); the test
    * pass is a broadcast join + one aggregate.
    */
  def mlConformal(s: SparkSession, dir: String): DataFrame =
    conformalCore(Tables.load(s, dir, "lineitem").select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"),
      round(col("l_extendedprice")).cast("long").as("y"),
      (Hashing.md5Long(concat_ws("-", col("l_orderkey"),
        col("l_linenumber"))) % 10).as("fold")))

  /** The frame-level conformal pipeline over a prepared
    * (l_returnflag, x1, x2, y, fold) frame — [[mlConformal]] minus the
    * lineitem binding, reusable by the scalecheck harness.
    */
  private[graft] def conformalCore(base0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one materialization serves the three consumers (fit aggregate,
    // calibration rank, test aggregate) — without the barrier each
    // re-scans the source and re-hashes every row's fold (measured
    // 4.6 s → ~2.5 s at sf0.1)
    val base = base0.localCheckpoint(true)
    val fit = fitFromStats(
      suffStats(base.filter(col("fold") < 6), "l_returnflag",
        col("x1"), col("x2"), col("y")), "l_returnflag")
      .select(col("l_returnflag"), col("beta0"), col("beta1"), col("beta2"))
    val cal = base.filter(col("fold") >= 6 && col("fold") < 8)
      .join(broadcast(fit), Seq("l_returnflag"))
      .withColumn("score", expr(conformalScoreSql))
    val wq = Window.partitionBy("l_returnflag")
      .orderBy(col("score"), col("x1"), col("x2"), col("y"))
    val wc = Window.partitionBy("l_returnflag")
    val qhat = cal
      .withColumn("rn", row_number().over(wq))
      .withColumn("n_cal", count(lit(1)).over(wc))
      .filter(col("rn") === expr("(9 * (n_cal + 1) + 9) DIV 10"))
      .select(col("l_returnflag"), col("n_cal"), col("score").as("qh"))
    base.filter(col("fold") >= 8)
      .join(broadcast(fit), Seq("l_returnflag"))
      .withColumn("score", expr(conformalScoreSql))
      .join(broadcast(qhat), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(max("n_cal").as("n_cal"),
        count(lit(1)).as("n_test"),
        round(max("qh"), 4).as("q_hat"),
        sum(when(col("score") <= col("qh"), 1L).otherwise(0L)).as("covered"))
      .select(col("l_returnflag"), col("n_cal"), col("n_test"), col("q_hat"),
        col("covered"),
        round(col("covered") / col("n_test"), 4).as("coverage"))
      .orderBy("l_returnflag")
  }

  /** The two-sided SSE of a split, evaluated in DOUBLE over EXACT
    * integer sufficient statistics — shared verbatim with the oracle so
    * both engines run the identical IEEE expression tree.
    */
  private[graft] val sseLeftSql: String =
    "(CAST(ssl AS DOUBLE) - (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))" +
      " / CAST(nl AS DOUBLE))"
  private[graft] val sseRightSql: String =
    "(CAST(ssr AS DOUBLE)" +
      " - (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / CAST(nr AS DOUBLE))"
  private[graft] val stumpSseSql: String =
    s"($sseLeftSql + $sseRightSql)"

  /** ml_stump — exact best-split search for a regression decision stump
    * (predict whole-dollar price from quantity), the CART building
    * block, run relationally: per-feature-value sufficient statistics
    * (n, Σy, Σy² — one map-side-combined aggregate, the fact table
    * collapses to |distinct feature values| rows inside the scan
    * stage), prefix sums over that bounded frame give every candidate
    * threshold's left/right stats in one window pass, and the split SSE
    * `Σy²−(Σy)²/n` per side falls out row-locally. No per-candidate
    * rescan, no iteration: the classic O(n log n) single-machine stump
    * is here one aggregate + one O(distinct values) window — the shape
    * that survives 100 TB (the [[graft.operators.Analytics.histogram]]
    * bounded-frame argument; deeper trees recurse on the leaf
    * predicate, same plan per node).
    *
    * Determinism: y is whole dollars (floor-quantized long), so n/Σy/Σy²
    * and all prefix sums are exact 64-bit integers at any partial-sum
    * order (Σy² ≈ 1.2e10/row ⇒ exact beyond sf10); the only floating
    * math is the final SSE/mean division over identical integers —
    * bit-reproducible on any engine ([[olsTwoFeature]]'s contract).
    */
  /** All candidate splits of a stump on integer feature `fCol` /
    * integer target `tCol`: per-feature-value sufficient stats, prefix
    * sums over the bounded distinct-value frame, exact left/right
    * integer stats plus the shared double SSE. The reusable core of
    * [[mlStump]] and [[mlBoostedStumps]].
    */
  private[graft] def stumpSplits(df: DataFrame, fCol: String,
                                 tCol: String): DataFrame =
    stumpSplitsFromStats(df.groupBy(col(fCol).as("q")).agg(
      count(lit(1)).as("n"), sum(tCol).as("s"),
      sum(col(tCol) * col(tCol)).as("ss")))

  /** [[stumpSplits]] over PRE-AGGREGATED per-value sufficient statistics
    * (q, n, Σy, Σy²) — the building block that lets a caller share ONE
    * fact-scan aggregate across several related searches (ml_cv's three
    * leave-one-fold-out trains re-sum the same per-(q, fold) integer
    * stats — integer sums compose exactly, so the result is
    * bit-identical to aggregating each fold's raw rows).
    */
  private[graft] def stumpSplitsFromStats(perQ: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPre = Window.orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perQ.select(col("q"),
        sum("n").over(wPre).as("nl"), sum("s").over(wPre).as("sl"),
        sum("ss").over(wPre).as("ssl"),
        sum("n").over(wAll).as("nt"), sum("s").over(wAll).as("st"),
        sum("ss").over(wAll).as("sst"))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("ssr", col("sst") - col("ssl"))
      .filter(col("nr") > 0)
      .withColumn("ml", expr("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"))
      .withColumn("mr", expr("CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)"))
      .withColumn("sse", expr(stumpSseSql))
  }

  def mlStump(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("v"))
    // Emissions are FLOOR-QUANTIZED integer units (means in 1e-4
    // dollars, SSE in cents), not ROUND: at sf0.01 the threshold-46
    // split's SSE is exactly …551.625 (a 3-fractional-bit double,
    // a true decimal tie) and Spark's BigDecimal HALF_UP ROUND gives
    // …551.63 while DuckDB's double round gives …551.62. floor of the
    // identical double is identical on any engine (the q49 precedent).
    stumpSplits(li, "q", "v")
      .select(col("q").as("threshold"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        floor(col("ml") * 10000).cast("long").as("mean_left_e4"),
        floor(col("mr") * 10000).cast("long").as("mean_right_e4"),
        floor(col("sse") * 100).cast("long").as("sse_cents"))
      .orderBy(col("sse_cents"), col("threshold"))
      .limit(3)
  }

  /** ml_boosted_stumps — 3 rounds of gradient boosting with stump base
    * learners (squared loss: each round fits the previous round's
    * residuals, alternating features), run relationally end to end:
    * per round ONE aggregate over the fact frame + an O(distinct
    * values) window picks the exact best split, the 1-row winner
    * broadcast-joins back, and residuals re-quantize to integers —
    * the boosting recurrence at one-fact-scan-per-round cost, the
    * shape that survives 100 TB (deeper ensembles are more rounds of
    * the same plan, not a different algorithm).
    *
    * Determinism (the ml_logreg bit-exact-training discipline):
    * targets START as whole dollars; round 1's residuals quantize to
    * DECI-dollars (`floor(r·10+0.5)`) and every later round
    * re-quantizes residuals at that SAME fixed unit (`floor(r+0.5)`) —
    * residual magnitude is bounded by the leaf span, so targets stay
    * ≤ ~2e6 at every round and Σt² stays exact in 64-bit integers at
    * any partial-sum order and scale factor (a per-round ×10 scale
    * inflation would overflow Σt² by round 3 at sf0.1 — measured on
    * paper, rejected). Leaf means, the SSE argmin, and the per-round
    * RMSE are then identical IEEE expressions over identical integers
    * on any engine. The oracle unrolls the same 3 rounds as
    * MATERIALIZED CTEs built from the same shared SQL fragments.
    */
  def mlBoostedStumps(s: SparkSession, dir: String): DataFrame = {
    val feats = boostedFeats
    var li = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q1"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("q2"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("t"))
      .localCheckpoint(true)
    var outs = List.empty[DataFrame]
    for (k <- feats.indices) {
      val (fname, fcol) = feats(k)
      val best = stumpSplits(li, fcol, "t")
        .orderBy(col("sse"), col("q")).limit(1)
        .localCheckpoint(true) // 1 row; pins the pick for reuse below
      val mult = if (k == 0) 10 else 1 // dollars→deci once, then fixed unit
      val nextLi = li
        .crossJoin(broadcast(best.select(col("q").as("bq"),
          col("ml").as("bml"), col("mr").as("bmr"))))
        .withColumn("t", floor((col("t").cast("double") -
          when(col(fcol) <= col("bq"), col("bml")).otherwise(col("bmr"))) *
          mult + 0.5).cast("long"))
        .select("q1", "q2", "t")
        .localCheckpoint(true)
      // per-round RMSE in ORIGINAL dollars from the exact integer
      // residual sum-of-squares (fixed deci-dollar unit from round 1 on)
      val rmse = nextLi.agg(
        expr("SQRT(CAST(SUM(t * t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))" +
          " / 10.0").as("g_rmse"))
      outs ::= best.crossJoin(broadcast(rmse)).select(
        lit(k + 1).as("round"), lit(fname).as("feature"),
        col("q").as("threshold"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        floor(col("ml") * 10000).cast("long").as("mean_left_e4"),
        floor(col("mr") * 10000).cast("long").as("mean_right_e4"),
        floor(col("sse") * 100).cast("long").as("sse_cents"),
        floor(col("g_rmse") * 10000).cast("long").as("rmse_e4"))
      li = nextLi
    }
    outs.reduce(_ unionByName _).orderBy("round")
  }

  /** (feature label, column) per boosting round — shared with the
    * oracle builder.
    */
  private[graft] val boostedFeats: Seq[(String, String)] =
    Seq(("l_quantity", "q1"), ("l_discount", "q2"), ("l_quantity", "q1"))

  /** The oracle: the same 3-round recurrence unrolled as MATERIALIZED
    * CTEs, every formula shared textually with the engine
    * ([[stumpSseSql]], the `floor(r·10+0.5)` re-quantization, the
    * (sse, q) argmin).
    */
  def boostedOracleSql(): String = {
    val rounds = boostedFeats.indices.map { k =>
      val (_, fcol) = boostedFeats(k)
      val mult = if (k == 0) 10 else 1
      s"""perq_$k AS MATERIALIZED (
         |  SELECT $fcol AS q, COUNT(*) AS n, SUM(t) AS s, SUM(t * t) AS ss
         |  FROM li_$k GROUP BY 1),
         |pre_$k AS (
         |  SELECT q,
         |    SUM(n) OVER w AS nl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl,
         |    SUM(n) OVER () AS nt, SUM(s) OVER () AS st, SUM(ss) OVER () AS sst
         |  FROM perq_$k
         |  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |sp_$k AS (
         |  SELECT q, nl, sl, ssl, nt - nl AS nr, st - sl AS sr,
         |    sst - ssl AS ssr
         |  FROM pre_$k WHERE nt - nl > 0),
         |best_$k AS MATERIALIZED (
         |  SELECT q, nl, nr,
         |    CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS ml,
         |    CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mr,
         |    $stumpSseSql AS sse
         |  FROM sp_$k ORDER BY $stumpSseSql, q LIMIT 1),
         |li_${k + 1} AS MATERIALIZED (
         |  SELECT q1, q2,
         |    CAST(FLOOR((CAST(t AS DOUBLE) -
         |      CASE WHEN $fcol <= b.q THEN b.ml ELSE b.mr END) * $mult + 0.5)
         |      AS BIGINT) AS t
         |  FROM li_$k, best_$k b),
         |rmse_$k AS (
         |  SELECT SQRT(CAST(SUM(t * t) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         |    / 10.0 AS g_rmse
         |  FROM li_${k + 1})""".stripMargin
    }
    val selects = boostedFeats.indices.map { k =>
      val (fname, _) = boostedFeats(k)
      s"""SELECT ${k + 1} AS round, '$fname' AS feature, b.q AS threshold,
         |  CAST(b.nl AS BIGINT) AS n_left, CAST(b.nr AS BIGINT) AS n_right,
         |  CAST(FLOOR(b.ml * 10000) AS BIGINT) AS mean_left_e4,
         |  CAST(FLOOR(b.mr * 10000) AS BIGINT) AS mean_right_e4,
         |  CAST(FLOOR(b.sse * 100) AS BIGINT) AS sse_cents,
         |  CAST(FLOOR(r.g_rmse * 10000) AS BIGINT) AS rmse_e4
         |FROM best_$k b, rmse_$k r""".stripMargin
    }
    s"""WITH li_0 AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS q1,
       |    CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS q2,
       |    CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS t
       |  FROM lineitem),
       |${rounds.mkString(",\n")}
       |${selects.mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  /** Smoothing pseudo-count for [[mlTargetEncode]] — shared with the
    * oracle as a literal.
    */
  private[graft] val TargetEncodeM: Int = 50

  /** ml_target_encode — smoothed target (mean) encoding of a
    * categorical feature (Micci-Barreca 2001, "A Preprocessing Scheme
    * for High-Cardinality Categorical Attributes"): each category's
    * code is the shrunken mean `(Σy + m·prior) / (n + m)` — small
    * categories pull toward the global prior, big ones toward their own
    * mean — the leakage-resistant encoding every gradient-boosting
    * pipeline feeds high-cardinality categoricals through.
    *
    * Scale: ONE map-side-combined aggregate per category plus a 1-row
    * global prior broadcast back — the fact table streams once; the
    * encoding table is category-sized and joins back to facts as a
    * dimension at transform time. Determinism: y is exact cents, so
    * n/Σy and the prior are exact integers; the shrinkage is one
    * division of identical integer-valued doubles on any engine;
    * emissions floor-quantize.
    */
  def mlTargetEncode(s: SparkSession, dir: String): DataFrame = {
    val m = TargetEncodeM
    val li = Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("cat"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    val perCat = li.groupBy("cat")
      .agg(count(lit(1)).as("n"), sum("y").as("s"))
    val prior = perCat.agg(
      (sum("s").cast("double") / sum("n").cast("double")).as("prior"))
    perCat.crossJoin(broadcast(prior))
      .withColumn("code", (col("s").cast("double") +
        lit(m.toDouble) * col("prior")) / (col("n") + lit(m)).cast("double"))
      .select(col("cat"), col("n"),
        floor(col("s").cast("double") / col("n").cast("double") * 100)
          .cast("long").as("raw_mean_e2"),
        floor(col("code") * 100).cast("long").as("code_e2"),
        floor(col("prior") * 100).cast("long").as("prior_e2"))
      .orderBy("cat")
  }

  /** Number of bagging bags — shared with the oracle as a literal. */
  private[graft] val BaggingBags: Int = 4

  /** ml_bagging — a bagged-stump ensemble (Breiman 1996, "Bagging
    * Predictors") beside [[mlBoostedStumps]]' boosting: B disjoint
    * deterministic bags (hash-free key arithmetic on
    * `(l_orderkey·7 + l_linenumber) mod B` — the disjoint-partition
    * variant of bagging; a production run salts the modulus with a
    * seed, the variance-reduction mechanism is identical), one
    * regression stump per bag, ensemble prediction = the bag average.
    *
    * Scale shape: ALL B stumps train off ONE corpus scan — the
    * sufficient-statistics aggregate keys on (bag, feature value), the
    * prefix-sum window partitions by bag, and the per-bag argmin is a
    * row_number over the bounded splits frame. Scoring is a second
    * scan against the B-row model PIVOTED to one broadcast row. A
    * wider ensemble grows the bounded frame, not the number of corpus
    * scans — the [[mlStump]] bounded-frame argument, per bag.
    *
    * Determinism: targets are whole dollars, so the per-bag sufficient
    * statistics are exact integers; per-row ensemble residuals
    * quantize to deci-dollars (`floor(r·10 + 0.5)` — the boosting
    * discipline) so the ensemble RMSE integer-aggregates exactly at
    * any partial-sum order; emissions floor-quantize (the ml_stump
    * ROUND-tie lesson).
    */
  def mlBagging(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = BaggingBags
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("v"),
      ((col("l_orderkey").cast("long") * 7 +
        col("l_linenumber").cast("long")) % b).as("bag"))
      .localCheckpoint(true) // feeds the trainer AND the scoring pass
    val perQ = li.groupBy(col("bag"), col("q")).agg(
      count(lit(1)).as("n"), sum("v").as("s"),
      sum(col("v") * col("v")).as("ss"))
    val wPre = Window.partitionBy("bag").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("bag")
    val splits = perQ.select(col("bag"), col("q"),
        sum("n").over(wPre).as("nl"), sum("s").over(wPre).as("sl"),
        sum("ss").over(wPre).as("ssl"),
        sum("n").over(wAll).as("nt"), sum("s").over(wAll).as("st"),
        sum("ss").over(wAll).as("sst"))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("ssr", col("sst") - col("ssl"))
      .filter(col("nr") > 0)
      .withColumn("ml", expr("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"))
      .withColumn("mr", expr("CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)"))
      .withColumn("sse", expr(stumpSseSql))
    val wBest = Window.partitionBy("bag").orderBy(col("sse"), col("q"))
    val best = splits.withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("bag"), col("q").as("threshold"), col("nl").as("n_left"),
        col("nr").as("n_right"), col("ml"), col("mr"), col("sse"))
      .localCheckpoint(true) // B rows; pivoted for scoring AND emitted
    val pivots: Seq[Column] = (0 until b).flatMap(k => Seq(
      max(when(col("bag") === k, col("threshold"))).as(s"thr$k"),
      max(when(col("bag") === k, col("ml"))).as(s"ml$k"),
      max(when(col("bag") === k, col("mr"))).as(s"mr$k")))
    val one = best.agg(pivots.head, pivots.tail: _*)
    val pred = (0 until b).map(k =>
      when(col("q") <= col(s"thr$k"), col(s"ml$k")).otherwise(col(s"mr$k")))
      .reduce(_ + _) / lit(b.toDouble)
    val rmse = li.crossJoin(broadcast(one))
      .select(floor((col("v").cast("double") - pred) * 10 + 0.5)
        .cast("long").as("r"))
      .agg((sqrt(sum(col("r") * col("r")).cast("double") /
        count(lit(1)).cast("double")) / 10.0).as("g_rmse"))
    best.crossJoin(broadcast(rmse))
      .select(col("bag"), col("threshold"), col("n_left"), col("n_right"),
        floor(col("ml") * 10000).cast("long").as("mean_left_e4"),
        floor(col("mr") * 10000).cast("long").as("mean_right_e4"),
        floor(col("sse") * 100).cast("long").as("sse_cents"),
        floor(col("g_rmse") * 10000).cast("long").as("rmse_e4"))
      .orderBy("bag")
  }

  /** The oracle: the same one-scan multi-bag trainer — (bag, q)
    * sufficient statistics, bag-partitioned prefix sums, QUALIFY
    * row_number argmin — plus the 4-model ensemble scoring pass with
    * the identical `(v − Σpred/B)·10 + 0.5` per-row quantization;
    * every formula shared textually with the engine.
    */
  def baggingOracleSql(): String = {
    val b = BaggingBags
    val bagRefs = (0 until b).map(k => s"b$k AS (SELECT * FROM best WHERE bag = $k)")
    val predSum = (0 until b).map(k =>
      s"CASE WHEN li.q <= b$k.q THEN b$k.ml ELSE b$k.mr END").mkString("\n      + ")
    s"""WITH li AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS q,
       |    CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS v,
       |    (CAST(l_orderkey AS BIGINT) * 7 + CAST(l_linenumber AS BIGINT)) % $b
       |      AS bag
       |  FROM lineitem),
       |perq AS (SELECT bag, q, COUNT(*) AS n, SUM(v) AS s, SUM(v * v) AS ss
       |         FROM li GROUP BY 1, 2),
       |pre AS (SELECT bag, q,
       |    SUM(n) OVER w AS nl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl,
       |    SUM(n) OVER wb AS nt, SUM(s) OVER wb AS st, SUM(ss) OVER wb AS sst
       |  FROM perq
       |  WINDOW w AS (PARTITION BY bag ORDER BY q
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wb AS (PARTITION BY bag)),
       |sp AS (SELECT bag, q, nl, sl, ssl, nt - nl AS nr, st - sl AS sr,
       |         sst - ssl AS ssr
       |       FROM pre WHERE nt - nl > 0),
       |sc AS (SELECT bag, q, nl, nr,
       |    CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS ml,
       |    CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mr,
       |    $stumpSseSql AS sse
       |  FROM sp),
       |best AS MATERIALIZED (
       |  SELECT * FROM sc
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY bag ORDER BY sse, q) = 1),
       |${bagRefs.mkString(",\n")},
       |ens AS (
       |  SELECT SQRT(CAST(SUM(r * r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
       |      / 10.0 AS g_rmse
       |  FROM (SELECT CAST(FLOOR((CAST(v AS DOUBLE) -
       |      ($predSum) / $b.0) * 10 + 0.5) AS BIGINT) AS r
       |    FROM li, ${(0 until b).map(k => s"b$k").mkString(", ")}))
       |SELECT bag, q AS threshold, CAST(nl AS BIGINT) AS n_left,
       |  CAST(nr AS BIGINT) AS n_right,
       |  CAST(FLOOR(ml * 10000) AS BIGINT) AS mean_left_e4,
       |  CAST(FLOOR(mr * 10000) AS BIGINT) AS mean_right_e4,
       |  CAST(FLOOR(sse * 100) AS BIGINT) AS sse_cents,
       |  CAST(FLOOR(g_rmse * 10000) AS BIGINT) AS rmse_e4
       |FROM best, ens ORDER BY bag""".stripMargin
  }

  /** The ridge penalty added to the slope diagonal (intercept
    * unpenalized — the standard parameterization); shared with the
    * oracle as a literal.
    */
  private[graft] val RidgeLambda: Double = 5.0e7

  /** ml_ridge — closed-form RIDGE regression beside [[mlLinReg]]'s OLS:
    * the same one-pass sufficient statistics, with λ added to the slope
    * diagonal of the normal system (`s11 + λ`, `s22 + λ` — the
    * intercept row/column untouched, so only the slopes shrink) before
    * the identical Cramer solve. This is the L2-regularized fit every
    * production regression uses when features correlate or groups run
    * small, and it costs NOTHING beyond OLS at 100 TB: the fact table
    * is still touched once, and both fits solve row-locally off the
    * same 3-row statistics frame. Output compares the two fits per
    * group — the shrinkage is the point.
    */
  def mlRidge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val stats = suffStats(li, "l_returnflag",
      col("l_quantity").cast("long"),
      round(col("l_discount") * 100).cast("long"),
      round(col("l_extendedprice")).cast("long"))
      .localCheckpoint(true) // 3 rows; feeds both solves
    val ridgeStats = stats
      .withColumn("s11", col("s11") + lit(RidgeLambda))
      .withColumn("s22", col("s22") + lit(RidgeLambda))
    val ols = fitFromStats(stats, "l_returnflag")
      .select(col("l_returnflag"),
        col("beta1").as("b1_ols"), col("beta2").as("b2_ols"))
    val ridge = fitFromStats(ridgeStats, "l_returnflag")
      .select(col("l_returnflag"), col("beta0").as("b0_ridge"),
        col("beta1").as("b1_ridge"), col("beta2").as("b2_ridge"))
    ols.join(ridge, "l_returnflag").orderBy("l_returnflag")
  }

  /** ml_cv — 3-fold cross-validation of the stump learner (the
    * model-selection loop that closes the ML lifecycle: split → train →
    * held-out evaluation, the honest generalization estimate): folds
    * assign by the portable hash (`md5(key) mod 3`, the
    * [[Prep.kFold]] rule), each fold's model trains on the OTHER two
    * folds via [[stumpSplits]]' one-aggregate search, and the held-out
    * RMSE computes from per-side integer sufficient statistics —
    * `SSE = Σy² − 2·m·Σy + n·m²` per side with the trained means the
    * only doubles, a fixed expression order both engines share — so
    * the score is deterministic with no row-level float sum anywhere.
    * Cost: per fold one train aggregate + one holdout aggregate; folds
    * are a driver loop of 3, each a fact-scan-bounded job.
    */
  def mlCv(s: SparkSession, dir: String): DataFrame = {
    // ONE fact-scan aggregate serves all six per-fold jobs (guide §2.3
    // aggregate-before-shuffle, applied across the fold loop): the
    // former shape checkpointed the RAW (q, v, fold) projection — a
    // fact-sized frame — and re-scanned it six times (3 trains + 3
    // holdouts, measured 2.97 s at sf0.1). Per-(q, fold) integer
    // sufficient statistics (n, Σy, Σy²) are |q|×3 ≈ 150 rows and
    // compose EXACTLY: summing them over fold ≠ f equals aggregating
    // fold ≠ f's raw rows integer-for-integer, so every train argmin
    // and holdout SSE below is bit-identical to the raw-frame form
    // (the only doubles — means and SSE — divide/multiply the same
    // integers in the same expression order).
    val perQF = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("v"),
      pmod(Hashing.md5Long(concat(col("l_orderkey").cast("string"),
        lit("#"), col("l_linenumber").cast("string"))), lit(3L))
        .as("fold"))
      .groupBy("q", "fold")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
      .localCheckpoint(true) // ~|q|×3 rows; feeds all six derivations
    // ONE job trains all three folds (each a driver .head() before — a
    // job latency apiece): the three leave-one-out stats frames union
    // with an `xf` held-out tag and the stumpSplits windows partition by
    // it; the per-fold argmin is a min_by over (sse, q). Same rows, same
    // integers, same double expressions per partition — bit-identical
    // winners.
    import org.apache.spark.sql.expressions.Window
    val folds = 0L to 2L
    val trainAll = folds.map { f =>
      perQF.filter(col("fold") =!= f)
        .groupBy("q").agg(sum("n").as("n"), sum("s").as("s"),
          sum("ss").as("ss"))
        .withColumn("xf", lit(f))
    }.reduce(_ unionByName _)
    val wPre = Window.partitionBy("xf").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("xf")
    val winners = trainAll.select(col("xf"), col("q"),
        sum("n").over(wPre).as("nl"), sum("s").over(wPre).as("sl"),
        sum("ss").over(wPre).as("ssl"),
        sum("n").over(wAll).as("nt"), sum("s").over(wAll).as("st"),
        sum("ss").over(wAll).as("sst"))
      .withColumn("nr", col("nt") - col("nl"))
      .withColumn("sr", col("st") - col("sl"))
      .withColumn("ssr", col("sst") - col("ssl"))
      .filter(col("nr") > 0)
      .withColumn("ml", expr("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"))
      .withColumn("mr", expr("CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)"))
      .withColumn("sse", expr(stumpSseSql))
      .groupBy("xf")
      .agg(min_by(struct(col("q"), col("nl"), col("nr"),
        col("ml"), col("mr")), struct(col("sse"), col("q"))).as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val thrOf = folds.map(f => f -> winners(f).getAs[Long]("q")).toMap
    val mOf = folds.map(f => f ->
      (winners(f).getAs[Double]("ml"), winners(f).getAs[Double]("mr"))).toMap
    // ONE job evaluates all three holdouts: per (fold, side) integer
    // sums are exact whatever the grouping, the per-row double SSE
    // expression is unchanged, and the final 2-row sum per fold is a
    // commutative single addition — identical doubles to the per-fold
    // form.
    def caseOver(f: Long => Double): org.apache.spark.sql.Column =
      when(col("fold") === 0L, lit(f(0L)))
        .when(col("fold") === 1L, lit(f(1L))).otherwise(lit(f(2L)))
    val thrCase = when(col("fold") === 0L, lit(thrOf(0L)))
      .when(col("fold") === 1L, lit(thrOf(1L))).otherwise(lit(thrOf(2L)))
    val ho = perQF
      .withColumn("left", col("q") <= thrCase)
      .groupBy("fold", "left")
      .agg(sum("n").as("n"), sum("s").as("sy"), sum("ss").as("syy"))
      .withColumn("m", when(col("left"), caseOver(mOf(_)._1))
        .otherwise(caseOver(mOf(_)._2)))
      .groupBy("fold")
      .agg(sum("n").as("n_test"),
        sum(expr("CAST(syy AS DOUBLE) - 2.0D * m * CAST(sy AS DOUBLE)" +
          " + CAST(n AS DOUBLE) * m * m")).as("sse"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // floor-quantized 1e-4 units, NOT round: HALF_UP on a double can
    // split from DuckDB's round at an exact decimal tie (the ml_stump
    // …551.625 incident); floor of the identical double is identical.
    val outs = folds.map { f =>
      val (nTest, sse) = ho(f)
      (f, thrOf(f),
        winners(f).getAs[Long]("nl") + winners(f).getAs[Long]("nr"),
        nTest,
        math.floor(math.sqrt(sse / nTest) * 10000).toLong)
    }
    import s.implicits._
    outs.toDF("fold", "threshold", "n_train", "n_test", "rmse_test_e4")
      .orderBy("fold")
  }

  /** ml_tree_depth2 — an exact depth-2 regression CART: the best root
    * split on quantity ([[stumpSplits]]), then the best sub-split on
    * discount-cents INSIDE each root leaf. This is the recursive-
    * partitioning step every tree/GBM library performs; relationally
    * it is three stump searches — each one map-side-combined aggregate
    * + one O(distinct values) window — with the leaf predicate pushed
    * into the scan (`.filter` before the aggregate), so depth-k trees
    * cost k fact scans, never a row-level sort or a driver-side data
    * structure. The root threshold is a 1-row argmin pinned on the
    * driver (the [[LogReg]] weight-vector convention: bounded state,
    * exact value) and re-enters both child searches as a pushed
    * predicate — identical to the oracle's scalar subquery.
    *
    * Output: the 4 leaves, each with its path label, the thresholds
    * that define it, size, mean prediction, and within-leaf SSE — all
    * from the winner rows' exact integer sufficient statistics, no
    * extra pass.
    */
  def mlTreeDepth2(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q1"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("q2"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("t"))
      .localCheckpoint(true) // feeds all three split searches
    def winner(df: DataFrame, f: String): DataFrame =
      stumpSplits(df, f, "t").orderBy(col("sse"), col("q")).limit(1)
    val rootThr = winner(li, "q1").head.getAs[Long]("q")
    def leafRows(w: DataFrame, side: String): DataFrame =
      w.select(lit(s"$side.L").as("leaf"), lit(rootThr).as("root_thr"),
          col("q").as("sub_thr"), col("nl").as("n"),
          floor(col("ml") * 10000).cast("long").as("mean_e4"),
          floor(expr(sseLeftSql) * 100).cast("long").as("sse_cents"))
        .unionByName(
          w.select(lit(s"$side.R").as("leaf"), lit(rootThr).as("root_thr"),
            col("q").as("sub_thr"), col("nr").as("n"),
            floor(col("mr") * 10000).cast("long").as("mean_e4"),
            floor(expr(sseRightSql) * 100).cast("long").as("sse_cents")))
    leafRows(winner(li.filter(col("q1") <= rootThr), "q2"), "L")
      .unionByName(
        leafRows(winner(li.filter(col("q1") > rootThr), "q2"), "R"))
      .orderBy("leaf")
  }

  /** The oracle: three stump-search CTE chains (root on q1, one per
    * root leaf on q2 behind the root winner's scalar subquery), leaf
    * stats from the same integer sufficient statistics and the same
    * shared SSE fragments.
    */
  def treeOracleSql(): String = {
    def stump(name: String, src: String, fcol: String) =
      s"""perq_$name AS MATERIALIZED (
         |  SELECT $fcol AS q, COUNT(*) AS n, SUM(t) AS s, SUM(t * t) AS ss
         |  FROM $src GROUP BY 1),
         |pre_$name AS (
         |  SELECT q,
         |    SUM(n) OVER w AS nl, SUM(s) OVER w AS sl, SUM(ss) OVER w AS ssl,
         |    SUM(n) OVER () AS nt, SUM(s) OVER () AS st, SUM(ss) OVER () AS sst
         |  FROM perq_$name
         |  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |sp_$name AS (
         |  SELECT q, nl, sl, ssl, nt - nl AS nr, st - sl AS sr,
         |    sst - ssl AS ssr
         |  FROM pre_$name WHERE nt - nl > 0),
         |w_$name AS MATERIALIZED (
         |  SELECT q, nl, sl, ssl, nr, sr, ssr,
         |    CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS ml,
         |    CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) AS mr
         |  FROM sp_$name ORDER BY $stumpSseSql, q LIMIT 1)""".stripMargin
    def leafSel(name: String, side: String) = {
      val (nn, mm, ss) =
        if (side == "L") ("nl", "ml", sseLeftSql) else ("nr", "mr", sseRightSql)
      s"""SELECT '$name.$side' AS leaf,
         |  (SELECT q FROM w_root) AS root_thr, q AS sub_thr,
         |  CAST($nn AS BIGINT) AS n,
         |  CAST(FLOOR($mm * 10000) AS BIGINT) AS mean_e4,
         |  CAST(FLOOR($ss * 100) AS BIGINT) AS sse_cents
         |FROM w_$name""".stripMargin
    }
    s"""WITH li AS MATERIALIZED (
       |  SELECT CAST(l_quantity AS BIGINT) AS q1,
       |    CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS q2,
       |    CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS t
       |  FROM lineitem),
       |${stump("root", "li", "q1")},
       |liL AS MATERIALIZED (
       |  SELECT q2, t FROM li WHERE q1 <= (SELECT q FROM w_root)),
       |liR AS MATERIALIZED (
       |  SELECT q2, t FROM li WHERE q1 > (SELECT q FROM w_root)),
       |${stump("L", "liL", "q2")},
       |${stump("R", "liR", "q2")}
       |${Seq(leafSel("L", "L"), leafSel("L", "R"), leafSel("R", "L"),
              leafSel("R", "R")).mkString("\nUNION ALL\n")}
       |ORDER BY leaf""".stripMargin
  }
}
