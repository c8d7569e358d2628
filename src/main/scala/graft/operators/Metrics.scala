package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Model-evaluation metrics — the third leg of the ML family beside
  * training ([[LogReg]], [[Regression]], [[NaiveBayes]]) and
  * calibration monitoring ([[LogReg.mlCalibration]]): rank statistics
  * computed relationally, exactly, at fact-table scale.
  *
  * ROC AUC is the Mann–Whitney U statistic (Hanley & McNeil 1982):
  * `AUC = (Σ ranks of positives − P(P+1)/2) / (P·N)` with AVERAGE ranks
  * over tied scores. The textbook implementation sorts all n rows on
  * one machine; here the fact table collapses to |distinct scores|
  * rows inside the scan stage (one map-side-combined aggregate — the
  * [[Regression.mlStump]] bounded-frame shape), a prefix sum over that
  * bounded frame assigns every tie group its average rank, and the U
  * numerator falls out as one more integer aggregate. No global
  * row-level sort, no quadratic pair count — the plan that survives
  * 100 TB of scored rows.
  *
  * Determinism: scores and labels are integers, and the tie-corrected
  * rank sum is kept in DOUBLED units (`2·R = 2·cum_before + n + 1`) so
  * every partial sum is an exact 64-bit integer at any aggregation
  * order; the single final division over identical integers is
  * bit-reproducible on any engine (the [[LogReg]] contract).
  */
object Metrics {

  /** Tie-corrected AUC per group over integer scores/labels:
    * input (g, sc, y) with y ∈ {0,1} → (g, pos, neg, auc, gini).
    *
    * Doubled-unit algebra: a tie group of size n starting after
    * `cb` lower-scored rows has average rank `cb + (n+1)/2`, so
    * `2·Σ R⁺ = Σ_groups p·(2·cb + n + 1)` — integers throughout;
    * `AUC = (2ΣR⁺ − P(P+1)) / (2PN)`.
    */
  def aucByGroup(df: DataFrame, gCol: String, scCol: String,
                 yCol: String): DataFrame = {
    val perScore = df.groupBy(col(gCol).as("g"), col(scCol).as("sc"))
      .agg(count(lit(1)).as("n"), sum(yCol).as("p"))
    val wPre = Window.partitionBy("g").orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("cb", coalesce(sum("n").over(wPre), lit(0L)))
      .withColumn("r2p", col("p") * (col("cb") * 2 + col("n") + 1))
    ranked.groupBy("g")
      .agg(sum("r2p").as("r2"), sum("p").as("pos"),
        (sum("n") - sum("p")).as("neg"))
      .filter(col("pos") > 0 && col("neg") > 0)
      .withColumn("auc", round(
        (col("r2") - col("pos") * (col("pos") + 1)).cast("double") /
          (col("pos") * col("neg") * 2).cast("double"), 6))
      .withColumn("gini", round(
        (col("r2") - col("pos") * (col("pos") + 1)).cast("double") /
          (col("pos") * col("neg")).cast("double") - 1.0, 6) + lit(0.0))
      .select("g", "pos", "neg", "auc", "gini")
  }

  /** Registered query: per-returnflag AUC of an integer score against a
    * PLANTED noisy label (the [[LogReg.mlLogReg]] fixture argument —
    * the synthetic columns carry no cross-column signal, so a real
    * label would make every AUC exactly 0.5): score = l_quantity (50
    * distinct values over ~60k rows per group — the heavy-tie regime
    * where naive integer ranks are simply WRONG), label =
    * `sc·1000 + hash-noise > 28000` with noise uniform on [0, 50000) —
    * AUC lands strictly inside (0.5, 1) and a broken tie correction
    * shifts it measurably.
    */
  def mlAuc(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("sc"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
    val planted = li.withColumn("y",
      (col("sc") * 1000 + pmod(Hashing.md5Long(col("k")), lit(50000L))
        > 28000).cast("long"))
    aucByGroup(planted, "g", "sc", "y").orderBy("g")
  }

  /** ml_lift — decile lift and cumulative gains (the campaign-targeting
    * view of the same ranking the AUC scores): rows ranked by score
    * descending (ties broken on the deterministic row key) are cut into
    * 10 equal NTILE buckets per group; each decile reports its positive
    * rate relative to the group base rate (lift) and the cumulative
    * share of all positives captured so far (the gains curve every
    * top-k-selection budget decision reads off).
    *
    * Determinism: NTILE over a total order (score desc, key) is
    * identical on any engine; lift and gain are single divisions of
    * exact integer counts, rounded. Scale: the per-group window sorts
    * group-sized slices (the [[mlAuc]] fixture's groups are few and
    * fat — at real scale the same cut comes from pre-computed score
    * quantiles instead of a row-number window; the decile AGGREGATE
    * shape downstream is unchanged).
    */
  def mlLift(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("sc"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
    val planted = li.withColumn("y",
      (col("sc") * 1000 + pmod(Hashing.md5Long(col("k")), lit(50000L))
        > 28000).cast("long"))
    liftStats(planted)
  }

  /** The decile cut + lift/gains aggregate over (g, sc, k, y) rows —
    * [[mlLift]]'s math on any scored frame.
    */
  def liftStats(planted: DataFrame, tiles: Int = 10): DataFrame = {
    val wTile = Window.partitionBy("g").orderBy(col("sc").desc, col("k"))
    val deciles = planted
      .withColumn("decile", ntile(tiles).over(wTile))
      .groupBy("g", "decile")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    val wCum = Window.partitionBy("g").orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    deciles
      .withColumn("cum_pos", sum("n_pos").over(wCum))
      .withColumn("tot_n", sum("n").over(wAll))
      .withColumn("tot_pos", sum("n_pos").over(wAll))
      .select(col("g"), col("decile"), col("n"), col("n_pos"),
        round((col("n_pos") * col("tot_n")).cast("double") /
          (col("n") * col("tot_pos")), 6).as("lift"),
        round(col("cum_pos").cast("double") / col("tot_pos"), 6)
          .as("cum_gain"))
      .orderBy("g", "decile")
  }

  val mlLiftOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS sc,
      |    CAST(l_orderkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber AS VARCHAR) AS k
      |  FROM lineitem),
      |planted AS (
      |  SELECT g, sc, k,
      |    CAST(sc * 1000 +
      |      (('0x' || substr(md5(k), 1, 15))::BIGINT % 50000) > 28000
      |      AS BIGINT) AS y
      |  FROM li),
      |tiled AS (
      |  SELECT g, y,
      |    NTILE(10) OVER (PARTITION BY g ORDER BY sc DESC, k) AS decile
      |  FROM planted),
      |d AS (SELECT g, decile, COUNT(*) AS n, SUM(y) AS n_pos
      |      FROM tiled GROUP BY g, decile),
      |c AS (SELECT g, decile, n, n_pos,
      |        SUM(n_pos) OVER (PARTITION BY g ORDER BY decile
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
      |        SUM(n) OVER (PARTITION BY g) AS tot_n,
      |        SUM(n_pos) OVER (PARTITION BY g) AS tot_pos
      |      FROM d)
      |SELECT g, CAST(decile AS INT) AS decile, CAST(n AS BIGINT) AS n,
      |  CAST(n_pos AS BIGINT) AS n_pos,
      |  ROUND(CAST(n_pos * tot_n AS DOUBLE) / (n * tot_pos), 6) AS lift,
      |  ROUND(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS cum_gain
      |FROM c ORDER BY g, decile""".stripMargin

  /** ml_parity — GROUP-FAIRNESS audit (demographic parity gap +
    * disparate-impact ratio per protected group, the 80%-rule read-out
    * every model governance review runs): positives planted with a
    * group-dependent hash band so the gaps are real and deterministic.
    * All-integer emissions: rates, gaps, and DI ratios are micro-unit
    * integer divisions of exact counts — no float anywhere.
    * One map-side-combined aggregate + a 1-row overall broadcast.
    */
  def mlParity(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
      .withColumn("y",
        (pmod(Hashing.md5Long(col("doc_id").cast("string")), lit(1000L)) <
          lit(250L) + length(col("lang")) * 40 +
          pmod(ascii(col("lang")), lit(7L)) * 20).cast("long"))
    val per = d.groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    per
      .crossJoin(broadcast(per.agg(sum("n").as("tn"), sum("n_pos").as("tp"))))
      .select(col("lang"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 DIV n").as("rate_e6"),
        expr("tp * 1000000 DIV tn").as("overall_e6"),
        expr("n_pos * 1000000 DIV n - tp * 1000000 DIV tn").as("gap_e6"),
        expr("n_pos * tn * 1000000 DIV (tp * n)").as("di_e6"))
      .orderBy("lang")
  }

  val mlParityOracle: String =
    """WITH d AS (
      |  SELECT lang,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |      ::BIGINT % 1000 <
      |      250 + length(lang) * 40 + (ascii(lang) % 7) * 20
      |      AS BIGINT) AS y
      |  FROM documents),
      |per AS (SELECT lang, COUNT(*) AS n, SUM(y) AS n_pos
      |        FROM d GROUP BY lang),
      |tot AS (SELECT SUM(n) AS tn, SUM(n_pos) AS tp FROM per)
      |SELECT lang, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
      |  CAST(n_pos * 1000000 // n AS BIGINT) AS rate_e6,
      |  CAST(tp * 1000000 // tn AS BIGINT) AS overall_e6,
      |  CAST(n_pos * 1000000 // n - tp * 1000000 // tn AS BIGINT) AS gap_e6,
      |  CAST(n_pos * tn * 1000000 // (tp * n) AS BIGINT) AS di_e6
      |FROM per, tot ORDER BY lang""".stripMargin

  /** ml_pinball — QUANTILE (pinball) loss at q ∈ {0.1, 0.5, 0.9}
    * against a per-group exact-median forecast — the evaluation every
    * probabilistic/forecast model reports (a model that only minimizes
    * MSE looks fine at q=0.5 and terrible at the tails; the pinball
    * triple exposes that). Exact-integer discipline: values and the
    * interpolated median live in DOUBLED cents (interpolation at 0.5
    * yields halves — ×2 makes them integers), each loss term is
    * `max(10q·e, (10q−10)·e)` in those units, and the three sums are
    * 64-bit integers at any aggregation order.
    *
    * Scale: one grouped percentile pass + a broadcast-forecast join +
    * one map-side-combined aggregate — the fact table never windows.
    */
  def mlPinball(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val med = li.groupBy("g")
      .agg(expr("CAST(percentile(cents, 0.5D) * 2 AS BIGINT)").as("med_x2"),
        count(lit(1)).as("n"))
    li.join(broadcast(med), "g")
      .select(col("g"), col("n"), col("med_x2"),
        (col("cents") * 2 - col("med_x2")).as("e"))
      .groupBy("g")
      .agg(max("n").as("n"), max("med_x2").as("med_x2"),
        sum(greatest(col("e") * 1, col("e") * -9)).as("pin10_x20"),
        sum(greatest(col("e") * 5, col("e") * -5)).as("pin50_x20"),
        sum(greatest(col("e") * 9, col("e") * -1)).as("pin90_x20"))
      .orderBy("g")
  }

  val mlPinballOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g,
      |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem),
      |m AS (SELECT g, CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT)
      |        AS med_x2, COUNT(*) AS n
      |      FROM li GROUP BY g),
      |e AS (SELECT li.g, m.n, m.med_x2, li.cents * 2 - m.med_x2 AS e
      |      FROM li JOIN m USING (g))
      |SELECT g, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(med_x2) AS BIGINT) AS med_x2,
      |  CAST(SUM(GREATEST(e * 1, e * -9)) AS BIGINT) AS pin10_x20,
      |  CAST(SUM(GREATEST(e * 5, e * -5)) AS BIGINT) AS pin50_x20,
      |  CAST(SUM(GREATEST(e * 9, e * -1)) AS BIGINT) AS pin90_x20
      |FROM e GROUP BY g ORDER BY g""".stripMargin

  /** ml_roc_points — the full ROC CURVE (one operating point per
    * distinct score threshold, predicting positive at score ≥ t), the
    * threshold-selection view the scalar [[mlAuc]] integrates away:
    * per point the exact TP/FP counts and the rounded TPR/FPR rates.
    * Same scale shape as the AUC: the fact table collapses to
    * |distinct scores| rows inside the scan, the curve is a prefix sum
    * over that bounded frame — no row-level sort at any scale.
    */
  def mlRocPoints(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("sc"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
    val planted = li.withColumn("y",
      (col("sc") * 1000 + pmod(Hashing.md5Long(col("k")), lit(50000L))
        > 28000).cast("long"))
    val pers = planted.groupBy("g", "sc")
      .agg(count(lit(1)).as("n"), sum("y").as("p"))
    val wCum = Window.partitionBy("g").orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    pers
      .withColumn("tp", sum("p").over(wCum))
      .withColumn("fp", (sum("n").over(wCum) - col("tp")))
      .withColumn("pos", sum("p").over(wAll))
      .withColumn("neg", sum(col("n") - col("p")).over(wAll))
      .filter(col("pos") > 0 && col("neg") > 0)
      .select(col("g"), col("sc").as("threshold"), col("tp"), col("fp"),
        round(col("tp").cast("double") / col("pos"), 6).as("tpr"),
        round(col("fp").cast("double") / col("neg"), 6).as("fpr"))
      .orderBy("g", "threshold")
  }

  val mlRocPointsOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS sc,
      |    CAST(l_orderkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber AS VARCHAR) AS k
      |  FROM lineitem),
      |planted AS (
      |  SELECT g, sc,
      |    CAST(sc * 1000 +
      |      (('0x' || substr(md5(k), 1, 15))::BIGINT % 50000) > 28000
      |      AS BIGINT) AS y
      |  FROM li),
      |pers AS (SELECT g, sc, COUNT(*) AS n, SUM(y) AS p
      |         FROM planted GROUP BY g, sc),
      |c AS (SELECT g, sc,
      |    SUM(p) OVER (PARTITION BY g ORDER BY sc DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
      |    SUM(n) OVER (PARTITION BY g ORDER BY sc DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |    SUM(p) OVER (PARTITION BY g) AS pos,
      |    SUM(n - p) OVER (PARTITION BY g) AS neg
      |  FROM pers)
      |SELECT g, CAST(sc AS BIGINT) AS threshold, CAST(tp AS BIGINT) AS tp,
      |  CAST(cn - tp AS BIGINT) AS fp,
      |  ROUND(CAST(tp AS DOUBLE) / pos, 6) AS tpr,
      |  ROUND(CAST(cn - tp AS DOUBLE) / neg, 6) AS fpr
      |FROM c WHERE pos > 0 AND neg > 0
      |ORDER BY g, threshold""".stripMargin

  /** ml_abtest — the TWO-PROPORTION z-test (pooled), the experiment
    * read-out every A/B rollout decision runs: cohorts split on a
    * deterministic hash of the unit key (the real assignment mechanism,
    * not a data column — so the test is valid by construction),
    * conversion planted from an independent hash band. The statistic
    *
    *   z² = (k_a·n_b − k_b·n_a)² · (n_a + n_b)
    *        / (n_a · n_b · k · (n − k))      with k = k_a+k_b, n = n_a+n_b
    *
    * is evaluated as one fixed left-to-right IEEE expression over the
    * four exact integer sufficient statistics — identical operands,
    * identical operation order ⇒ identical bits on any engine;
    * significance is z² against the χ²₁ 95% critical value 3.841459, a
    * LITERAL both engines compare identically.
    *
    * Scale: one map-side-combined aggregate over the unit table —
    * four integers out, nothing else moves.
    */
  def mlAbTest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      col("o_orderkey").cast("string").as("k"),
      (col("o_totalprice") > 150000).cast("long").as("conv"))
    val assigned = o.select(
      (pmod(Hashing.md5Long(col("k")), lit(2L)) === 0).as("in_a"), col("conv"))
    assigned
      .agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("in_a"), col("conv")).otherwise(0L)).as("k_a"),
        sum(when(!col("in_a"), col("conv")).otherwise(0L)).as("k_b"))
      .withColumn("z2", round(
        // every FACTOR is cast to double BEFORE any multiply (sums of
        // counts stay integral — addition can't overflow at any sf this
        // engine targets, but 64-bit products like n_a·n_b·(k_a+k_b)
        // would wrap at ~sf10): same operand order on the oracle side
        // keeps IEEE bit-parity while removing the silent-wrap divergence
        (col("k_a").cast("double") * col("n_b").cast("double") -
          col("k_b").cast("double") * col("n_a").cast("double")) *
          (col("k_a").cast("double") * col("n_b").cast("double") -
            col("k_b").cast("double") * col("n_a").cast("double")) *
          (col("n_a") + col("n_b")).cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            (col("k_a") + col("k_b")).cast("double")) /
          ((col("n_a") + col("n_b")) - (col("k_a") + col("k_b"))).cast("double"),
        6))
      .withColumn("significant", col("z2") > 3.841459)
      .select("n_a", "n_b", "k_a", "k_b", "z2", "significant")
  }

  val mlAbTestOracle: String =
    """WITH u AS (
      |  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
      |      ::BIGINT % 2 = 0 AS in_a,
      |    CAST(o_totalprice > 150000 AS BIGINT) AS conv
      |  FROM orders),
      |agg AS (
      |  SELECT SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS n_a,
      |    SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS n_b,
      |    SUM(CASE WHEN in_a THEN conv ELSE 0 END) AS k_a,
      |    SUM(CASE WHEN in_a THEN 0 ELSE conv END) AS k_b
      |  FROM u)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
      |  ROUND((CAST(k_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      - CAST(k_b AS DOUBLE) * CAST(n_a AS DOUBLE))
      |    * (CAST(k_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      - CAST(k_b AS DOUBLE) * CAST(n_a AS DOUBLE))
      |    * CAST(n_a + n_b AS DOUBLE)
      |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      * CAST(k_a + k_b AS DOUBLE))
      |    / CAST((n_a + n_b) - (k_a + k_b) AS DOUBLE), 6) AS z2,
      |  ROUND((CAST(k_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      - CAST(k_b AS DOUBLE) * CAST(n_a AS DOUBLE))
      |    * (CAST(k_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      - CAST(k_b AS DOUBLE) * CAST(n_a AS DOUBLE))
      |    * CAST(n_a + n_b AS DOUBLE)
      |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |      * CAST(k_a + k_b AS DOUBLE))
      |    / CAST((n_a + n_b) - (k_a + k_b) AS DOUBLE), 6) > 3.841459
      |    AS significant
      |FROM agg""".stripMargin

  /** ml_knn — k-nearest-neighbor classification (the non-parametric
    * leg beside the generative [[NaiveBayes]] and discriminative
    * [[LogReg]]): each probe takes the majority label of its k = 5
    * nearest corpus points in quantized feature space. Distances are
    * EXACT integers (features pre-quantized to the [[LogReg]] grid, so
    * d² = Δ₁² + Δ₂² is 64-bit arithmetic), ranking ties break on the
    * candidate id, and the vote is an integer sum — deterministic end
    * to end with no float anywhere.
    *
    * Scale shape: the probe set is BOUNDED (a broadcast frame); the
    * corpus streams once through the per-probe distance + windowed
    * top-k ([[Similarity.cosineTopK]]'s shape — at real scale the same
    * query runs against an ANN index tier first; this is the exact
    * reranker those candidates feed).
    */
  def mlKnn(s: SparkSession, dir: String): DataFrame = {
    val lc = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 20000)
      .groupBy(col("l_orderkey").as("k"))
      .agg((count(lit(1)) / 4.0 - 0.7).as("x1"),
        (sum("l_extendedprice") / count(lit(1)) / 50000.0 - 0.6).as("x2"))
    val q = lc.select(col("k"),
      expr("CAST(floor(x1 * 1000 + 0.5D) AS BIGINT)").as("xq1"),
      expr("CAST(floor(x2 * 1000 + 0.5D) AS BIGINT)").as("xq2"),
      (col("x1") + lit(2.0) * col("x2") +
        (pmod(Hashing.md5Long(col("k").cast("string")), lit(1000))
          / 1000.0 - 0.5) > 1.3).cast("long").as("y"))
    // the ≤600 key-range filter bounds the fixture by data semantics;
    // the RowBound guard turns that into an enforced broadcast-class
    // contract the plan gate can verify statically
    val probes = broadcast(graft.util.RowBound.guard(
      q.filter(col("k") <= 600)
        .select(col("k").as("pid"), col("xq1").as("p1"),
          col("xq2").as("p2"), col("y").as("y_true")),
      1024, "ml_knn probe fixture"))
    // the probe fan-out multiplies per-row work ~|probes|x, and AQE
    // coalesces the small aggregated candidate frame to ONE partition —
    // spread it back across the cluster before the explosion
    // (measured: 28 s single-task vs ~2 s spread, sf0.01)
    val cands = Spread.ifNarrow(q.filter(col("k") > 600))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("pid")
      .orderBy(col("d2"), col("k"))
    cands.crossJoin(probes)
      .withColumn("d2",
        (col("xq1") - col("p1")) * (col("xq1") - col("p1")) +
          (col("xq2") - col("p2")) * (col("xq2") - col("p2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("pid", "y_true")
      .agg(sum("y").as("vote"), max("d2").as("d2_kth"))
      .select(col("pid"), col("vote"),
        (col("vote") >= 3).cast("long").as("yhat"), col("y_true"),
        ((col("vote") >= 3).cast("long") === col("y_true")).as("correct"),
        col("d2_kth"))
      .orderBy("pid")
  }

  val mlKnnOracle: String =
    """WITH lc AS (
      |  SELECT l_orderkey AS k, COUNT(*) / 4.0 - 0.7 AS x1,
      |    SUM(l_extendedprice) / COUNT(*) / 50000.0 - 0.6 AS x2
      |  FROM lineitem WHERE l_orderkey <= 20000 GROUP BY 1),
      |q AS (
      |  SELECT k,
      |    CAST(floor(x1 * 1000 + 0.5) AS BIGINT) AS xq1,
      |    CAST(floor(x2 * 1000 + 0.5) AS BIGINT) AS xq2,
      |    CAST(x1 + 2.0 * x2 +
      |      ((('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))
      |         ::BIGINT % 1000) / 1000.0 - 0.5) > 1.3 AS BIGINT) AS y
      |  FROM lc),
      |p AS (SELECT k AS pid, xq1 AS p1, xq2 AS p2, y AS y_true
      |      FROM q WHERE k <= 600),
      |c AS (SELECT * FROM q WHERE k > 600),
      |d AS (
      |  SELECT p.pid, p.y_true, c.k, c.y,
      |    (c.xq1 - p.p1) * (c.xq1 - p.p1)
      |      + (c.xq2 - p.p2) * (c.xq2 - p.p2) AS d2
      |  FROM p, c),
      |r AS (
      |  SELECT pid, y_true, y, d2,
      |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2, k) AS rn
      |  FROM d)
      |SELECT pid, CAST(SUM(y) AS BIGINT) AS vote,
      |  CAST(SUM(y) >= 3 AS BIGINT) AS yhat, y_true,
      |  CAST(SUM(y) >= 3 AS BIGINT) = y_true AS correct,
      |  CAST(MAX(d2) AS BIGINT) AS d2_kth
      |FROM r WHERE rn <= 5
      |GROUP BY pid, y_true ORDER BY pid""".stripMargin

  /** ml_prf — per-class precision/recall/F1 over the [[mlKnn]]
    * classifier's predictions (the confusion-matrix report every model
    * eval ends with, beside [[mlAuc]]'s threshold-free ranking view):
    * the scored frame collapses to the 2×2 confusion matrix in one
    * map-side-combined aggregate, per-class tp/fp/fn are conditional
    * integer sums over those 4 rows, and the only floats are the three
    * final divisions over identical integers.
    */
  def mlPrf(s: SparkSession, dir: String): DataFrame = {
    val conf = mlKnn(s, dir).groupBy(col("y_true"), col("yhat"))
      .agg(count(lit(1)).as("n"))
    conf.select(explode(array(lit(0L), lit(1L))).as("cls"),
        col("y_true"), col("yhat"), col("n"))
      .groupBy("cls")
      .agg(
        sum(when(col("yhat") === col("cls") &&
          col("y_true") === col("cls"), col("n")).otherwise(0L)).as("tp"),
        sum(when(col("yhat") === col("cls") &&
          col("y_true") =!= col("cls"), col("n")).otherwise(0L)).as("fp"),
        sum(when(col("y_true") === col("cls") &&
          col("yhat") =!= col("cls"), col("n")).otherwise(0L)).as("fn"))
      .withColumn("precision", round(col("tp").cast("double") /
        (col("tp") + col("fp")).cast("double"), 6))
      .withColumn("recall", round(col("tp").cast("double") /
        (col("tp") + col("fn")).cast("double"), 6))
      .withColumn("f1", round((col("tp") * 2).cast("double") /
        (col("tp") * 2 + col("fp") + col("fn")).cast("double"), 6))
      .orderBy("cls")
  }

  /** ml_mcc — the single-number confusion summaries the per-class
    * [[mlPrf]] row can't give: Matthews correlation (the balanced
    * measure that stays honest under class imbalance, Matthews 1975),
    * Cohen's kappa (chance-corrected agreement), and balanced accuracy
    * — all exact integer cells from the SAME kNN classifier fixture,
    * combined in identical IEEE expressions on both engines. One
    * bounded aggregate; the fact-scan cost is [[mlKnn]]'s.
    */
  def mlMcc(s: SparkSession, dir: String): DataFrame = {
    val conf = mlKnn(s, dir).groupBy(col("y_true"), col("yhat"))
      .agg(count(lit(1)).as("n"))
    val cells = conf.agg(
      sum(when(col("y_true") === 1 && col("yhat") === 1, col("n"))
        .otherwise(0L)).as("tp"),
      sum(when(col("y_true") === 0 && col("yhat") === 1, col("n"))
        .otherwise(0L)).as("fp"),
      sum(when(col("y_true") === 1 && col("yhat") === 0, col("n"))
        .otherwise(0L)).as("fn"),
      sum(when(col("y_true") === 0 && col("yhat") === 0, col("n"))
        .otherwise(0L)).as("tn"))
    def d(c: String) = col(c).cast("double")
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round((d("tp") * d("tn") - d("fp") * d("fn")) /
        sqrt((col("tp") + col("fp")).cast("double") *
          (col("tp") + col("fn")).cast("double") *
          (col("tn") + col("fp")).cast("double") *
          (col("tn") + col("fn")).cast("double")), 6).as("mcc"),
      round(lit(2.0) * (d("tp") * d("tn") - d("fp") * d("fn")) /
        ((col("tp") + col("fp")).cast("double") *
          (col("fp") + col("tn")).cast("double") +
         (col("tp") + col("fn")).cast("double") *
          (col("fn") + col("tn")).cast("double")), 6).as("kappa"),
      round((d("tp") / (col("tp") + col("fn")).cast("double") +
        d("tn") / (col("tn") + col("fp")).cast("double")) / 2.0, 6)
        .as("balanced_acc"))
  }

  def mlMccOracle: String =
    s"""WITH knn AS ($mlKnnOracle),
       |c AS (SELECT
       |  SUM(CASE WHEN y_true = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS tp,
       |  SUM(CASE WHEN y_true = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS fp,
       |  SUM(CASE WHEN y_true = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS fn,
       |  SUM(CASE WHEN y_true = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS tn
       |  FROM knn)
       |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       |  ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |      - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |    / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
       |        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
       |    AS mcc,
       |  ROUND(2.0 * (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |      - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |    / (CAST(tp + fp AS DOUBLE) * CAST(fp + tn AS DOUBLE)
       |       + CAST(tp + fn AS DOUBLE) * CAST(fn + tn AS DOUBLE)), 6)
       |    AS kappa,
       |  ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
       |       + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)) / 2.0, 6)
       |    AS balanced_acc
       |FROM c""".stripMargin

  val mlPrfOracle: String =
    s"""WITH knn AS ($mlKnnOracle),
       |conf AS (
       |  SELECT y_true, yhat, COUNT(*) AS n FROM knn GROUP BY 1, 2),
       |x AS (SELECT g.cls, conf.* FROM conf,
       |  LATERAL (SELECT unnest([0, 1]) AS cls) g)
       |SELECT CAST(cls AS BIGINT) AS cls,
       |  CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END)
       |    AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN yhat = cls AND y_true <> cls THEN n ELSE 0 END)
       |    AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN y_true = cls AND yhat <> cls THEN n ELSE 0 END)
       |    AS BIGINT) AS fn,
       |  ROUND(CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END)
       |         + SUM(CASE WHEN yhat = cls AND y_true <> cls THEN n ELSE 0 END) AS DOUBLE), 6)
       |    AS precision,
       |  ROUND(CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END)
       |         + SUM(CASE WHEN y_true = cls AND yhat <> cls THEN n ELSE 0 END) AS DOUBLE), 6)
       |    AS recall,
       |  ROUND(CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END) * 2 AS DOUBLE)
       |    / CAST(SUM(CASE WHEN yhat = cls AND y_true = cls THEN n ELSE 0 END) * 2
       |         + SUM(CASE WHEN yhat = cls AND y_true <> cls THEN n ELSE 0 END)
       |         + SUM(CASE WHEN y_true = cls AND yhat <> cls THEN n ELSE 0 END) AS DOUBLE), 6)
       |    AS f1
       |FROM x GROUP BY cls ORDER BY cls""".stripMargin

  /** Exact average precision (the step-integrated area under the
    * precision-recall curve, sklearn's AP): walking score groups in
    * DESCENDING score order, `AP = Σ_k (p_k/P) · (TP_k / (TP_k+FP_k))`
    * — each term an exact integer rational, so both engines divide
    * identical integers; the ~|distinct scores| term sum rounds at 6.
    * The metric that actually ranks models under class imbalance,
    * where ROC-AUC saturates ([[aucByGroup]]'s complement).
    *
    * Scale: the same shape as [[aucByGroup]] — one map-side-combined
    * (group, score) aggregate, one window over the bounded
    * distinct-score frame, nothing else touches the fact table.
    */
  def prAucByGroup(df: DataFrame, gCol: String, scCol: String,
                   yCol: String): DataFrame = {
    val perScore = df.groupBy(col(gCol).as("g"), col(scCol).as("sc"))
      .agg(count(lit(1)).as("n"), sum(yCol).as("p"))
    val wDesc = Window.partitionBy("g").orderBy(col("sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore
      .withColumn("tp", sum("p").over(wDesc))
      .withColumn("cn", sum("n").over(wDesc)) // = TP + FP at this cut
    val tot = perScore.groupBy("g")
      .agg(sum("p").as("pos"), sum("n").as("ntot"))
    cum.join(tot, "g")
      .filter(col("pos") > 0 && col("pos") < col("ntot"))
      .withColumn("term", (col("p") * col("tp")).cast("double") /
        (col("pos") * col("cn")).cast("double"))
      .groupBy("g")
      .agg(max("pos").as("pos"), (max("ntot") - max("pos")).as("neg"),
        round(sum("term"), 6).as("pr_auc"),
        round(max("pos").cast("double") / max("ntot").cast("double"), 6)
          .as("prevalence"))
      .select("g", "pos", "neg", "pr_auc", "prevalence")
  }

  /** Registered query: average precision of the [[mlAuc]] planted-label
    * fixture — same scores, same label, the PR-curve counterpart row.
    */
  def mlPrAuc(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("sc"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
    val planted = li.withColumn("y",
      (col("sc") * 1000 + pmod(Hashing.md5Long(col("k")), lit(50000L))
        > 28000).cast("long"))
    prAucByGroup(planted, "g", "sc", "y").orderBy("g")
  }

  val mlPrAucOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS sc,
      |    CAST(l_orderkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber AS VARCHAR) AS k
      |  FROM lineitem),
      |planted AS (
      |  SELECT g, sc,
      |    CAST(sc * 1000 +
      |      (('0x' || substr(md5(k), 1, 15))::BIGINT % 50000) > 28000
      |      AS BIGINT) AS y
      |  FROM li),
      |pers AS (
      |  SELECT g, sc, COUNT(*) AS n, SUM(y) AS p
      |  FROM planted GROUP BY g, sc),
      |cum AS (
      |  SELECT g, sc, n, p,
      |    SUM(p) OVER w AS tp, SUM(n) OVER w AS cn
      |  FROM pers
      |  WINDOW w AS (PARTITION BY g ORDER BY sc DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tot AS (SELECT g, SUM(p) AS pos, SUM(n) AS ntot FROM pers GROUP BY g)
      |SELECT c.g, CAST(t.pos AS BIGINT) AS pos,
      |  CAST(t.ntot - t.pos AS BIGINT) AS neg,
      |  ROUND(SUM(CAST(c.p * c.tp AS DOUBLE)
      |    / CAST(t.pos * c.cn AS DOUBLE)), 6) AS pr_auc,
      |  ROUND(CAST(t.pos AS DOUBLE) / CAST(t.ntot AS DOUBLE), 6)
      |    AS prevalence
      |FROM cum c JOIN tot t USING (g)
      |WHERE t.pos > 0 AND t.pos < t.ntot
      |GROUP BY c.g, t.pos, t.ntot ORDER BY c.g""".stripMargin

  val mlAucOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS sc,
      |    CAST(l_orderkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber AS VARCHAR) AS k
      |  FROM lineitem),
      |planted AS (
      |  SELECT g, sc,
      |    CAST(sc * 1000 +
      |      (('0x' || substr(md5(k), 1, 15))::BIGINT % 50000) > 28000
      |      AS BIGINT) AS y
      |  FROM li),
      |pers AS (
      |  SELECT g, sc, COUNT(*) AS n, SUM(y) AS p
      |  FROM planted GROUP BY g, sc),
      |ranked AS (
      |  SELECT g, n, p,
      |    COALESCE(SUM(n) OVER (PARTITION BY g ORDER BY sc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      |  FROM pers),
      |agg AS (
      |  SELECT g, SUM(p * (cb * 2 + n + 1)) AS r2,
      |    SUM(p) AS pos, SUM(n) - SUM(p) AS neg
      |  FROM ranked GROUP BY g)
      |SELECT g, CAST(pos AS BIGINT) AS pos, CAST(neg AS BIGINT) AS neg,
      |  ROUND(CAST(r2 - pos * (pos + 1) AS DOUBLE)
      |    / CAST(pos * neg * 2 AS DOUBLE), 6) AS auc,
      |  ROUND(CAST(r2 - pos * (pos + 1) AS DOUBLE)
      |    / CAST(pos * neg AS DOUBLE) - 1.0, 6) + 0.0 AS gini
      |FROM agg WHERE pos > 0 AND neg > 0 ORDER BY g""".stripMargin

  /** ml_isotonic — ISOTONIC CALIBRATION (the monotone fit sklearn's
    * calibrated classifiers use): the weighted isotonic regression of
    * per-score empirical positive rates, computed NOT by the sequential
    * pool-adjacent-violators loop but by its exact MIN-MAX
    * characterization (Barlow et al. 1972):
    * `ŷ_i = max_{j≤i} min_{k≥i} (Σ_{j..k} pos) / (Σ_{j..k} n)` —
    * pure relational algebra over the BOUNDED per-score frame (the
    * fact table collapses to |distinct scores| rows inside the scan, so
    * the cubic triple enumeration runs over ~50³ rows per group, never
    * the corpus).
    *
    * Exactness: every candidate average is a fraction of 64-bit prefix
    * sums with numerator and denominator far below 2²⁶, and two DISTINCT
    * such fractions differ by at least 1/(N·N′) > 2⁻⁵², so their DOUBLE
    * images never collide or cross — min/max over the doubles IS the
    * exact fraction order, and both engines emit the identical
    * floor-quantized fit (the round-11 rounding discipline).
    */
  def mlIsotonic(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_quantity").cast("long").as("sc"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")).as("k"))
    // the ml_auc planted-label fixture: a noisy monotone signal, so the
    // isotonic fit has real pooling work to do
    val planted = li.withColumn("y",
      (col("sc") * 1000 + pmod(Hashing.md5Long(col("k")), lit(50000L))
        > 28000).cast("long"))
    val pers = planted.groupBy("g", "sc")
      .agg(count(lit(1)).as("n"), sum("y").as("p"))
      .localCheckpoint(true) // bounded frame feeds pairs and the report
    val wPre = Window.partitionBy("g").orderBy("sc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = pers.select(col("g"), col("sc"),
      sum("n").over(wPre).as("nn"), sum("p").over(wPre).as("pp"))
    // interval averages (j..k): prefix-sum differences; j inclusive via
    // the j-row's own (n,p) added back
    val jside = pers.select(col("g").as("jg"), col("sc").as("jsc"),
      col("n").as("jn"), col("p").as("jp"))
    val pairs = pre.as("a").join(pre.as("b"), col("a.g") === col("b.g") &&
        col("a.sc") <= col("b.sc"))
      .join(jside,
        col("a.g") === col("jg") && col("a.sc") === col("jsc"))
      .select(col("a.g").as("g"), col("a.sc").as("j"), col("b.sc").as("k"),
        ((col("b.pp") - col("a.pp") + col("jp")).cast("double") /
          (col("b.nn") - col("a.nn") + col("jn")).cast("double")).as("v"))
    // triples j <= i <= k over the bounded score frame
    val scores = pers.select(col("g"), col("sc").as("i"))
    val inner = pairs.join(scores,
        Seq("g")).where(col("j") <= col("i") && col("i") <= col("k"))
      .groupBy("g", "i", "j").agg(min("v").as("mn"))
    val fit = inner.groupBy("g", "i").agg(max("mn").as("fit"))
      .withColumnRenamed("g", "fg")
    pers.join(fit, pers("g") === col("fg") && col("sc") === col("i"))
      .select(pers("g"), col("sc"), col("n"), col("p"),
        floor(col("p").cast("double") / col("n").cast("double") * 1000000)
          .cast("long").as("rate_e6"),
        floor(col("fit") * 1000000).cast("long").as("fit_e6"))
      .orderBy("g", "sc")
  }

  val mlIsotonicOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS sc,
      |    CAST(l_orderkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber AS VARCHAR) AS k
      |  FROM lineitem),
      |planted AS (
      |  SELECT g, sc,
      |    CAST(sc * 1000 +
      |      (('0x' || substr(md5(k), 1, 15))::BIGINT % 50000) > 28000
      |      AS BIGINT) AS y
      |  FROM li),
      |pers AS MATERIALIZED (
      |  SELECT g, sc, COUNT(*) AS n, SUM(y) AS p
      |  FROM planted GROUP BY g, sc),
      |pre AS MATERIALIZED (
      |  SELECT g, sc,
      |    SUM(n) OVER w AS nn, SUM(p) OVER w AS pp
      |  FROM pers
      |  WINDOW w AS (PARTITION BY g ORDER BY sc
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |pairs AS MATERIALIZED (
      |  SELECT a.g, a.sc AS j, b.sc AS k,
      |    CAST(b.pp - a.pp + jj.p AS DOUBLE)
      |      / CAST(b.nn - a.nn + jj.n AS DOUBLE) AS v
      |  FROM pre a
      |  JOIN pre b ON a.g = b.g AND a.sc <= b.sc
      |  JOIN pers jj ON jj.g = a.g AND jj.sc = a.sc),
      |inner_min AS MATERIALIZED (
      |  SELECT p.g, s.sc AS i, p.j, MIN(p.v) AS mn
      |  FROM pairs p JOIN pers s
      |    ON s.g = p.g AND p.j <= s.sc AND s.sc <= p.k
      |  GROUP BY p.g, s.sc, p.j),
      |fit AS MATERIALIZED (
      |  SELECT g, i, MAX(mn) AS fit FROM inner_min GROUP BY g, i)
      |SELECT pers.g AS g, pers.sc AS sc, CAST(pers.n AS BIGINT) AS n,
      |  CAST(pers.p AS BIGINT) AS p,
      |  CAST(FLOOR(CAST(pers.p AS DOUBLE) / CAST(pers.n AS DOUBLE)
      |    * 1000000) AS BIGINT) AS rate_e6,
      |  CAST(FLOOR(fit.fit * 1000000) AS BIGINT) AS fit_e6
      |FROM pers JOIN fit ON pers.g = fit.g AND pers.sc = fit.i
      |ORDER BY pers.g, pers.sc""".stripMargin

  /** The nDCG position discounts as FIXED-POINT integers —
    * `w_i = round(1e9 / log2(i+1))` for ranks 1..10, generated once with
    * StrictMath on the driver and interpolated into BOTH engines as
    * literals (the mm_frame_dct cosine-table trick applied to log2):
    * no libm call ever runs inside a query, so the discounted sums are
    * exact 64-bit integer arithmetic on any engine.
    */
  private[operators] val NdcgW: IndexedSeq[Long] = (1 to 10).map(i =>
    Math.round(1e9 / (StrictMath.log(i + 1.0) / StrictMath.log(2.0))))

  /** ml_ndcg — normalized discounted cumulative gain at 10 (the ranking
    * metric every retrieval eval reports beside AUC's classification
    * view): per query group, items rank by an integer score
    * (deterministic ties) and planted graded relevances 0..3 accumulate
    * as `Σ (2^rel − 1)·w_rank` in the fixed-point discount units; the
    * ideal ordering re-ranks by relevance for the normalizer, and the
    * single final division floor-quantizes. One map-side-combined
    * aggregate builds the item frame; both rankings are windows over
    * the bounded per-group top-10 — no corpus-sized sort.
    */
  def mlNdcg(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 8000)
      .groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).as("cnt"),
        floor(sum("l_extendedprice") / count(lit(1))).cast("long")
          .as("score"))
      .withColumn("g", pmod(col("k"), lit(7L)))
      // planted graded relevance correlated with the score + hash noise
      .withColumn("rel", least(lit(3L),
        (col("score") * 4L + pmod(Hashing.md5Long(col("k").cast("string")),
          lit(200000L))) / lit(120000L)).cast("long"))
    val wRank = Window.partitionBy("g")
      .orderBy(col("score").desc, col("k"))
    val wIdeal = Window.partitionBy("g")
      .orderBy(col("rel").desc, col("k"))
    val wTable = expr(s"array(${NdcgW.mkString("L,")}L)")
    val ranked = items
      .withColumn("r", row_number().over(wRank))
      .withColumn("ri", row_number().over(wIdeal))
      .withColumn("gain", expr("CAST(shiftleft(1L, CAST(rel AS INT)) - 1 AS BIGINT)"))
      .withColumn("dcg_part",
        when(col("r") <= 10, col("gain") *
          element_at(wTable, col("r").cast("int"))).otherwise(lit(0L)))
      .withColumn("idcg_part",
        when(col("ri") <= 10, col("gain") *
          element_at(wTable, col("ri").cast("int"))).otherwise(lit(0L)))
    ranked.groupBy("g")
      .agg(count(lit(1)).as("n_items"),
        sum("dcg_part").as("dcg_u"), sum("idcg_part").as("idcg_u"))
      .select(col("g"), col("n_items"), col("dcg_u"), col("idcg_u"),
        // NULLIF keeps the query total: an all-zero-relevance group
        // yields NULL, never 0/0 = NaN (whose BIGINT cast diverges
        // between engines — Spark saturates, DuckDB errors)
        floor(col("dcg_u").cast("double") /
            nullif(col("idcg_u"), lit(0L)).cast("double")
          * 1000000).cast("long").as("ndcg10_e6"))
      .orderBy("g")
  }

  val mlNdcgOracle: String = {
    val wVals = Metrics.NdcgW.zipWithIndex
      .map { case (w, i) => s"(${i + 1}, CAST($w AS BIGINT))" }
      .mkString(", ")
    s"""WITH w(r, wt) AS (VALUES $wVals),
      |items AS MATERIALIZED (
      |  SELECT l_orderkey AS k, COUNT(*) AS cnt,
      |    CAST(FLOOR(SUM(l_extendedprice) / COUNT(*)) AS BIGINT) AS score
      |  FROM lineitem WHERE l_orderkey <= 8000 GROUP BY 1),
      |graded AS MATERIALIZED (
      |  SELECT k, cnt, score, k % 7 AS g,
      |    LEAST(3, (score * 4 +
      |      (('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT
      |        % 200000)) // 120000) AS rel
      |  FROM items),
      |ranked AS (
      |  SELECT g, rel,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY score DESC, k) AS r,
      |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY rel DESC, k) AS ri
      |  FROM graded),
      |parts AS (
      |  SELECT g,
      |    CASE WHEN r <= 10
      |      THEN ((1 << rel) - 1) * (SELECT wt FROM w WHERE w.r = ranked.r)
      |      ELSE 0 END AS dcg_part,
      |    CASE WHEN ri <= 10
      |      THEN ((1 << rel) - 1) * (SELECT wt FROM w WHERE w.r = ranked.ri)
      |      ELSE 0 END AS idcg_part
      |  FROM ranked)
      |SELECT g, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(dcg_part) AS BIGINT) AS dcg_u,
      |  CAST(SUM(idcg_part) AS BIGINT) AS idcg_u,
      |  CAST(FLOOR(CAST(SUM(dcg_part) AS DOUBLE)
      |    / CAST(NULLIF(SUM(idcg_part), 0) AS DOUBLE) * 1000000) AS BIGINT)
      |    AS ndcg10_e6
      |FROM parts GROUP BY g ORDER BY g""".stripMargin
  }

  /** DBSCAN parameters shared textually with the oracle: eps in the
    * integer milli-units of the quantized feature grid, the classic
    * minPts=5 (the neighborhood count INCLUDES the point itself).
    */
  private[operators] val DbscanEps = 40L
  private[operators] val DbscanMinPts = 5L

  /** The general grid-bucketed eps-neighbor pair generator shared by the
    * registered query and its brute-force equivalence spec: cell width =
    * eps, so every eps-ball lies inside the 3×3 adjacent cells — the
    * pair count is density-bounded, never |points|² (the MinHash-banding
    * argument applied to metric space). Input (k, x, y) integer points;
    * output all ordered pairs (ak, bk) with d² ≤ eps² INCLUDING the
    * self-pair (so a count per ak is the |N_eps| DBSCAN uses).
    */
  private[operators] def epsPairs(pts: DataFrame, eps: Long): DataFrame = {
    val cells = pts.select(col("k"), col("x"), col("y"),
      floor(col("x") / eps.toDouble).cast("long").as("cx"),
      floor(col("y") / eps.toDouble).cast("long").as("cy"))
    // the 9x fan-out multiplies per-row work and AQE coalesces the small
    // aggregated frame to one partition ahead of it — spread first (the
    // ml_knn hazard, same fix)
    val aExp = Spread.ifNarrow(cells)
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("k").as("ak"), col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    aExp.join(cells.select(col("k").as("bk"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= eps * eps)
      .select(col("ak"), col("bk"))
  }

  /** ml_dbscan — density clustering (Ester et al. 1996), the
    * cluster-shape-agnostic sibling of [[Similarity]]'s k-means: core
    * points have ≥ minPts neighbors within eps, clusters are connected
    * components of the core-core eps-graph, border points attach to
    * their minimum-id core's cluster, the rest is noise — the outlier-
    * robust grouping a training-data curator runs over embedding maps.
    *
    * Scale shape: the eps-graph comes from [[epsPairs]]' grid-cell join
    * (density-bounded, no all-pairs), components from the Dedup hybrid
    * union-find (driver under the coded budget, distributed label-prop
    * above it), and the feature frame is one map-side-combined aggregate
    * of the fact table. Determinism: integer grid coordinates, cluster
    * id = min core id per component, border ties to the minimum cluster.
    *
    * The fixture's x-columns sit 250 milli-units apart (> eps), so the
    * ORACLE may treat connectivity as per-column 1-D gaps-and-islands —
    * closed form, no recursion — while the ENGINE runs the general 2-D
    * grid algorithm; DbscanSpec pins the general path against brute
    * force on random point sets where cross-cell adjacency matters.
    */
  def mlDbscan(s: SparkSession, dir: String): DataFrame = {
    val eps = DbscanEps
    val pts = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 5000)
      .groupBy(col("l_orderkey").as("k"))
      .agg((count(lit(1)) / 4.0 - 0.7).as("x1"),
        (sum("l_extendedprice") / count(lit(1)) / 50000.0 - 0.6).as("x2"))
      .select(col("k"),
        expr("CAST(floor(x1 * 1000 + 0.5D) AS BIGINT)").as("x"),
        expr("CAST(floor(x2 * 1000 + 0.5D) AS BIGINT)").as("y"))
    // ONE materialization: the density-bounded pair list feeds the
    // neighbor counts, the core graph and the border attachment (the
    // upstream point aggregate is cheap to recompute; eager checkpoints
    // are whole jobs and would dominate this bounded operator's cost)
    val pairs = epsPairs(pts, eps).localCheckpoint(true)
    val nEps = pairs.groupBy(col("ak").as("k"))
      .agg(count(lit(1)).as("n_eps"))
    val flagged = pts.join(nEps, "k")
      .withColumn("is_core", col("n_eps") >= DbscanMinPts)
    val cores = flagged.filter(col("is_core")).select(col("k"))
    // components over core-core edges; self-loops keep isolated cores
    // in frame (a lone core is its own cluster by definition)
    val coreEdges = pairs
      .join(cores.select(col("k").as("ak")), "ak")
      .join(cores.select(col("k").as("bk")), "bk")
      .select(col("ak").as("a"), col("bk").as("b"))
    val comp = Dedup.connectedComponents(coreEdges)
      .select(col("id").as("k"), col("comp").as("cluster"))
    val coreOut = flagged.filter(col("is_core"))
      .join(comp, "k")
      .select(col("k"), lit("core").as("role"), col("cluster"),
        col("n_eps"))
    val borderOut = flagged.filter(!col("is_core"))
      .join(pairs.select(col("ak").as("k"), col("bk")), "k")
      .join(comp.select(col("k").as("bk"), col("cluster")), "bk")
      .groupBy(col("k"))
      .agg(min("cluster").as("cluster")) // deterministic tie-break
      .join(flagged.select(col("k"), col("n_eps")), "k")
      .select(col("k"), lit("border").as("role"), col("cluster"),
        col("n_eps"))
    val assigned = coreOut.unionByName(borderOut)
    val noiseOut = flagged
      .join(assigned.select(col("k")), Seq("k"), "left_anti")
      .select(col("k"), lit("noise").as("role"),
        lit(null).cast("long").as("cluster"), col("n_eps"))
    assigned.unionByName(noiseOut).orderBy("k")
  }

  /** The [[mlDbscan]] oracle: quadratic definitional neighbor counts,
    * per-column gaps-and-islands core connectivity (exact for the
    * 250-spaced fixture columns — see the scaladoc), min-core border
    * attachment.
    */
  val mlDbscanOracle: String =
    s"""WITH lc AS (
      |  SELECT l_orderkey AS k, COUNT(*) / 4.0 - 0.7 AS x1,
      |    SUM(l_extendedprice) / COUNT(*) / 50000.0 - 0.6 AS x2
      |  FROM lineitem WHERE l_orderkey <= 5000 GROUP BY 1),
      |q AS MATERIALIZED (
      |  SELECT k, CAST(floor(x1 * 1000 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(x2 * 1000 + 0.5) AS BIGINT) AS y
      |  FROM lc),
      |n AS MATERIALIZED (
      |  SELECT a.k, a.x, a.y, COUNT(*) AS n_eps
      |  FROM q a JOIN q b
      |    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |       <= ${DbscanEps * DbscanEps}
      |  GROUP BY a.k, a.x, a.y),
      |cores AS MATERIALIZED (
      |  SELECT k, x, y FROM n WHERE n_eps >= ${DbscanMinPts}),
      |-- x-columns are 250 apart (> eps): core connectivity is exactly
      |-- per-column 1-D islands over y-gaps <= eps
      |gaps AS MATERIALIZED (
      |  SELECT k, x, y,
      |    CASE WHEN y - LAG(y) OVER (PARTITION BY x ORDER BY y, k)
      |           <= ${DbscanEps} THEN 0 ELSE 1 END AS brk
      |  FROM cores),
      |isl AS MATERIALIZED (
      |  SELECT k, x, y,
      |    SUM(brk) OVER (PARTITION BY x ORDER BY y, k
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM gaps),
      |comp AS MATERIALIZED (
      |  SELECT k, MIN(k) OVER (PARTITION BY x, island) AS cluster
      |  FROM isl),
      |core_out AS (
      |  SELECT n.k, 'core' AS role, comp.cluster, n.n_eps
      |  FROM n JOIN comp ON n.k = comp.k),
      |border_out AS (
      |  SELECT n.k, 'border' AS role, MIN(comp.cluster) AS cluster,
      |    MIN(n.n_eps) AS n_eps
      |  FROM n
      |  JOIN q a ON a.k = n.k
      |  JOIN cores c ON (a.x - c.x) * (a.x - c.x)
      |    + (a.y - c.y) * (a.y - c.y) <= ${DbscanEps * DbscanEps}
      |  JOIN comp ON comp.k = c.k
      |  WHERE n.n_eps < ${DbscanMinPts}
      |  GROUP BY n.k),
      |assigned AS (
      |  SELECT * FROM core_out UNION ALL SELECT * FROM border_out)
      |SELECT k, role, cluster, CAST(n_eps AS BIGINT) AS n_eps FROM assigned
      |UNION ALL
      |SELECT n.k, 'noise', NULL, CAST(n.n_eps AS BIGINT)
      |FROM n WHERE n.k NOT IN (SELECT k FROM assigned)
      |ORDER BY k""".stripMargin

  /** ml_anova — one-way ANOVA F statistic across order-status groups,
    * the k-group generalization of [[mlAbTest]]'s two-group z test
    * (the experiment-analysis pair every training-data A/B/n pipeline
    * needs). All moments are EXACT INTEGER sufficient statistics
    * (prices in cents): per group n_g, Σx, Σx² — one map-side-combined
    * aggregate, three LONG columns move. F = (SSB/(k−1))/(SSW/(n−k))
    * is then one driver-free projection evaluated in a FIXED operation
    * order from those integers, so the oracle reproduces the double
    * bit-for-bit; ROUND(6) absorbs the engines' decimal printers.
    */
  def mlAnova(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      col("o_orderstatus").as("g"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val grp = o.groupBy("g").agg(
      count(lit(1)).as("n_g"), sum("cents").as("s_g"),
      // cents² sums overflow Long past ~sf0.03 — accumulate exactly in
      // decimal (the oracle mirrors with HUGEINT)
      sum(col("cents").cast("decimal(20,0)") *
        col("cents").cast("decimal(20,0)")).as("q_g"))
    grp.agg(
        count(lit(1)).as("k_groups"),
        sum("n_g").as("n_total"),
        sum("s_g").as("s_all"),
        // Σ s_g²/n_g must be ORDER-FIXED, not a float SUM whose
        // accumulation order varies by partitioning: collect the k
        // per-group exact integers (k = #groups, tiny by construction),
        // sort by group key, and fold left-to-right — bit-identical on
        // every run and mirrored by the oracle's
        // list_reduce(list_sort(...)) fold
        sort_array(collect_list(struct(col("g"), col("n_g"), col("s_g"))))
          .as("gs"),
        sum("q_g").as("q_all"))
      .withColumn("ssb_raw", aggregate(col("gs"), lit(0.0),
        (acc, x) => acc + x.getField("s_g").cast("double") *
          x.getField("s_g").cast("double") /
          x.getField("n_g").cast("double")))
      .select(col("k_groups"), col("n_total"),
        round(
          ((col("ssb_raw") -
            col("s_all").cast("double") * col("s_all").cast("double") /
              col("n_total").cast("double")) /
            (col("k_groups") - 1).cast("double")) /
          ((col("q_all").cast("double") - col("ssb_raw")) /
            (col("n_total") - col("k_groups")).cast("double")),
          6).as("f_stat"))
  }

  val mlAnovaOracle: String =
    """WITH o AS (SELECT o_orderstatus AS g,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |grp AS (SELECT g, COUNT(*) AS n_g, SUM(cents) AS s_g,
      |    SUM(CAST(cents AS HUGEINT) * cents) AS q_g FROM o GROUP BY g),
      |agg AS (SELECT COUNT(*) AS k_groups, SUM(n_g) AS n_total,
      |    SUM(s_g) AS s_all,
      |    -- order-FIXED fold mirroring the engine's
      |    -- aggregate(sort_array(...)): never a float SUM whose
      |    -- accumulation order could drift between runs
      |    list_reduce(
      |      list_transform(
      |        list_sort(LIST({'g': g, 'n_g': n_g, 's_g': s_g})),
      |        x -> CAST(x.s_g AS DOUBLE) * CAST(x.s_g AS DOUBLE)
      |             / CAST(x.n_g AS DOUBLE)),
      |      (a, b) -> a + b) AS ssb_raw,
      |    SUM(q_g) AS q_all FROM grp)
      |SELECT CAST(k_groups AS BIGINT) AS k_groups,
      |  CAST(n_total AS BIGINT) AS n_total,
      |  ROUND(((ssb_raw - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
      |           / CAST(n_total AS DOUBLE))
      |         / CAST(k_groups - 1 AS DOUBLE))
      |        / ((CAST(q_all AS DOUBLE) - ssb_raw)
      |           / CAST(n_total - k_groups AS DOUBLE)), 6) AS f_stat
      |FROM agg""".stripMargin

  /** ml_kaplan_meier — the Kaplan–Meier survival estimator over order
    * lifetimes (duration = days since the TPC-H epoch; status 'F'
    * events, others right-censored): at each event day t,
    * S(t) = Π_{s≤t} (1 − d_s / n_s) with n_s the at-risk count — THE
    * standard time-to-event curve (churn, failure, label-latency
    * analysis). Shape: one groupBy(day) shrinks the table to ≤ the
    * calendar-day count (~2.4 k at any sf — bounded by the date
    * domain, not the data), then the at-risk and survival prefixes run
    * as windows over that bounded frame; the product is
    * exp(Σ ln(1−d/n)) — both engines evaluate the same double chain on
    * the same exact integer (d, n) pairs, ROUND(4) absorbing ULP
    * drift. Emits only event days (d_t > 0), censoring folded into the
    * at-risk denominator — the estimator's defining property.
    */
  def mlKaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders").select(
      datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
        .cast("long").as("day"),
      (col("o_orderstatus") === "F").cast("long").as("event"))
    val byDay = o.groupBy("day").agg(
      sum("event").as("d"), count(lit(1)).as("leave"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_at_risk",
        sum("leave").over(Window.orderBy("day").rowsBetween(
          Window.currentRow, Window.unboundedFollowing)))
      .withColumn("surv", exp(sum(
        log(lit(1.0) - col("d").cast("double") /
          col("n_at_risk").cast("double"))).over(w)))
      .filter(col("d") > 0)
      .select(col("day"), col("d").as("n_events"),
        (col("leave") - col("d")).as("n_censored"),
        col("n_at_risk"), round(col("surv"), 4).as("survival"))
      .orderBy("day")
  }

  val mlKaplanMeierOracle: String =
    """WITH o AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
      |        o_orderdate) AS BIGINT) AS day,
      |    CAST(o_orderstatus = 'F' AS BIGINT) AS event
      |  FROM orders),
      |byday AS (SELECT day, SUM(event) AS d, COUNT(*) AS leave_cnt
      |  FROM o GROUP BY day),
      |wd AS (SELECT day, d, leave_cnt,
      |    SUM(leave_cnt) OVER (ORDER BY day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS n_at_risk FROM byday),
      |sv AS (SELECT day, d, leave_cnt, n_at_risk,
      |    EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)))
      |      OVER (ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
      |  FROM wd)
      |SELECT day, CAST(d AS BIGINT) AS n_events,
      |  CAST(leave_cnt - d AS BIGINT) AS n_censored,
      |  CAST(n_at_risk AS BIGINT) AS n_at_risk,
      |  ROUND(surv, 4) AS survival
      |FROM sv WHERE d > 0 ORDER BY day""".stripMargin
}
