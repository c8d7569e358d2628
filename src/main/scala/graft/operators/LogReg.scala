package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Iteratively trained binary classifier — the discriminative baseline
  * beside [[NaiveBayes]] (generative) and [[Regression]] (closed-form):
  * gradient descent on a logistic-style model, in the shape that works
  * at 100 TB AND survives a hash-compared external oracle.
  *
  * Two deliberate deviations from textbook logistic regression, both in
  * service of bit-exact cross-engine determinism (the [[Pca]] playbook):
  *
  *   - the link is the ALGEBRAIC sigmoid `σ(z) = 1/2 + z/(2(1+|z|))`
  *     (a standard fast-sigmoid surrogate: same range, shape, and
  *     monotonicity as the logistic link) — computed from +,·,/,|·|
  *     only, so IEEE doubles make it BIT-IDENTICAL on any engine,
  *     where `exp` differs in ULPs across libm implementations;
  *   - per-row gradient contributions quantize to integers
  *     (`floor(σ·10⁶ + 0.5) − y·10⁶`, features pre-quantized like
  *     [[Pca]]), so every distributed sum is EXACT 64-bit arithmetic —
  *     order-independent across partitions and engines. Only the
  *     driver-side weight update touches floats, and each iteration
  *     re-syncs with the 12-decimal rounding barrier.
  *
  * Scale shape: per iteration ONE map-side-combined aggregate of three
  * Long sums over the quantized feature frame (localCheckpointed once);
  * the loop is a fixed bounded budget (the `graph_pagerank` pattern);
  * driver state is three doubles. Scoring is one more row-local pass.
  * Exactness bound: |r·xq| ≤ 10⁶·xscale·max|x| per row — at 10⁶ rows
  * and the default scales the sums sit near 2^60; past that ANSI
  * overflow fails loudly (the [[Regression]] contract; rescale there).
  */
object LogReg {

  /** Algebraic sigmoid as a SQL string over `z` — shared verbatim with
    * the oracle.
    */
  private def sigmaSql(z: String): String =
    s"0.5D + ($z) / (2.0D * (1.0D + abs($z)))"

  /** Train `iters` gradient steps and score every row. Output:
    * (idCol, p, yhat, y, w0, w1, w2) with p rounded to 4 decimals and
    * the shared weights rounded to 6.
    */
  def train(df: DataFrame, idCol: String, yCol: String,
            x1Col: String, x2Col: String,
            xScale: Int = 1000, iters: Int = 8,
            lr: Double = 2.0): DataFrame = {
    val q = df.select(col(idCol),
        col(yCol).cast("long").as("y"),
        expr(s"CAST(floor(CAST($x1Col AS DOUBLE) * $xScale + 0.5D) AS BIGINT)")
          .as("xq1"),
        expr(s"CAST(floor(CAST($x2Col AS DOUBLE) * $xScale + 0.5D) AS BIGINT)")
          .as("xq2"))
      .localCheckpoint(true) // feeds every iteration AND the final scoring
    val nRow = q.agg(count(lit(1))).head().getLong(0)
    require(nRow > 0, "logreg needs a non-empty input")
    var w = Array(0.0, 0.0, 0.0)
    var it = 0
    while (it < iters) {
      val z = s"(${w(0)}D + ${w(1)}D * (xq1 / $xScale.0D) " +
        s"+ ${w(2)}D * (xq2 / $xScale.0D))"
      val r = s"(CAST(floor((${sigmaSql(z)}) * 1000000.0D + 0.5D) AS BIGINT)" +
        s" - y * 1000000L)"
      val g = q.agg(
        sum(expr(r)).as("g0"),
        sum(expr(s"$r * xq1")).as("g1"),
        sum(expr(s"$r * xq2")).as("g2")).head()
      // weight update on the driver; 12-decimal re-sync absorbs any
      // representation noise far below the output rounding
      def upd(wi: Double, gi: Long, unit: Double): Double =
        BigDecimal(wi - lr * gi / (nRow.toDouble * 1e6 * unit))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      w = Array(
        upd(w(0), g.getLong(0), 1.0),
        upd(w(1), g.getLong(1), xScale.toDouble),
        upd(w(2), g.getLong(2), xScale.toDouble))
      it += 1
    }
    val z = s"(${w(0)}D + ${w(1)}D * (xq1 / $xScale.0D) " +
      s"+ ${w(2)}D * (xq2 / $xScale.0D))"
    q.select(col(idCol),
      (round(expr(sigmaSql(z)), 4) + lit(0.0)).as("p"),
      expr(s"CAST(${sigmaSql(z)} > 0.5D AS INT)").cast("long").as("yhat"),
      col("y"),
      // + 0.0 normalizes a weight that rounds to exactly zero to +0.0
      // (DuckDB ROUND can return -0.0) — the repo-wide convention
      (lit(BigDecimal(w(0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) + lit(0.0)).as("w0"),
      (lit(BigDecimal(w(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) + lit(0.0)).as("w1"),
      (lit(BigDecimal(w(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) + lit(0.0)).as("w2"))
  }

  /** Registered query: recover a PLANTED linear model — the classifier
    * verification fixture in the [[Pca]] planted-direction tradition,
    * necessary here because the synthetic tables are generated
    * independently (no cross-column signal exists to learn). Features =
    * centered lineitem count and mean per-line price; label =
    * `x1 + 2·x2 + u > 0` with `u` deterministic hash noise in
    * [−0.5, 0.5) — irreducible error by construction, so a correct
    * trainer lands strictly between the base rate and 1.0 with BOTH
    * classes predicted, and a broken gradient shows up as a degenerate
    * constant prediction. On real data the label is just a column.
    */
  def mlLogReg(spark: SparkSession, dir: String): DataFrame = {
    val lc = Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 20000)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg((count(lit(1)) / 4.0 - 0.7).as("x1"),
        (sum("l_extendedprice") / count(lit(1)) / 50000.0 - 0.6).as("x2"))
    val planted = lc.withColumn("y",
      (col("x1") + lit(2.0) * col("x2") +
        (pmod(Hashing.md5Long(col("o_orderkey").cast("string")), lit(1000))
          / 1000.0 - 0.5) > 1.3).cast("long"))
    LogReg.train(planted, "o_orderkey", "y", "x1", "x2",
        iters = 12, lr = 8.0)
      .orderBy("o_orderkey")
  }

  /** Registered query: CALIBRATION audit of the trained classifier —
    * the reliability-diagram statistic every deployed model is
    * monitored with: scores bucket by predicted-probability decile, and
    * each bucket reports its size, mean predicted probability, and
    * EMPIRICAL positive rate plus the gap between them (a
    * well-calibrated model has |gap| near 0 in every populated bucket;
    * drift here fires before accuracy moves). One more
    * map-side-combined aggregate over the scored frame.
    */
  def mlCalibration(spark: SparkSession, dir: String): DataFrame =
    mlLogReg(spark, dir)
      .withColumn("bucket",
        least(lit(9L), floor(col("p") * 10).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(avg("p"), 4).as("mean_p"),
        round(avg(col("y").cast("double")), 4).as("frac_pos"),
        (round(avg("p") - avg(col("y").cast("double")), 4) + lit(0.0))
          .as("gap"))
      .orderBy("bucket")

  /** The DuckDB oracle: the identical recurrence unrolled — same
    * quantization, same algebraic sigmoid string, same integer gradient
    * sums (exact at any order), same 12-decimal weight re-sync — so
    * every probability and weight reproduces bit-for-bit.
    */
  /** The oracle's sigmoid spelling (same algebra as [[sigmaSql]]). */
  def oracleSig(z: String): String = s"0.5 + ($z) / (2.0 * (1.0 + abs($z)))"

  /** The oracle's z at the weights of CTE `p` (requires a `q(id, y,
    * xq1, xq2)` CTE upstream).
    */
  def oracleZ(p: String, xScale: Int): String =
    s"((SELECT w0 FROM $p) + (SELECT w1 FROM $p) * (xq1 / $xScale.0) " +
      s"+ (SELECT w2 FROM $p) * (xq2 / $xScale.0))"

  /** The shared training-recurrence CTE chain (`nn`, `w0`, then
    * g/w pairs through `w_iters`) — the caller's WITH must already
    * define `q(id, y, xq1, xq2)`. Reused by [[oracleSql]] (the planted
    * ml_logreg fixture) and the quality-filter oracle, so there is ONE
    * spelling of the bit-exact recurrence.
    */
  def oracleRecurrence(xScale: Int, iters: Int, lr: Double): String = {
    def sig(z: String) = oracleSig(z)
    def zExpr(p: String) = oracleZ(p, xScale)
    val steps = (1 to iters).map { t =>
      val p = s"w${t - 1}"
      val r = s"(CAST(floor((${sig(zExpr(p))}) * 1000000.0 + 0.5) " +
        s"AS BIGINT) - y * 1000000)"
      s"""g$t AS (SELECT CAST(SUM($r) AS BIGINT) AS g0,
         |  CAST(SUM($r * xq1) AS BIGINT) AS g1,
         |  CAST(SUM($r * xq2) AS BIGINT) AS g2 FROM q),
         |w$t AS MATERIALIZED (SELECT
         |  ROUND((SELECT w0 FROM w${t - 1})
         |    - $lr * g0 / ((SELECT n FROM nn) * 1e6 * 1.0), 12) AS w0,
         |  ROUND((SELECT w1 FROM w${t - 1})
         |    - $lr * g1 / ((SELECT n FROM nn) * 1e6 * $xScale.0), 12) AS w1,
         |  ROUND((SELECT w2 FROM w${t - 1})
         |    - $lr * g2 / ((SELECT n FROM nn) * 1e6 * $xScale.0), 12) AS w2
         |  FROM g$t)""".stripMargin
    }.mkString(",\n")
    s"""nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM q),
       |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
       |$steps""".stripMargin
  }

  def oracleSql(xScale: Int = 1000, iters: Int = 8,
                lr: Double = 2.0): String = {
    def sig(z: String) = oracleSig(z)
    def zExpr(p: String) = oracleZ(p, xScale)
    s"""WITH lc AS (
       |  SELECT l_orderkey AS o_orderkey, COUNT(*) / 4.0 - 0.7 AS x1,
       |    SUM(l_extendedprice) / COUNT(*) / 50000.0 - 0.6 AS x2
       |  FROM lineitem WHERE l_orderkey <= 20000 GROUP BY 1),
       |base AS (
       |  SELECT o_orderkey, x1, x2,
       |    CAST(x1 + 2.0 * x2 +
       |      ((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
       |         ::BIGINT % 1000) / 1000.0 - 0.5) > 1.3 AS BIGINT) AS y
       |  FROM lc),
       |q AS MATERIALIZED (SELECT o_orderkey, y,
       |  CAST(floor(x1 * $xScale + 0.5) AS BIGINT) AS xq1,
       |  CAST(floor(x2 * $xScale + 0.5) AS BIGINT) AS xq2 FROM base),
       |${oracleRecurrence(xScale, iters, lr)}
       |SELECT o_orderkey,
       |  ROUND(${sig(zExpr(s"w$iters"))}, 4) + 0.0 AS p,
       |  CAST(${sig(zExpr(s"w$iters"))} > 0.5 AS BIGINT) AS yhat, y,
       |  ROUND((SELECT w0 FROM w$iters), 6) + 0.0 AS w0,
       |  ROUND((SELECT w1 FROM w$iters), 6) + 0.0 AS w1,
       |  ROUND((SELECT w2 FROM w$iters), 6) + 0.0 AS w2
       |FROM q ORDER BY o_orderkey""".stripMargin
  }
}
