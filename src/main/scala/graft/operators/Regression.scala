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

  /** Per-group OLS with intercept over two regressors: one aggregate
    * pass, then the row-local Cramer solve.
    */
  def olsTwoFeature(df: DataFrame, groupCol: String, x1: Column, x2: Column,
                    y: Column): DataFrame = {
    // Sums aggregate in the INPUT type (exact long arithmetic for
    // integer-typed callers — the determinism contract above); the cast
    // to double happens on the FINISHED statistics, after the last
    // partial merge, mirroring the oracle's CAST(SUM(..) AS DOUBLE).
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
    val s = raw.select(
      col(groupCol) +: statCols.map(c => col(c).cast("double").as(c)): _*)
    s.select(col(groupCol) +: fitSql.map { case (name, sql) =>
      expr(sql).as(name) }: _*)
  }

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

  /** The two-sided SSE of a split, evaluated in DOUBLE over EXACT
    * integer sufficient statistics — shared verbatim with the oracle so
    * both engines run the identical IEEE expression tree.
    */
  private[graft] val stumpSseSql: String =
    "((CAST(ssl AS DOUBLE) - (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE))" +
      " / CAST(nl AS DOUBLE)) + (CAST(ssr AS DOUBLE)" +
      " - (CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) / CAST(nr AS DOUBLE)))"

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
  def mlStump(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.load(s, dir, "lineitem").select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("v"))
    val perQ = li.groupBy("q").agg(
      count(lit(1)).as("n"), sum("v").as("s"), sum(col("v") * col("v")).as("ss"))
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
      .select(col("q").as("threshold"),
        col("nl").as("n_left"), col("nr").as("n_right"),
        expr("ROUND(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 4)").as("mean_left"),
        expr("ROUND(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE), 4)").as("mean_right"),
        expr(s"ROUND($stumpSseSql, 2)").as("sse"))
      .orderBy(col("sse"), col("threshold"))
      .limit(3)
  }
}
