package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Hashing.md5Long

/** Wide-table reshaping, sessionization, profiling and sampling — the
  * analytics layer a warehouse user of the reference's `export_query` /
  * `stage_final_query` contract (reference dags/cloudsql_to_bigquery.py:66,
  * 70,110) would run downstream of every sync.
  *
  * Scale notes (100 TB honesty):
  *   - [[pivotOrders]] passes EXPLICIT pivot values — the two-pass
  *     `pivot(col)` form runs a distinct-collect job over the fact table
  *     first, which is a full extra scan at 100 TB.
  *   - [[sessionize]] is one shuffle on user_id + an ordered window pass —
  *     the batch twin of the streaming session_window (EventsStream).
  *   - [[profile]] scans per column with column pruning, so each pass reads
  *     one parquet column, not the table; profiling N columns costs N
  *     pruned scans, never N full-table scans.
  *   - [[hashSample]] is a deterministic hash-mod filter — row-local, no
  *     shuffle, reproducible across engines and runs (TABLESAMPLE and
  *     `DataFrame.sample` are seed-stable only within one engine).
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q25 — pivot: order-year rows × order-status columns, revenue cells.
    * Explicit status values (bounded domain) keep it single-pass.
    */
  def pivotOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
      .orderBy("yr")

  /** Q26 — unpivot (melt): wide per-nation aggregate back to long
    * (nation, metric, value) form. The inverse reshape of Q25.
    */
  def unpivotCustomer(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey").as("nation"))
      .agg(
        round(count(lit(1)).cast("double"), 2).as("n_cust"),
        // integer-cents mean, ROUNDED AT THE CENT: the cents sum is exact
        // in any summation order, and a true rounding boundary is then an
        // exactly-representable x.5 — the one case Spark's decimal-aware
        // round and a binary round agree on. (Rounding the dollar value
        // hits inexact .xx5 shortest-representation boundaries where the
        // two pipelines disagree — seen at sf0.001.)
        (round(sum(expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)"))
          .cast("double") / count(lit(1)), 0).cast("double") / 100.0).as("avg_bal"),
        round(max("c_acctbal"), 2).as("max_bal"))
      .unpivot(Array(col("nation")), Array(col("n_cust"), col("avg_bal"), col("max_bal")),
        "metric", "value")
      .orderBy("nation", "metric")

  /** Q27 — batch sessionization: a session breaks after a 30-minute silence
    * per user (lag + cumulative flag sum). One shuffle on user_id; the
    * window never re-partitions afterwards.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("duration_sec"))
      .orderBy("user_id", "session_seq")
  }

  /** Q29 — per-column data profile of a table: one pruned scan per column
    * (ReadSchema = that single column), long output so the schema is fixed
    * no matter how wide the table is. Numeric min/max in value space;
    * string columns profile length instead (keeps the output column typed
    * DOUBLE, not a stringly union).
    */
  def profile(s: SparkSession, dir: String, table: String = "customer"): DataFrame = {
    val df = t(s, dir, table)
    val parts = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val isNum = f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      val v: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        if (isNum) identity else (x => length(x).cast("double"))
      df.select(f.name).agg(
        lit(f.name).as("col_name"),
        count(lit(1)).as("n_rows"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(c).as("n_distinct"),
        round(min(v(c).cast("double")), 2).as("min_v"),
        round(max(v(c).cast("double")), 2).as("max_v"))
        .select("col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
    }
    parts.reduce(_.unionByName(_)).orderBy("col_name")
  }

  /** Q30 — deterministic stratified sample: systematic hash-mod per
    * stratum, denser for small-key strata (nation < 10 keeps 1-in-5, rest
    * 1-in-10). Pure row-local predicate — reproducible on any engine, no
    * shuffle, no seed state; the scale-safe alternative to sample()/
    * TABLESAMPLE whose row picks are engine-private.
    */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("h", pmod(md5Long(col("c_custkey").cast("string")), lit(10)))
      .filter(
        (col("c_nationkey") < 10 && col("h") < 2) ||
        (col("c_nationkey") >= 10 && col("h") < 1))
      .select(col("c_custkey"), col("c_nationkey"), round(col("c_acctbal"), 2).as("bal"))
      .orderBy("c_custkey")

  /** Q31 — Bloom-pruned semi join: build a Bloom filter over the (small,
    * pre-filtered) key side, prune the probe side row-locally, then exact
    * semi join only the survivors. The Bloom build is one bounded
    * aggregation (driver sketch ~1.2 MB at 1M keys / 1% fpp); the win at
    * 100 TB is that the probe side drops non-matching rows BEFORE the
    * shuffle, which is exactly what Spark's runtime row-level bloom filter
    * (spark.sql.optimizer.runtime.bloomFilter) automates — spelled out here
    * as an explicit operator so the pruning is plan-visible and testable.
    * False positives don't matter for correctness: the semi join re-checks.
    *
    * The probe predicate is Spark's own codegen'd
    * `BloomFilterMightContain` over the serialized sketch (the same
    * expression the runtime filter injects) — a Scala UDF here would
    * break whole-stage codegen on the hottest scan of the query.
    */
  def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.PlanBridge
    val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    val bloom = bigOrders.stat.bloomFilter("o_orderkey", 100000L, 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    val mightContain = PlanBridge.column(BloomFilterMightContain(
      Literal(bytes.toByteArray, org.apache.spark.sql.types.BinaryType),
      PlanBridge.expression(col("l_orderkey"))))
    t(s, dir, "lineitem")
      .filter(mightContain) // row-local pre-shuffle prune, stays in codegen
      .join(bigOrders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 2).as("rev"))
      .orderBy("l_orderkey")
  }

  /** Q35 — array/higher-order function family over the token arrays:
    * sort, distinct, slice, position, element_at — the list-manipulation
    * surface a SQL user of the reference's verbatim-SELECT contract gets
    * from the warehouse. All codegen'd builtins, one scan.
    */
  def arrayFunctions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .select(
        col("doc_id"),
        array_join(slice(array_sort(array_distinct(col("tk"))), 1, 5), ",")
          .as("first5"),
        size(array_distinct(col("tk"))).cast("long").as("n_uniq"),
        array_position(col("tk"), "the").as("pos_the"),
        element_at(col("tk"), 1).as("head_tok"),
        element_at(col("tk"), -1).as("tail_tok"))
      .orderBy("doc_id")

  /** Q36 — ordered string aggregation (LISTAGG/STRING_AGG): deterministic
    * via sort-before-join (collect_set order is engine-private, so the
    * portable form sorts the distinct set). One map-side-combined shuffle.
    */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("lang")
      .agg(
        array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  /** Q37 — time-RANGE window frame: per user, the rolling count/sum of
    * event values over the trailing hour (`RANGE BETWEEN 3600 PRECEDING
    * AND CURRENT ROW` on epoch seconds). The RANGE frame is the piece
    * ROWS frames can't express — peers at the same timestamp enter the
    * frame together, and gaps shrink it. Epoch SECONDS as the ordering
    * key on both engines (Spark's timestamp→long cast truncates to
    * seconds; DuckDB mirrors with floor(epoch(ts))) so frame membership
    * is bit-identical. One shuffle on user_id.
    */
  def rangeFrameWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("es"))
      .rangeBetween(-3600L, 0L)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("es"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("v_1h", round(sum(col("value")).over(w), 2))
      .select("event_id", "user_id", "es", "n_1h", "v_1h")
      .orderBy("event_id")
  }

  /** Q38 — centered ROWS frame + distribution ranks: 3-row moving average
    * (`ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING` — a frame that looks
    * FORWARD, unlike the running/trailing frames of q11/q37) beside
    * percent_rank and cume_dist over the same ordering. One shuffle on
    * the partition key; the ordering (date, key) is unique per partition
    * so every rank is deterministic.
    */
  def windowFrameStats(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val centered = ord.rowsBetween(-1, 1)
    t(s, dir, "orders")
      // exact integer cents: a double moving SUM can differ from another
      // engine's by one ulp, and cents/2 lands exactly on .xx5 where
      // decimal-string rounding (Spark) and binary rounding (others)
      // disagree — so sum exactly in integers and emit the RAW division
      // result (bit-identical IEEE ops on both engines), no rounding
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(col("cents")).over(centered) /
          count(lit(1)).over(centered) / 100.0).as("ma3"),
        round(percent_rank().over(ord), 4).as("pr"),
        round(cume_dist().over(ord), 4).as("cd"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** DQ — declarative data-quality checks, one row per rule: nulls,
    * value ranges, referential integrity, key uniqueness, token floor.
    * The engine-native form of the reference's schema-check step — each
    * rule is a pruned scan or one join, unioned into a fixed-schema
    * report.
    */
  /** Delivery-freshness audit: the calendar from first to last observed
    * event day, each day's row count, and a status — `missing` (no rows
    * at all: a dropped daily sync), `low` (under half the median daily
    * volume: a partial delivery), `ok`. The monitoring query every
    * scheduled pipeline (the reference's daily DAG) needs on its OUTPUT
    * table. One map-side-combined per-day aggregate over the fact table;
    * the calendar join and median run on the |days|-sized frame.
    */
  def dqFreshness(s: SparkSession, dir: String): DataFrame = {
    // |days|-sized; feeds the bounds/median aggregate AND the calendar
    // join — materialized once so the fact table scans once
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"),
      expr("percentile(n, 0.5)").as("med"))
    val cal = bounds.select(explode(expr("sequence(lo, hi)")).as("day"), col("med"))
    cal.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n_rows"),
        when(col("n").isNull, "missing")
          .when(col("n") < col("med") * 0.5, "low")
          .otherwise("ok").as("status"))
      .orderBy("day")
  }

  /** Weekly-seasonality anomaly screen — the per-WEEKDAY sibling of
    * [[dqFreshness]]' global median rule: daily volumes compare against
    * their own weekday's median (Mondays against Mondays), so a quiet
    * weekend never false-alarms and a quiet Tuesday never hides behind
    * the weekend's low global median. Flags: `low`/`high` when the day
    * deviates from its weekday median by more than 40% either way.
    *
    * Shape: ONE fact-sized aggregate to |days| rows, then a weekday
    * median over the bounded 7-group frame and a co-keyed join back —
    * nothing fact-sized moves twice. Exact: counts are longs, the
    * median is the same exact `percentile` both engines interpolate
    * identically, and the 40% band compares `10·n` against `14·med` /
    * `6·med` in integer-valued doubles (no float drift at the boundary).
    */
  def dqSeasonal(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the weekday medians AND the join
    val med = daily
      .groupBy(expr("dayofweek(day)").as("dow"))
      .agg(expr("percentile(n, 0.5)").as("med"))
    daily.withColumn("dow", expr("dayofweek(day)"))
      .join(broadcast(med), "dow")
      .select(col("day"), col("dow").cast("int").as("dow"), col("n"),
        round(col("med"), 1).as("wd_median"),
        when(col("n") * 10.0 < col("med") * 6.0, "low")
          .when(col("n") * 10.0 > col("med") * 14.0, "high")
          .otherwise("ok").as("status"))
      .orderBy("day")
  }

  /** EWMA level-shift monitor over the daily volume series — the
    * time-ADAPTIVE complement to [[dqFreshness]]' static half-median
    * rule: an exponentially weighted moving average (α = 0.3, seeded at
    * the first day) tracks the expected daily volume, and a day is
    * flagged when its count deviates from YESTERDAY's EWMA by more than
    * 1.5× in either direction — catching gradual-baseline pipelines
    * where a global median mislabels the whole early or late range.
    *
    * Determinism/oracle contract: the recursion
    * `ewma_t = α·x_t + (1−α)·ewma_{t−1}` is computed in CLOSED FORM as
    * one windowed sum — `ewma_t = (1−α)^t · (x₀ + α·(T_t − x₀))` with
    * `T_t = Σ_{k≤t} x_k·(1−α)^{−k}` — so both engines evaluate the
    * identical expression tree over exact integer day counts: no
    * sequential state, no order ambiguity. The growing `(1−α)^{−k}`
    * factor loses the oldest days' contributions below double precision
    * after ~100 days — EXACTLY mirroring their true EWMA weight decay,
    * so the loss is semantically invisible (and both engines lose it
    * identically).
    *
    * Scale shape: one map-side-combined per-day aggregate over the fact
    * table; the window runs on the |days|-sized frame (the
    * [[dqFreshness]] cost class).
    */
  def dqEwma(s: SparkSession, dir: String,
             alpha: Double = 0.3, band: Double = 1.5): DataFrame = {
    val w = Window.orderBy("day")
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
    val r = 1.0 / (1.0 - alpha)
    daily
      .withColumn("t", row_number().over(w).cast("double") - 1)
      .withColumn("term", col("n") * pow(lit(r), col("t")))
      .withColumn("x0", first("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .withColumn("tt", sum("term").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ewma",
        pow(lit(1.0 - alpha), col("t")) *
          (col("x0") + lit(alpha) * (col("tt") - col("x0"))))
      .withColumn("ewma_prev", lag("ewma", 1).over(w))
      .select(col("day"), col("n"),
        round(coalesce(col("ewma_prev"), col("n").cast("double")), 4)
          .as("expected"),
        (col("ewma_prev").isNotNull &&
          (col("n") > col("ewma_prev") * band ||
            col("n") < col("ewma_prev") / band)).as("is_anomaly"))
      .orderBy("day")
  }

  /** Robust outlier audit by median absolute deviation — the
    * heavy-tail-safe complement to [[dqOutliers]]' 3-sigma rule (one
    * extreme value inflates a stddev enough to hide every other
    * outlier; the median and MAD are 50%-breakdown robust). A value is
    * flagged when |v − median| > 3 · 1.4826 · MAD (1.4826 scales MAD to
    * sigma under normality — the standard consistency constant).
    *
    * Scale shape: exact per-group medians need a sort-based percentile
    * per pass, and MAD is inherently two-phase (deviations need the
    * median first) — so the value column scans three times, each a
    * 2-column pruned scan, with the tiny per-group frames broadcast
    * back; nothing fact-sized shuffles beyond the percentile sorts.
    */
  def dqMad(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
      .localCheckpoint(true) // feeds the deviation pass AND the report
    val mad = ev.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(first("med").as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
      .localCheckpoint(true)
    ev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(first("med"), 4).as("med"),
        round(first("mad"), 4).as("mad"),
        sum(expr("IF(abs(value - med) > 3.0 * 1.4826 * mad, 1, 0)"))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** Column-level information profiling — the DQ staple that catches a
    * constant-valued column (entropy 0), a key-like column (entropy ≈
    * log n), and silent cardinality collapse after a bad join: Shannon
    * entropy `−Σ p·ln p` (nats) and Gini impurity `1 − Σ p²` per
    * profiled categorical column, plus distinct count and mode share.
    *
    * Shape: one map-side-combined (col, value) aggregate per profiled
    * column over ONE fact scan (the columns unpivot inside the scan
    * stage), then vocabulary-sized math — the corpus never shuffles on
    * row identity. Exact counts; ln is the [[TextAnalysis.pmiTopK]]
    * ROUND(…, 4) cross-engine seam.
    */
  def dqEntropy(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val unpiv = o.select(explode(map(
      lit("o_orderstatus"), col("o_orderstatus"),
      lit("o_orderpriority"), col("o_orderpriority"),
      lit("order_year"), year(col("o_orderdate")).cast("string")))
      .as(Seq("col_name", "v")))
    val counts = unpiv.groupBy("col_name", "v").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("col_name").agg(sum("c").as("n"))
    counts.join(totals, "col_name")
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_distinct"),
        round((-sum((col("c") / col("n")) *
          log(col("c") / col("n")))), 4).as("entropy_nats"),
        round(lit(1.0) - sum((col("c") / col("n")) * (col("c") / col("n"))),
          4).as("gini"),
        round(max(col("c")) / first(col("n")).cast("double"), 4)
          .as("mode_share"))
      .orderBy("col_name")
  }

  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val ords = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val docs = t(s, dir, "documents")
    val rules = Seq(
      cust.filter(col("c_name").isNull)
        .agg(lit("customer_name_null").as("rule"), count(lit(1)).as("violations")),
      ords.filter(col("o_totalprice") <= 0)
        .agg(lit("order_price_nonpositive").as("rule"), count(lit(1)).as("violations")),
      ords.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(lit("order_customer_fk").as("rule"), count(lit(1)).as("violations")),
      li.groupBy("l_orderkey", "l_linenumber").count().filter(col("count") > 1)
        .agg(lit("lineitem_pk_dup").as("rule"), count(lit(1)).as("violations")),
      docs.filter(size(split(col("text"), " ")) < 5)
        .agg(lit("doc_token_floor").as("rule"), count(lit(1)).as("violations")))
    rules.map(_.select("rule", "violations")).reduce(_.unionByName(_))
      .orderBy("rule")
  }

  /** Distribution-drift detection between two snapshots (the retraining
    * trigger a training pipeline gates on): Population Stability Index
    * per column — `Σ (p_curr − p_base) · ln(p_curr / p_base)` over
    * categories (categorical column) or fixed-width bins anchored on the
    * BASELINE's min/max (numeric column; current values outside clamp to
    * the edge bins, proportions clamp at 1e-6 for empty cells — both
    * standard PSI practice). Scale shape: each side is one
    * map-side-combined aggregate down to ≤ max(buckets, |categories|)
    * rows; everything after is constant-size, and the 1-row bin-stats
    * frame broadcasts like tfidf's corpus count.
    */
  def driftPsi(base: DataFrame, curr: DataFrame, catCol: String,
               numCol: String, buckets: Int = 10): DataFrame = {
    val eps = 1e-6
    def psiOf(b: DataFrame, c: DataFrame, keyed: DataFrame => DataFrame,
              metric: String): DataFrame = {
      def props(df: DataFrame, side: String): DataFrame = {
        val k = keyed(df).groupBy("k").agg(count(lit(1)).as("n"))
        k.crossJoin(broadcast(k.agg(sum("n").as("tot"))))
          .select(col("k"), (col("n") / col("tot")).as(s"p_$side"),
            col("tot").as(s"n_$side"))
      }
      props(b, "base").join(props(c, "curr"), Seq("k"), "full_outer")
        .select(
          greatest(coalesce(col("p_base"), lit(0.0)), lit(eps)).as("pb"),
          greatest(coalesce(col("p_curr"), lit(0.0)), lit(eps)).as("pc"),
          col("n_base"), col("n_curr"))
        .agg(lit(metric).as("metric"),
          round(sum((col("pc") - col("pb")) * log(col("pc") / col("pb"))), 6)
            .as("psi"),
          max("n_base").as("n_base"), max("n_curr").as("n_curr"))
    }
    val catPsi = psiOf(base, curr,
      df => df.select(col(catCol).as("k")), s"${catCol}_psi")
    // bin edges anchored on the baseline: least/greatest clamp keeps
    // out-of-range current values in the edge bins
    val stats = broadcast(base.agg(
      min(col(numCol)).as("lo"),
      greatest(max(col(numCol)) - min(col(numCol)), lit(1e-12)).as("range")))
    def bin(df: DataFrame): DataFrame =
      df.crossJoin(stats).select(
        least(greatest(floor((col(numCol) - col("lo")) / col("range")
          * buckets), lit(0.0)), lit((buckets - 1).toDouble)).cast("long").as("k"))
    val numPsi = psiOf(base, curr, bin, s"${numCol}_psi")
    catPsi.unionByName(numPsi).orderBy("metric")
  }

  /** Grouped z-score outlier detection — the statistical data-quality
    * rule beside [[dqChecks]]' structural rules: per event type, values
    * more than `z` sample standard deviations from the group mean are
    * outliers. Two-pass by necessity (mean/stddev need the full group
    * before any row can be scored): one map-side-combined stats
    * aggregate, stats broadcast back onto the stream, one row-local flag
    * + final count — the fact table shuffles once on the (tiny) group
    * key and is never windowed per row.
    */
  def dqOutliers(s: SparkSession, dir: String, z: Double = 3.0): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sd"),
        count(lit(1)).as("n"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"),
        when(col("sd") > 0 && abs(col("value") - col("mu")) > col("sd") * z, 1L)
          .otherwise(0L).as("is_out"))
      .groupBy("event_type")
      .agg(max("n").as("n"), sum("is_out").as("n_outliers"))
      .select(col("event_type"), col("n"), col("n_outliers"),
        round(col("n_outliers") / col("n").cast("double"), 6).as("outlier_frac"))
      .orderBy("event_type")
  }

  /** dq_iqr — Tukey-fence outlier screen (the ROBUST sibling of
    * [[dqOutliers]]' 3-sigma rule: quartiles don't move when the
    * outliers themselves inflate the stddev — the failure mode that
    * makes sigma rules miss exactly what they exist to catch): per
    * group the exact interpolated quartiles, fences at 1.5·IQR, and
    * the fence-breaker count. Quartiles use the same exact
    * `percentile` / `quantile_cont` interpolation rule both engines
    * share; fences are one fixed float expression over them; all
    * emissions are integers or floor-quantized e4 (the ml_stump
    * lesson).
    *
    * Scale: one grouped percentile pass (bounded group count) + one
    * broadcast-stats join + one map-side-combined count — the
    * [[dqOutliers]] shape, the fact table never windows.
    */
  def dqIqr(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.25D)").as("q1"),
        expr("percentile(value, 0.75D)").as("q3"),
        count(lit(1)).as("n"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
    ev.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("n"), col("q1"), col("q3"),
        col("lo"), col("hi"),
        when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L).as("is_out"))
      .groupBy("event_type")
      .agg(max("n").as("n"), sum("is_out").as("n_outliers"),
        max("q1").as("q1"), max("q3").as("q3"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select(col("event_type"), col("n"), col("n_outliers"),
        round(col("n_outliers") / col("n").cast("double"), 6)
          .as("outlier_frac"),
        floor(col("q1") * 10000).cast("long").as("q1_e4"),
        floor(col("q3") * 10000).cast("long").as("q3_e4"),
        floor(col("lo") * 10000).cast("long").as("lo_e4"),
        floor(col("hi") * 10000).cast("long").as("hi_e4"))
      .orderBy("event_type")
  }

  /** Embedding data-quality checks — the vector-side twin of [[dqChecks]]
    * (corrupt embeddings silently poison every ANN/cluster operator
    * downstream, so a pipeline gates on these before indexing): per
    * label, the row count, dimension-mismatch count, non-finite-value
    * count, zero-vector count, and the norm distribution (rounded
    * integer-cents style at 4dp). One scan, one map-side-combined
    * aggregate on the label.
    */
  def dqEmbeddings(s: SparkSession, dir: String, expectDim: Int = 64): DataFrame =
    embeddingChecks(
      t(s, dir, "embeddings")
        .select(col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb")),
      "label", "emb", expectDim)

  /** Core of [[dqEmbeddings]], over any (group, vector) frame. */
  def embeddingChecks(vecs: DataFrame, groupCol: String, embCol: String,
                      expectDim: Int): DataFrame =
    vecs
      .withColumn("norm", sqrt(VectorOps.dotHof(col(embCol), col(embCol))))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(when(size(col(embCol)) =!= expectDim, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(expr(s"exists($embCol, x -> isnan(x) OR abs(x) = CAST('Infinity' AS DOUBLE))"), 1L)
          .otherwise(0L)).as("n_nonfinite"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        round(min("norm"), 4).as("min_norm"),
        round(max("norm"), 4).as("max_norm"))
      .orderBy(groupCol)

  /** Q34 — salted skew join driven end-to-end: lineitem joined to orders
    * on the order key with the fact side salted ([[Skew.saltedJoin]], 8
    * salts) and the dim side replicated — the explicit mitigation for a
    * hot key AQE can't split. Result is provably identical to the
    * unsalted join (the oracle runs the plain join), only the shuffle
    * layout differs.
    */
  def saltedJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val ords = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Skew.saltedJoin(li, ords, "l_orderkey", "l_linenumber", salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
      .orderBy("o_orderpriority")
  }

  /** Q33 — time-series resample + gap fill: aggregate to an hourly grid,
    * generate the missing hours from each key's own [min, max] span
    * (`sequence` + `explode` — the spine is derived, never collected), and
    * forward-fill each gap with the last seen value. One shuffle for the
    * hourly aggregate, one for the spine join, one ordered window pass —
    * the spine explode is per-key row-local. was_gap keeps the fill
    * auditable.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("hr"))
      .agg(round(sum("value"), 2).as("v"))
    val spine = hourly.groupBy("event_type")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("event_type"),
        explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("hr"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("event_type", "hr"), "left")
      .withColumn("v_filled", round(last("v", ignoreNulls = true).over(w), 2))
      .withColumn("was_gap", col("v").isNull.cast("int"))
      .select("event_type", "hr", "v_filled", "was_gap")
      .orderBy("event_type", "hr")
  }

  /** Q32 — bucketed range join: `fact.ts BETWEEN dim.start AND dim.end`
    * re-expressed as an equi-join on overlapping time buckets + residual
    * filter. A plain range join has no equi-key, so Spark must
    * broadcast-nested-loop — O(|L|·|R|) comparisons; bucketing gives the
    * shuffle an equi-key (bucket id), and each interval only replicates
    * into the buckets it overlaps. Interval table here: per-day windows
    * derived from orders dates (stand-in for a calendar/SCD dim).
    */
  def rangeBucketJoin(s: SparkSession, dir: String): DataFrame = {
    // Interval table: days on which at least one error event occurred,
    // window [day, day+1) — a stand-in for a calendar/incident dim.
    val windows = t(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(date_trunc("DAY", col("ts")).as("win_start"))
      .distinct()
      .withColumn("win_end", col("win_start") + expr("INTERVAL 1 DAY"))
    // Both sides key on the day bucket (these intervals span exactly one
    // bucket; a multi-bucket interval would `explode(sequence(...))` into
    // each overlapped bucket — same join shape).
    val facts = t(s, dir, "events")
      .select(col("event_id"), col("ts"))
      .withColumn("bucket", date_trunc("DAY", col("ts")))
    facts.join(windows, col("bucket") === col("win_start") &&
        col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_start")
  }

  /** Q32b — the multi-bucket case of [[rangeBucketJoin]]: 3-day windows
    * explode into each day bucket they overlap (`explode(sequence(...))`),
    * so the equi-join on the bucket still carries the whole interval
    * predicate; the residual range filter removes nothing here (full-day
    * buckets ⊂ window) but stays for the general (partial-bucket) case.
    * Intervals may overlap — an event lands in every window containing it.
    */
  def rangeBucketJoinMulti(s: SparkSession, dir: String): DataFrame = {
    val windows = t(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(date_trunc("DAY", col("ts")).as("win_start"))
      .distinct()
      .withColumn("win_end", col("win_start") + expr("INTERVAL 3 DAY"))
      .withColumn("bucket",
        explode(expr("sequence(win_start, win_start + INTERVAL 2 DAY, INTERVAL 1 DAY)")))
    val facts = t(s, dir, "events")
      .select(col("event_id"), col("ts"))
      .withColumn("bucket", date_trunc("DAY", col("ts")))
    facts.join(windows, Seq("bucket"))
      .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_start")
  }

  /** Q41 — interval-OVERLAP join, the interval×interval case of
    * [[rangeBucketJoin]]'s point-in-interval shape (genomic range joins,
    * incident-vs-activity windows, session-vs-maintenance overlap). Both
    * interval sets explode into the day buckets they cover, the join is
    * an equi-join on the bucket, and each overlapping pair is emitted
    * EXACTLY ONCE — by the row whose bucket equals the pair's FIRST
    * shared bucket, `greatest(start_l, start_r)` — so there is no
    * post-join `distinct` pass at all (the classic dedup-free bucketed
    * interval join). Shipping intervals: [ship day, ship day + qty%7+1]
    * — deterministic from the data; windows: 3-day incident windows
    * anchored on urgent high-value order days.
    *
    * Scale shape: the bucket explode is a row-local flatMap bounded by
    * the interval span / grid ratio (the tuning dial: coarser grid =
    * fewer replicas, more residual filtering); the window side is
    * bounded and broadcasts, so the fact side never shuffles; the
    * per-window aggregate combines map-side. A plain interval-overlap
    * theta join would be a BroadcastNestedLoopJoin doing |L|·|R| full
    * comparisons.
    */
  def intervalOverlapJoin(s: SparkSession, dir: String): DataFrame = {
    val windows = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
      .select(date_trunc("DAY", col("o_orderdate")).as("win_start"))
      .distinct()
      .withColumn("win_last", col("win_start") + expr("INTERVAL 2 DAY"))
      .withColumn("bucket",
        explode(expr("sequence(win_start, win_last, INTERVAL 1 DAY)")))
    val ship = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        date_trunc("DAY", col("l_shipdate")).as("sd"),
        expr("date_trunc('DAY', l_shipdate) + (CAST(l_quantity AS INT) % 7 + 1) * INTERVAL '1' DAY")
          .as("rd"))
      .withColumn("bucket", explode(expr("sequence(sd, rd, INTERVAL 1 DAY)")))
    ship.join(broadcast(windows), Seq("bucket"))
      // first-shared-bucket emission: exactly one row per overlapping pair
      .filter(col("bucket") === greatest(col("sd"), col("win_start")))
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_overlaps"),
        round(avg(datediff(least(col("rd"), col("win_last")),
          greatest(col("sd"), col("win_start"))) + 1), 4).as("avg_overlap_days"))
      .orderBy("win_start")
  }

  /** Q40 — ordered/statistical aggregate family: exact MEDIAN (interpolated
    * at even counts), deterministic MODE (highest count, ties to the
    * SMALLEST value — built from two grouped aggregates, not the built-in
    * `mode()`, whose tie-break is unspecified), sample stddev/variance and
    * Pearson correlation per group.
    *
    * Scale: median sorts within each group's partition (Spark's
    * percentile is a sort-based aggregate — memory tracks group size, the
    * known cost of EXACT medians; q22b's approx_percentile is the 100 TB
    * escape hatch). Mode is two map-side-combined shuffles on
    * (flag, qty)→(flag); moments (stddev/var/corr) are single-pass
    * streaming aggregates. All three branches shuffle on the same
    * l_returnflag key.
    */
  def statsSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val stats = li.groupBy("l_returnflag")
      .agg(
        round(median(col("l_quantity")), 4).as("med_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"))
    val mode = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("l_returnflag")
      .agg(max(struct(col("cnt"), (-col("l_quantity")).as("nq"))).as("m"))
      .select(col("l_returnflag"), (-col("m.nq")).as("mode_qty"),
        col("m.cnt").as("mode_n"))
    stats.join(mode, "l_returnflag")
      .select(col("l_returnflag"), col("med_qty"), col("mode_qty"),
        col("mode_n"), col("sd_price"), col("var_qty"), col("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Q43 — windowed ordered-funnel analysis (view → click within 6 h →
    * purchase within 6 h): how many users complete each prefix of the
    * sequence IN ORDER with each step inside the conversion window — the
    * drop-off curve every product-analytics stack computes ("conversion
    * within N hours", not "ever").
    *
    * Single-pass formulation: one window (partition user, order ts) and
    * three STACKED running columns — latest view so far; latest click
    * that landed within the window after the then-latest view; latest
    * purchase within the window after that. Each row's marker compares
    * against the running value AT that row, which is exactly the ordered
    * sequence constraint, and "latest" (not earliest) prior step makes
    * the window test maximally permissive — the standard funnel
    * semantics. All three columns share one window spec → ONE shuffle +
    * ONE sort for the whole funnel, then a per-user aggregate and a
    * 3-row rollup. The naive form is k self-joins of the event table
    * for a k-step funnel.
    *
    * Strict `>` comparisons make same-timestamp steps non-qualifying,
    * so ties between a view and a click at the same instant cannot
    * create order-dependent results — deterministic without needing the
    * event_id tiebreak to carry semantics.
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    funnelSteps(t(s, dir, "events"), lim = "INTERVAL 6 HOUR")

  /** The funnel core over any (user_id, ts, event_id, event_type) frame —
    * separated so specs can drive hand-built sequences through it.
    */
  def funnelSteps(events: DataFrame, lim: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("t1r",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2r", max(when(col("event_type") === "click"
        && col("t1r").isNotNull && col("ts") > col("t1r")
        && col("ts") <= col("t1r") + expr(lim), col("ts"))).over(w))
      .withColumn("t3r", max(when(col("event_type") === "purchase"
        && col("t2r").isNotNull && col("ts") > col("t2r")
        && col("ts") <= col("t2r") + expr(lim), col("ts"))).over(w))
    val perUser = marked.groupBy("user_id")
      .agg(max(col("t1r").isNotNull).as("s1"),
        max(col("t2r").isNotNull).as("s2"),
        max(col("t3r").isNotNull).as("s3"))
    val steps = perUser.agg(
      sum(when(col("s1"), 1L).otherwise(0L)).as("view"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("click"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("purchase"))
    steps.select(explode(array(
        struct(lit(1L).as("step"), lit("view").as("name"),
          col("view").as("n_users"),
          round(col("view") / col("view").cast("double"), 4).as("conv")),
        struct(lit(2L).as("step"), lit("view>click").as("name"),
          col("click").as("n_users"),
          round(col("click") / col("view").cast("double"), 4).as("conv")),
        struct(lit(3L).as("step"), lit("view>click>purchase").as("name"),
          col("purchase").as("n_users"),
          round(col("purchase") / col("view").cast("double"), 4).as("conv")))).as("r"))
      .select(col("r.step"), col("r.name"), col("r.n_users"), col("r.conv"))
      .orderBy("step")
  }

  /** 16-bit × 16-bit Morton interleave: bit 2i ← x_i, bit 2i+1 ← y_i.
    * Pure shift/mask/add column arithmetic — fully codegen'd, no UDF.
    */
  def morton16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Q42 — Z-order (Morton) multi-dimensional layout: the data-layout
    * clustering step a 100 TB lake runs so that ONE physical order serves
    * range predicates on SEVERAL columns (the technique behind Delta's
    * OPTIMIZE ZORDER / Hudi clustering). Each dimension is scaled onto a
    * 16-bit grid (integer arithmetic against the broadcast 1-row max —
    * bit-identical in any engine), the grid coordinates are Morton-
    * interleaved, and the top 5 z-bits define 32 z-cells ≈ output files.
    *
    * The emitted per-cell (count, min/max of each key) IS the min/max
    * pruning index such a layout exists to produce: after z-clustering,
    * BOTH `pk` and `sk` spans per cell shrink to ~√cells of the domain,
    * so a scan with a predicate on EITHER column can skip most cells —
    * a single-column sort gives perfect pruning on one key and none on
    * the other (pinned quantitatively in ZOrderSpec).
    *
    * Scale shape: z-assignment is row-local (shift/mask codegen over a
    * 2-column scan + a broadcast 1-row stats join); the profile is one
    * map-side-combined aggregate on 32 cells. The production write path
    * is `repartitionByRange(col("z")).sortWithinPartitions("z").write` —
    * one range shuffle, exactly what any global layout pass costs.
    */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    val stats = li.agg(max("pk").as("mpk"), max("sk").as("msk"))
    li.crossJoin(broadcast(stats))
      .withColumn("x", expr("pk * 65536 div (mpk + 1)"))
      .withColumn("y", expr("sk * 65536 div (msk + 1)"))
      .withColumn("bucket", shiftright(morton16(col("x"), col("y")), 27))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"),
        min("pk").as("min_pk"), max("pk").as("max_pk"),
        min("sk").as("min_sk"), max("sk").as("max_sk"))
      .orderBy("bucket")
  }

  /** Q44 — cohort retention: users bucketed by the week of their FIRST
    * event (the cohort), then each (cohort, week-offset) cell counts how
    * many of that cohort came back that many weeks later — the standard
    * growth-analytics triangle downstream of every event sync (the
    * reference lands `events`-shaped tables for exactly this class of
    * warehouse query, reference README.md:4-6).
    *
    * Scale shape: ONE shuffle on user_id (the first-event window — same
    * partitioning a sessionize pass already uses), then a map-side-
    * combined distinct-count on (cohort, offset) — the cell domain is
    * |weeks|², thousands of rows at any corpus size. The cohort-size
    * denominator is a window over that tiny aggregated frame, not a
    * second pass over the fact table.
    *
    * Offsets are exact by construction: both ends are Monday-truncated
    * week starts, so datediff is always a multiple of 7 and the /7 is
    * exact in double.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val wu = Window.partitionBy("user_id")
    val marked = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .withColumn("cohort", min("wk").over(wu))
    val cells = marked
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
    val wc = Window.partitionBy("cohort")
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_users"))).over(wc))
      .select(col("cohort"), col("week_offset"), col("n_users"),
        round(col("n_users") / col("cohort_size").cast("double"), 4).as("retention"))
      .orderBy("cohort", "week_offset")
  }

  /** Q46 — rolling 7-day distinct users (DAU / WAU / stickiness): for
    * each observed day, the distinct users active that day and within
    * the trailing 7-day window. Sliding-window DISTINCT is the operator
    * windows can't do directly (distinct doesn't decompose over frames);
    * the scalable shape is dedup-then-scatter: collapse the fact table
    * to distinct (user, day) FIRST (map-side combined — the only
    * fact-sized pass), then each (user, day) row scatters to the ≤ 7
    * target days it contributes to, and a second distinct-count runs on
    * the already-user-day-deduped frame. A naive per-day range self-join
    * over raw events is O(|events| × 7) before dedup; this is
    * O(|users·days| × 7) after — orders of magnitude smaller at 100 TB.
    */
  def rollingDistinct(s: SparkSession, dir: String): DataFrame = {
    // the deduped (user, day) frame feeds BOTH the daily and the
    // windowed count — materialized once so the fact table scans once
    val ud = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .localCheckpoint(true)
    val daily = ud.groupBy(col("d").as("day"))
      .agg(countDistinct("user_id").as("dau"))
    val win7 = ud
      .select(col("user_id"), explode(expr("sequence(0, 6)")).as("i"), col("d"))
      .select(col("user_id"), expr("date_add(d, i)").as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau7"))
    daily.join(win7, Seq("day")) // inner: only days that actually occur
      .select(col("day"), col("dau"), col("wau7"),
        round(col("dau") / col("wau7").cast("double"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** Q45 — fixed-width histogram of `l_extendedprice` (width 5000) with
    * cumulative counts and shares: the profiling primitive behind price
    * distribution dashboards and equi-width binning.
    *
    * Scale shape: the binning is a row-local floor-divide folded into a
    * map-side-combined aggregate — the fact table collapses to ~25
    * bucket rows inside the scan stage. The cumulative window runs on
    * that bounded frame only, so its single-partition global order is
    * O(buckets), never O(rows) (same bounded-frame argument as
    * [[zorderLayout]]'s 32-cell profile).
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val width = 5000.0
    val b = t(s, dir, "lineitem")
      .select(floor(col("l_extendedprice") / width).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val wAll = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy()
    b.select(col("bucket"), (col("bucket") * width).as("bucket_lo"), col("n"),
        sum("n").over(wAll).as("cum_n"),
        round(col("n") / sum("n").over(wTot).cast("double"), 4).as("share"))
      .orderBy("bucket")
  }

  /** Q51 — skyline (Pareto frontier): the parts no other part dominates
    * on (price ↓, size ↑). Dominance: ∃o with o.price ≤ p ∧ o.size ≥ s
    * and at least one strict.
    *
    * The naive formulation is an all-pairs NOT EXISTS — quadratic, dead
    * at scale. This plan is linear + one bounded window: collapse to
    * per-distinct-price max size (map-side-combined aggregate — the fact
    * frame reduces to |distinct prices| rows inside the scan stage),
    * then two prefix maxima over that bounded frame:
    *   m1(p) = max size at any STRICTLY cheaper price,
    *   m2(p) = max size at price ≤ p (RANGE frame ⇒ peers included).
    * A row is dominated iff m1 ≥ s (cheaper, at-least-as-big) or
    * m2 > s (no dearer, strictly bigger) — exactly the definition, no
    * pair ever materializes. The window runs on the collapsed frame
    * only, so its global order is O(distinct prices), never O(rows)
    * (the [[histogram]] bounded-frame argument; at a cardinality where
    * even that frame is big, the two-level prefix-sum split from
    * prep's global rank applies verbatim).
    */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
      .select(col("p_partkey").as("k"), col("p_retailprice").as("price"),
        col("p_size").as("size"))
    val perPrice = p.groupBy("price").agg(max("size").as("pmax"))
    val wPrev = Window.orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = perPrice
      .withColumn("m1", max("pmax").over(wPrev))
      .withColumn("m2", greatest(coalesce(col("m1"), lit(Int.MinValue)),
        col("pmax")))
    p.join(front, "price")
      .filter(!(coalesce(col("m1"), lit(Int.MinValue)) >= col("size") ||
        col("m2") > col("size")))
      .select(col("k"), round(col("price"), 2).as("price"), col("size"))
      .orderBy("k")
  }

  /** Q52 — weighted median (and exact weighted mean) per group: the
    * order statistic under integer weights, the robust-center primitive
    * a quality pipeline wants where plain AVG is skew-fragile.
    *
    * Determinism shape: weights are integers (quantity), so cumulative
    * weight is exact at any partial-sum order; the cumulative window
    * uses a RANGE frame (peers included) so equal values get equal
    * cumulative weight regardless of intra-tie row order — the lower
    * weighted median (min v with 2·cum(v) ≥ total) is then a pure set
    * property, engine-order-independent. The weighted mean aggregates
    * value CENTS quantized with floor(x·100+0.5) — exact long products,
    * order-independent sums — and divides once at the end.
    *
    * Scale shape: one shuffle on the group key; windows run inside each
    * group partition; nothing global, no all-pairs, whole-stage codegen
    * end to end.
    */
  def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(
      col("l_returnflag").as("g"),
      col("l_extendedprice").as("v"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
      col("l_quantity").cast("long").as("w"))
    val wCum = Window.partitionBy("g").orderBy("v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("g")
    li.select(col("g"), col("v"), col("cents"), col("w"),
        sum("w").over(wCum).as("cum"),
        sum("w").over(wAll).as("tot"),
        sum(col("cents") * col("w")).over(wAll).as("cw"))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy("g")
      .agg(
        round(min("v"), 2).as("wmedian"),
        max("tot").as("total_w"),
        round(max("cw") / (max("tot") * lit(100.0)), 4).as("wmean"))
      .orderBy("g")
  }

  /** Benford first-digit audit — the classic fabricated-numbers screen
    * over a monetary column: observed first-significant-digit shares vs
    * Benford's log₁₀(1+1/d) expectation, one row per digit.
    *
    * Determinism: the digit comes from the decimal rendering of the
    * exact cent quantization (first char of a BIGINT's string — no
    * float log₁₀ whose libm ULPs could flip a boundary value), counts
    * are exact, and the Benford expectations are shared 6-digit decimal
    * LITERALS (identical parse in any engine) rather than engine-side
    * logarithms. Per-digit deviations only — no cross-digit χ² fold, so
    * no order-unspecified 9-term double sum exists anywhere.
    *
    * Scale: digit extraction is row-local, the aggregate map-side
    * combines to ≤9 rows, the share window runs on those 9.
    */
  /** Q53 — per-group statistical mode (most frequent value), ties to
    * the smallest value, with its frequency and share — the exact
    * categorical-center primitive `approx_top_k` approximates. Shape:
    * one map-side-combined count on (group, value), then a rank window
    * INSIDE each group partition — two bounded shuffles, no sort of the
    * fact table, and the value-count frame is |group×distinct| sized.
    */
  def modePerGroup(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val wg = Window.partitionBy("g")
    val wr = Window.partitionBy("g")
      .orderBy(col("n").desc, col("v"))
    counts
      .select(col("g"), col("v"), col("n"),
        row_number().over(wr).as("rn"),
        sum("n").over(wg).as("tot"))
      .filter(col("rn") === 1)
      .select(col("g"), col("v").as("mode_v"), col("n").as("n"),
        round(col("n") / col("tot").cast("double"), 6).as("share"))
      .orderBy("g")
  }

  /** Benford expectations as 6-digit decimal strings, interpolated into
    * BOTH engines' plans so each parses the identical literal.
    */
  private[graft] val benfordProbs: Seq[(Int, String)] =
    (1 to 9).map(i => (i, BigDecimal(math.log10(1.0 + 1.0 / i))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString))

  def dqBenford(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "lineitem")
      .select(substring(floor(col("l_extendedprice") * 100 + 0.5)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val wTot = Window.partitionBy()
    val expect = benfordProbs.map { case (i, p) =>
      s"WHEN $i THEN CAST($p AS DOUBLE)" }.mkString(
      "CASE digit ", " ", " END")
    d.select(col("digit"), col("n"),
        round(col("n") / sum("n").over(wTot).cast("double"), 6).as("share"),
        expr(expect).as("benford_p"))
      .withColumn("abs_dev", round(abs(col("share") - col("benford_p")), 6))
      .orderBy("digit")
  }

  /** q57_attribution — first-touch vs last-touch revenue attribution
    * (the marketing-analytics standard beside q43's funnel and q44's
    * retention): each purchase attributes its value to the user's FIRST
    * engagement touch (click/view) and, separately, to the LAST touch
    * before the purchase. Both assignments are one user-partitioned
    * window pass (first/last with ignoreNulls over the strictly-prior
    * frame — no per-purchase self-join), then one bounded aggregate per
    * model. Purchases with no prior touch are excluded (reported by
    * neither model — the untouched-conversion bucket).
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val touch = when(col("event_type").isin("click", "view"),
      col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val p = t(s, dir, "events")
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_touch").isNotNull)
      .localCheckpoint(true) // feeds both model aggregates
    def model(name: String, c: String) = p.groupBy(col(c).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("value"), 2).as("total_value"))
      .select(lit(name).as("model"), col("touch"), col("n_purchases"),
        col("total_value"))
    model("first_touch", "first_touch")
      .unionByName(model("last_touch", "last_touch"))
      .orderBy("model", "touch")
  }

  /** q56_rolling_slope — rolling 7-day trend regression over the daily
    * order volume (the windowed sibling of [[Regression.olsTwoFeature]]:
    * every monitoring dashboard's "trend arrow" is this statistic):
    * per day, the OLS slope of count-vs-day over the trailing week,
    * `(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`, with x the epoch-day integer —
    * all five sufficient sums are EXACT integer window aggregates over
    * one ordered frame, the division is the only float. One shuffle +
    * one sort for every day's trend, never a per-window self-join.
    */
  def rollingSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("x", datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("n").over(w))
      .withColumn("sxy", sum(col("x") * col("n")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("n7") === 7) // full windows only
      .select(col("day"), col("n"),
        round((col("n7") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n7") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("slope7"))
      .orderBy("day")
  }

  /** dq_cusum — CUSUM change-point detection over the daily order
    * volume (Page 1954 — the sequential drift alarm beside [[dqKs]]'s
    * two-sample test and dq_ewma's smoother): the textbook recursion
    * `S_t = max(0, S_{t-1} + x_t − k)` LOOKS inherently sequential,
    * but it is exactly the running prefix identity
    * `S_t = P_t − min_{i≤t} P_i` with `P` the prefix sum of `x − k` —
    * so one ordered window pass computes the whole alarm series
    * relationally, in exact integer arithmetic (counts and the
    * reference value k are integers). Alarm fires when S crosses h;
    * both thresholds are literals shared with the oracle.
    */
  def dqCusum(s: SparkSession, dir: String, k: Long = 6L,
              h: Long = 40L): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    val wOrd = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("p", sum(col("n") - k).over(wOrd))
      // min over prefixes INCLUDING the empty one (P_0 = 0) — dropping
      // the 0 floor breaks the max(0, ...) clamp of the recursion
      .withColumn("cusum", col("p") - least(lit(0L), min("p").over(wOrd)))
      .select(col("day"), col("n"), col("cusum"),
        (col("cusum") > h).as("alarm"))
      .orderBy("day")
  }

  /** dq_ks — exact two-sample Kolmogorov–Smirnov drift test between the
    * early and late halves of the order history (the distribution-shift
    * monitor beside [[dqBenford]]'s digit screen and dq_drift's binned
    * PSI — KS needs NO binning choice and catches shape changes PSI's
    * fixed bins smear). `D = sup_v |F₁(v) − F₂(v)|` computed exactly by
    * integer cross-multiplication: per-value conditional counts (ONE
    * map-side-combined aggregate; the frame is bounded by the value
    * DOMAIN — whole dollars here — not the row count), one prefix-sum
    * window for both empirical CDFs, and
    * `d_num = max |cum₁·n₂ − cum₂·n₁|` in exact 64-bit arithmetic.
    * The only floats are the final division and the significance
    * compare against the Smirnov asymptotic critical value at α = 0.05
    * (c² = 1.8440661112: reject when D²·n₁n₂/(n₁+n₂) > c², cross-
    * multiplied so both engines evaluate the identical IEEE products).
    */
  def dqKs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(
      floor(col("o_totalprice") + 0.5).cast("long").as("v"),
      (col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .cast("long").as("g1"))
    val perv = o.groupBy("v")
      .agg(sum("g1").as("c1"), (count(lit(1)) - sum("g1")).as("c2"))
    val wOrd = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = perv.select(col("v"),
        sum("c1").over(wOrd).as("cum1"), sum("c2").over(wOrd).as("cum2"),
        sum("c1").over(wAll).as("n1"), sum("c2").over(wAll).as("n2"))
      .withColumn("dnum",
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .withColumn("mx", max("dnum").over(wAll))
    cum.filter(col("dnum") === col("mx"))
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        max("dnum").as("d_num"), min("v").as("at_dollars"))
      .withColumn("ks", round(col("d_num").cast("double") /
        (col("n1") * col("n2")).cast("double"), 6))
      .withColumn("drift",
        col("d_num").cast("double") * col("d_num").cast("double") >
          lit(1.8440661112) * (col("n1") * col("n2")).cast("double") *
            (col("n1") + col("n2")).cast("double"))
      .select("n1", "n2", "d_num", "at_dollars", "ks", "drift")
  }

  /** q59_percentile_disc — the DISCRETE percentile family
    * (`PERCENTILE_DISC ... WITHIN GROUP`, the ordered-set aggregate
    * syntax): returns an ACTUAL data value (the smallest whose
    * cumulative share reaches p), where the continuous form
    * interpolates — the right choice for quantities that must remain
    * valid domain values (ids, cents, bucket keys). All emissions are
    * exact integers straight from the data; the continuous median
    * rides along in doubled units for the disc-vs-cont contrast.
    * One grouped sort-aggregate, bounded group count.
    */
  def percentileDisc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE ranked pass serves all four ordered-set aggregates (the q59b
    // technique, guide §2.3 "aggregate before you shuffle" applied to
    // ordered-set aggregates): four `percentile_disc`/`percentile`
    // aggregates each buffer EVERY group value in ObjectHashAggregate
    // state (no map-side reduction — 4× buffered; measured 5.9 s at
    // sf0.1). Ranked instead: one exchange on g, one sort,
    //   percentile_disc(q) = the value at rank ⌈q·n⌉ = min cents with
    //   rn ≥ ⌈q·n⌉
    // read with a conditional min (0.25/0.5/0.75 are exact binary
    // fractions so q·n is FP-exact). The continuous median rides along
    // rank-wise: position (n+1)/2 interpolates as
    //   p50_cont_x2 = v[(n+1) div 2] + v[n div 2 + 1]
    // (odd n: both ranks hit the middle value, = 2·v; even n: the two
    // straddling values — exactly CAST(percentile(cents,0.5)·2 AS BIGINT)
    // since the sum of two cents values is integer-exact in a double).
    // A per-(g, cents) count + cumulative-sum form was tried and is
    // SLOWER (2.6 s vs 1.5 s): cents is near-unique per row here, so
    // domain-counting compresses nothing and pays a second exchange.
    // The oracle still runs the ordered-set aggregates verbatim, so the
    // hash gate proves the rewrite, not this comment.
    val w = Window.partitionBy("g").orderBy("cents")
    val wg = Window.partitionBy("g")
    val ranked = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wg))
    def disc(q: Double, as: String) =
      min(when(col("rn") >= ceil(lit(q) * col("n")), col("cents"))).as(as)
    ranked.groupBy("g")
      .agg(max("n").as("n"),
        disc(0.25, "p25_disc"), disc(0.5, "p50_disc"), disc(0.75, "p75_disc"),
        (min(when(col("rn") >= expr("(n + 1) div 2"), col("cents"))) +
          min(when(col("rn") >= expr("n div 2 + 1"), col("cents"))))
          .as("p50_cont_x2"))
      .orderBy("g")
  }

  /** q59b_approx_percentile_disc — the SKETCH sibling of
    * [[percentileDisc]] (the exact→sketch convention, SURVEY §2.E): the
    * exact ordered-set aggregate buffers every group value
    * (ObjectHashAggregate state ∝ group size — memstress-gated but
    * state-heavy), where `approx_percentile`'s GK sketch holds O(1/ε)
    * samples per group regardless of scale — the 100 TB path. Because
    * GK retains ACTUAL observed values, the estimate stays a legal
    * domain value, preserving the discrete family's defining property.
    *
    * Tolerance oracle, the q22b shape: the row emits the EXACT discrete
    * percentiles (hash-stable cross-engine) plus `approx_ok` = every
    * sketch estimate landed within the exact discrete q ± 0.002 value
    * band (GK rank error at accuracy 2000 is ε = 5e-4 ≪ 0.002, and
    * discrete percentiles are monotone in q, so a correct sketch can
    * never leave the band). DuckDB recomputes the exact values and
    * asserts TRUE — a drifting sketch flips the flag and fails the
    * hash compare.
    */
  def approxPercentileDisc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE ranked pass serves all nine exact discrete anchors (the q22b
    // technique): percentile_disc(q) = the value at rank ceil(q·n) in
    // the per-group cents order, read with a conditional min — nine
    // `percentile_disc` aggregates would otherwise each buffer the
    // whole group's values (9× ObjectHashAggregate state, measured
    // 10 s vs ~1.7 s for this form at sf0.1). 0.25/0.5/0.75 are exact
    // binary fractions, so their rank products are FP-exact; the band
    // fractions only position a ±0.002·n-rank window and tolerate the
    // last-ulp ceil. The GK sketch shares the same aggregate (it needs
    // every occurrence; partial aggregation ships sketches, not rows).
    // A per-(g, cents) count + cumulative-sum variant with a separate
    // sketch aggregate was tried and is SLOWER (2.3 s vs 1.7 s): cents
    // is near-unique per row here, so domain-counting compresses
    // nothing and pays a second exchange plus a join.
    val w = Window.partitionBy("g").orderBy("cents")
    val wg = Window.partitionBy("g")
    val ranked = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wg))
    def disc(q: Double, as: String) =
      min(when(col("rn") >= ceil(lit(q) * col("n")), col("cents"))).as(as)
    ranked.groupBy("g")
      .agg(max("n").as("n"),
        disc(0.25, "p25_disc"), disc(0.5, "p50_disc"), disc(0.75, "p75_disc"),
        disc(0.248, "b1l"), disc(0.252, "b1h"),
        disc(0.498, "b2l"), disc(0.502, "b2h"),
        disc(0.748, "b3l"), disc(0.752, "b3h"),
        expr("approx_percentile(cents, array(0.25D, 0.5D, 0.75D), 2000)")
          .as("ps"))
      .select(col("g"), col("n"),
        col("p25_disc"), col("p50_disc"), col("p75_disc"),
        (element_at(col("ps"), 1).between(col("b1l"), col("b1h")) &&
         element_at(col("ps"), 2).between(col("b2l"), col("b2h")) &&
         element_at(col("ps"), 3).between(col("b3l"), col("b3h")))
          .as("approx_ok"))
      .orderBy("g")
  }

  /** q58_bitwise_agg — the BITWISE aggregate family (`bit_or` bitmap
    * construction, `bit_xor` parity folding, `bit_and` common-bits):
    * per order a line-number bitmap `bit_or(1 << l_linenumber)` (the
    * roaring-bitmap-style index shape — which line slots exist) and a
    * partkey parity word, then per bitmap the order count, the XOR fold
    * of the parities (order-insensitive by XOR's group structure, so
    * any partial-aggregation tree gives the same word), and the AND
    * fold. Two map-side-combined aggregates; every value is a 64-bit
    * integer — no floats anywhere.
    */
  def bitwiseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("shiftleft(1L, l_linenumber)").as("slot"),
        col("l_partkey").cast("long").as("pk"))
      .groupBy("l_orderkey")
      .agg(expr("bit_or(slot)").as("mask"), expr("bit_xor(pk)").as("xr"))
      .groupBy("mask")
      .agg(count(lit(1)).as("n_orders"), expr("bit_xor(xr)").as("xor_all"),
        expr("bit_and(xr)").as("and_all"))
      .orderBy("mask")

  /** dq_gaps — key-sequence completeness (islands-and-gaps): the ingest
    * monitor that catches a dropped extract chunk the row-count checks
    * miss (a chunk loss keeps totals plausible but tears a CONTIGUOUS
    * hole in the key sequence). Keys are bucketed into fixed 1024-wide
    * spans, and each bucket reports presence, missing count and the
    * longest missing RUN — runs computed with a lag window PARTITIONED
    * BY BUCKET (boundary runs closed against the bucket edges), so
    * there is no global sort: one shuffle on the bucket key, every
    * window task bounded by the span width. TPC-H orderkeys are sparse
    * by construction (3 of every 4 keys absent), so the fixture has
    * real gap structure at every scale.
    */
  def dqGaps(s: SparkSession, dir: String): DataFrame = {
    val B = 1024L
    val k = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), (col("o_orderkey") / B)
        .cast("long").as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("k")
    val runs = k
      .withColumn("prev", lag("k", 1).over(w))
      .withColumn("run_before",
        col("k") - coalesce(col("prev"), col("bucket") * B - 1) - 1)
    runs.groupBy("bucket")
      .agg(count(lit(1)).as("n_present"),
        (lit(B) - count(lit(1))).as("n_missing"),
        sum(when(col("run_before") > 0, 1L).otherwise(0L)).as("n_gaps_interior"),
        // longest run = max of the before-key runs and the TAIL run
        // (bucket end minus the last present key)
        greatest(max("run_before"),
          max(col("bucket")) * B + B - 1 - max(col("k"))).as("max_run"))
      .orderBy("bucket")
  }
}
