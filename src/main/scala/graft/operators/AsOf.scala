package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical "operator Spark lacks" (time-series point
  * lookup: for each left row, the latest right row with `r.ts <= l.ts` per
  * key). Composed from existing operators per the preference order
  * (SURVEY §4: compose before custom plans): tag both sides, UNION, one
  * window pass carrying the last non-null right payload forward, keep left
  * rows.
  *
  * Scale: ONE shuffle on (key) + a sort by (ts) — the same cost as any
  * windowed aggregation. The naive alternative (range join
  * `l.ts >= r.ts` + max-per-left) explodes to O(|L|·|R|) pairs per key
  * before pruning; this formulation never materializes a pair.
  *
  * Tie semantics: right rows order BEFORE left rows at equal ts, giving
  * `r.ts <= l.ts` (ASOF >=) semantics.
  */
object AsOf {

  /** Left as-of join. `rightCols` are the right-side payload columns to
    * carry; left rows with no preceding right row keep nulls.
    *
    * The payload travels as ONE struct column so all `rightCols` always
    * come from the same right row, and the window ordering tie-breaks on
    * that struct — duplicate right rows at the same (key, ts) resolve to
    * the struct-greatest row deterministically instead of whichever row
    * the sort happened to place last.
    */
  def join(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           rightCols: Seq[String]): DataFrame =
    joinImpl(left, right, key, tsCol, rightCols, tolerance = None)

  /** As-of join with a lookback TOLERANCE (the kdb/QuestDB `ASOF ...
    * TOLERANCE` semantics): the match is the latest right row with
    * `r.ts <= l.ts` — but only if it is also `>= l.ts − tolerance`;
    * otherwise the left row keeps nulls. Since as-of picks the LATEST
    * preceding row, an out-of-tolerance match proves no right row is in
    * the window at all, so the post-fill conditional IS the full
    * semantics — same single shuffle, no extra pass.
    */
  def joinWithTolerance(left: DataFrame, right: DataFrame, key: String,
                        tsCol: String, rightCols: Seq[String],
                        tolerance: String): DataFrame =
    joinImpl(left, right, key, tsCol, rightCols, Some(tolerance))

  private def joinImpl(left: DataFrame, right: DataFrame, key: String,
                       tsCol: String, rightCols: Seq[String],
                       tolerance: Option[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    // the matched right row's ts travels inside the payload struct, so a
    // tolerance check can inspect WHICH row was matched after the fill
    val payloadType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("g_rts", right.schema(tsCol).dataType) +:
        rightCols.map(c => right.schema(c)))
    val lTagged = left.select(
      (col(key) +: col(tsCol) +: lit(1).as("g_is_left") +:
        (leftCols.map(col(_)) :+ lit(null).cast(payloadType).as("g_payload"))): _*)
    // Null-rejecting like the SQL ASOF equi-key: a null-key right row must
    // never match (window PARTITION BY groups null keys as EQUAL, so
    // without this filter a null-key left row would pick up null-key right
    // payloads), and a null-ts right row sorts NULLS FIRST and would be
    // carried into every later row of its partition. Null-key/ts LEFT rows
    // need no special casing: with right nulls gone, nothing precedes them.
    val rTagged = right.filter(col(key).isNotNull && col(tsCol).isNotNull).select(
      (col(key) +: col(tsCol) +: lit(0).as("g_is_left") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct((col(tsCol).as("g_rts") +: rightCols.map(col(_))): _*)
            .as("g_payload"))): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("g_is_left"), col("g_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("g_payload", last(col("g_payload"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case Some(tol) => filled.withColumn("g_payload",
        when(col("g_payload.g_rts") >= col(tsCol) - expr(tol), col("g_payload")))
      case None => filled
    }
    rightCols.foldLeft(gated) { (acc, c) =>
      acc.withColumn(c, col(s"g_payload.$c"))
    }.filter(col("g_is_left") === 1).drop("g_is_left", "g_payload")
  }

  /** Native-operator form of [[join]]: plans through
    * [[graft.plans.AsOfJoinPlan]] into the custom
    * [[graft.plans.AsOfJoinExec]] merge (one buffered payload row per key
    * instead of the union+window materialization — same single shuffle,
    * one fewer wide sort). Same semantics and tie-break; requires the
    * session to carry `GraftExtensions` (any [[graft.Engine.session]]).
    */
  def joinNative(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                 rightCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftbridge.PlanBridge
    PlanBridge.ofRows(left.sparkSession, graft.plans.AsOfJoinPlan(
      PlanBridge.analyzed(left), PlanBridge.analyzed(right),
      key, tsCol, rightCols))
  }

  /** NEAREST-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')`): per left row, the right row minimizing |r.ts − l.ts|,
    * ties to the EARLIER right row. Same union+window shape as [[join]]
    * — one shuffle on key, one sort, with ONE WindowExec computing both
    * the backward candidate (last preceding payload) and the forward
    * candidate (first strictly-following payload — equal-ts rows sort
    * onto the backward side, where distance 0 wins anyway) over the
    * same window ordering; a row-local distance compare picks the
    * winner. Never materializes a pair, like the backward form.
    *
    * Determinism: right rows are first collapsed to one per (key, ts)
    * (struct-greatest payload — an explicit rule rather than whichever
    * duplicate the fills would each pick, since the backward and
    * forward fills would otherwise tie-break in OPPOSITE payload
    * order), so nearest-ties reduce to backward-vs-forward only.
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
                  tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("g_rts", right.schema(tsCol).dataType) +:
        rightCols.map(c => right.schema(c)))
    val rUniq = right.filter(col(key).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(key), col(tsCol))
      .agg(max(struct(rightCols.map(col(_)): _*)).as("g_rp"))
    val rTagged = rUniq.select(
      (col(key) +: col(tsCol) +: lit(0).as("g_is_left") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct((col(tsCol).as("g_rts") +:
            rightCols.map(c => col(s"g_rp.$c").as(c))): _*).as("g_payload"))): _*)
    val lTagged = left.select(
      (col(key) +: col(tsCol) +: lit(1).as("g_is_left") +:
        (leftCols.map(col(_)) :+ lit(null).cast(payloadType).as("g_payload"))): _*)
    val ord = Seq(col(tsCol), col("g_is_left"))
    val wB = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = lTagged.unionByName(rTagged)
      .withColumn("g_b", last(col("g_payload"), ignoreNulls = true).over(wB))
      .withColumn("g_f", first(col("g_payload"), ignoreNulls = true).over(wF))
    val dB = unix_micros(col(tsCol)) - unix_micros(col("g_b.g_rts"))
    val dF = unix_micros(col("g_f.g_rts")) - unix_micros(col(tsCol))
    val picked = both.withColumn("g_payload",
      when(col("g_b").isNull, col("g_f"))
        .when(col("g_f").isNull, col("g_b"))
        .when(dB <= dF, col("g_b"))
        .otherwise(col("g_f")))
    rightCols.foldLeft(picked) { (acc, c) =>
      acc.withColumn(c, col(s"g_payload.$c"))
    }.filter(col("g_is_left") === 1)
      .drop("g_is_left", "g_payload", "g_b", "g_f")
  }
}
