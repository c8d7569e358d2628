package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}

/** Stage→final merge — the reference's declared step 3: "run a query that
  * will join the stage table with the existing table and overwrite"
  * (reference dags/cloudsql_to_bigquery.py:11,58,70). Two equivalent
  * formulations, both shuffle once on the key columns:
  *
  *   - [[upsert]]: full-outer join + per-column COALESCE(stage, existing) —
  *     stage wins on conflict. Preserves rows only in existing (no deletes).
  *   - [[antiUnion]]: existing LEFT ANTI stage, then UNION ALL stage —
  *     cheaper when stage carries all columns (no wide coalesce), and the
  *     anti side shuffles only the keys.
  *
  * Scale: both sides shuffle-partition on `keys`; when stage is a small
  * incremental batch against a huge existing table, AQE broadcasts the
  * stage side of the anti join automatically — which is why [[antiUnion]]
  * is the default at 100 TB.
  */
object Merge {

  /** Invariants (pinned by MergeSpec): result keys = union of both sides'
    * keys; no duplicate keys (assuming each input is key-unique); rows
    * present in both sides carry stage's values.
    */
  def upsert(existing: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(existing.columns.sameElements(stage.columns),
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${stage.columns.mkString(",")}")
    val e = existing.as("e")
    val s = stage.as("s")
    val cond = keys.map(k => col(s"e.$k") === col(s"s.$k")).reduce(_ && _)
    val cols = existing.columns.map(c =>
      coalesce(col(s"s.$c"), col(s"e.$c")).as(c))
    e.join(s, cond, "full_outer").select(cols.toIndexedSeq: _*)
  }

  /** Anti-join + union formulation: rows of existing whose key is NOT in
    * stage, plus all of stage.
    */
  def antiUnion(existing: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val e = existing.as("e")
    val s = stage.as("s")
    val cond = keys.map(k => col(s"e.$k") === col(s"s.$k")).reduce(_ && _)
    e.join(s, cond, "left_anti").unionByName(stage)
  }

  /** Full ANSI MERGE semantics (SQL:2003 MERGE + the 2023-era NOT
    * MATCHED BY SOURCE extension every lakehouse engine ships) in ONE
    * relational pass: a single key-partitioned full-outer join, with
    * every WHEN branch a row-local CASE over the two sides —
    *
    *   - WHEN MATCHED AND `updateWhen`  → take the source row
    *   - WHEN MATCHED AND `deleteWhen`  → drop the row
    *   - WHEN MATCHED (else)            → keep the existing row
    *   - WHEN NOT MATCHED               → insert the source row
    *   - WHEN NOT MATCHED BY SOURCE AND `deleteUnmatchedWhen` → drop
    *   - WHEN NOT MATCHED BY SOURCE (else) → keep
    *
    * Branch conditions are SQL over the aliases `e.*` / `s.*` and are
    * evaluated in ANSI MERGE order (delete wins over update when both
    * fire — the standard's first-matching-clause rule, made explicit
    * here by evaluating `deleteWhen` first). One shuffle on the key,
    * no second pass, no driver state; the output carries an `action`
    * column (`U`/`I`/`K`) so downstream audit is free.
    */
  def mergeAll(existing: DataFrame, source: DataFrame, keys: Seq[String],
               updateWhen: String, deleteWhen: String,
               deleteUnmatchedWhen: String): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(existing.columns.sameElements(source.columns),
      s"schema mismatch: ${existing.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    val e = existing.as("e")
    val s = source.as("s")
    val cond = keys.map(k => col(s"e.$k") === col(s"s.$k")).reduce(_ && _)
    val matched = col(s"s.${keys.head}").isNotNull &&
      col(s"e.${keys.head}").isNotNull
    val sourceOnly = col(s"e.${keys.head}").isNull
    val existingOnly = col(s"s.${keys.head}").isNull
    val keep =
      when(matched && expr(deleteWhen), lit(null).cast("string"))
        .when(matched && expr(updateWhen), lit("U"))
        .when(matched, lit("K"))
        .when(sourceOnly, lit("I"))
        .when(existingOnly && expr(deleteUnmatchedWhen),
          lit(null).cast("string"))
        .otherwise(lit("K"))
    val takeSource = col("action") === "I" || col("action") === "U"
    val cols = existing.columns.map(c =>
      when(takeSource, col(s"s.$c")).otherwise(col(s"e.$c")).as(c))
    e.join(s, cond, "full_outer")
      .withColumn("action", keep)
      .filter(col("action").isNotNull)
      .select(cols.toIndexedSeq :+ col("action"): _*)
  }

  /** CDC apply: a change feed with per-row operations (I/U upsert, D
    * delete tombstone) merged into the snapshot — the MERGE
    * WHEN-MATCHED-DELETE shape the full-overwrite reference never needed,
    * but any log-driven sync does. One full-outer join on the key:
    * tombstones drop the row even if it never existed (idempotent
    * replay); I/U rows win over existing; untouched existing rows pass
    * through. Change feeds must be key-unique (the caller compacts the
    * log to last-op-per-key first — at 100 TB that compaction is the
    * standard window-last pass, same shape as [[scd2]]'s ordering).
    *
    * Change rows win WHOLESALE: presence of the op marker — not per-column
    * COALESCE — selects the side, so an update that legitimately sets a
    * data column to NULL lands as NULL instead of resurrecting the
    * existing value (the classic coalesce-merge CDC bug). Change rows must
    * therefore carry fully-populated columns (last-op-per-key compaction
    * produces exactly that).
    */
  def cdcApply(existing: DataFrame, changes: DataFrame, keys: Seq[String],
               opCol: String): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val dataCols = existing.columns.toSeq
    require(changes.columns.toSet == dataCols.toSet + opCol,
      s"changes must carry existing's schema plus $opCol")
    val e = existing.as("e")
    val s = changes.as("s")
    val cond = keys.map(k => col(s"e.$k") === col(s"s.$k")).reduce(_ && _)
    val fromChange = col(s"s.$opCol").isNotNull
    val cols = dataCols.map(c =>
      when(fromChange, col(s"s.$c")).otherwise(col(s"e.$c")).as(c))
    e.join(s, cond, "full_outer")
      .filter(col(s"s.$opCol").isNull || col(s"s.$opCol") =!= "D")
      .select(cols.toIndexedSeq: _*)
  }

  /** Schema-evolving upsert: the reference re-infers the source schema on
    * EVERY run (reference dags/cloudsql_to_bigquery.py:141 — no persisted
    * registry), so a merge pipeline must absorb drift. Columns present on
    * only one side are added to the other as typed nulls (union of both
    * schemas, existing's column order first, stage's additions appended),
    * then the ordinary stage-wins [[upsert]] runs. Rows that predate a
    * new column carry null for it — exactly BigQuery's additive
    * schema-update semantics on load.
    */
  def upsertEvolve(existing: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame = {
    val allCols: Seq[(String, org.apache.spark.sql.types.DataType)] =
      existing.schema.map(f => f.name -> f.dataType) ++
        stage.schema.filterNot(f => existing.columns.contains(f.name))
          .map(f => f.name -> f.dataType)
    def align(df: DataFrame): DataFrame = df.select(allCols.map { case (c, t) =>
      if (df.columns.contains(c)) col(c) else lit(null).cast(t).as(c)
    }: _*)
    upsert(align(existing), align(stage), keys)
  }

  /** SCD type-2 merge: history-preserving upsert. `existing` carries
    * (key, tracked attrs, valid_from, valid_to, is_current); `stage` is
    * this run's snapshot (key + attrs). For each key:
    *
    *   - attrs unchanged → current row passes through untouched;
    *   - attrs changed   → current row closes (valid_to = ds, is_current
    *     = 0) and a new version opens (valid_from = ds, valid_to = null);
    *   - key only in stage → first version opens;
    *   - key only in existing → passes through (no deletes, matching
    *     [[upsert]]'s no-delete contract);
    *   - already-closed history rows pass through untouched.
    *
    * One full-outer shuffle of current rows against stage on `key` (+ the
    * pass-through union of closed rows — a pruned scan filtered on
    * is_current, no shuffle). The reference's overwrite model
    * (dags/copy_cloudsql_to_bigquery_v2.py:108) keeps no history; this is
    * the standard warehouse extension of its stage→final merge step.
    */
  def scd2(existing: DataFrame, stage: DataFrame, key: String,
           attrs: Seq[String], ds: String): DataFrame = {
    val history = existing.filter(col("is_current") === 0)
    val current = existing.filter(col("is_current") === 1)
    val joined = current.as("e").join(stage.as("s"),
      col(s"e.$key") === col(s"s.$key"), "full_outer")
    val changed = attrs.map(a => !(col(s"e.$a") <=> col(s"s.$a"))).reduce(_ || _)
    val eOnly = col(s"s.$key").isNull
    val sOnly = col(s"e.$key").isNull
    // surviving current-or-closed versions of matched/existing-only keys
    val kept = joined.filter(!sOnly).select(
      (col(s"e.$key").as(key) +:
        attrs.map(a => col(s"e.$a").as(a))) ++ Seq(
        col("e.valid_from").as("valid_from"),
        when(!eOnly && changed, lit(ds)).otherwise(col("e.valid_to")).as("valid_to"),
        when(!eOnly && changed, lit(0)).otherwise(lit(1)).as("is_current")): _*)
    // newly-opened versions: changed keys + brand-new keys (guard with
    // !eOnly: for existing-only keys `changed` is vacuously true against
    // the null stage side and must not open a null-attr version)
    val opened = joined.filter(sOnly || (!eOnly && changed)).select(
      (col(s"s.$key").as(key) +:
        attrs.map(a => col(s"s.$a").as(a))) ++ Seq(
        lit(ds).as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(1).as("is_current")): _*)
    history.unionByName(kept).unionByName(opened)
  }
}
