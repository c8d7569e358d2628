package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col}

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
}
