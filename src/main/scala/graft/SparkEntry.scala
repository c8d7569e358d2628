package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Queries
import graft.registry.{LlmRegistry, MediaRegistry, MlRegistry, PipelineRegistry, RelationalRegistry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an implemented operator from SURVEY.md §2;
  * every key present in [[oracleSql]] carries DuckDB-runnable ANSI SQL with
  * IDENTICAL output column names (the driver's compare sorts columns by name
  * before hashing). Keys absent from [[oracleSql]] are non-SQL-expressible
  * ops the driver checks rows-only.
  *
  * The registry itself lives in [[graft.registry]], split by domain
  * (relational / pipeline / LLM-prep / multimodal / ML+graph) so each file
  * stays reviewable; this object is the stable driver-facing facade.
  */
object SparkEntry {

  /** Flagship query (Q04, the reference's star dim/fact model) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q04(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalRegistry.queries ++ PipelineRegistry.queries ++
      LlmRegistry.queries ++ MediaRegistry.queries ++ MlRegistry.queries

  /** DuckDB-runnable ANSI oracle SQL, one entry per key in [[queries]]. */
  def oracleSql: Map[String, String] =
    RelationalRegistry.oracleSql ++ PipelineRegistry.oracleSql ++
      LlmRegistry.oracleSql ++ MediaRegistry.oracleSql ++ MlRegistry.oracleSql

  /** MEASUREMENT rows (SURVEY §2.E's † marker): the verification
    * harness as a registry row — each recomputes exact/unblocked truth
    * (or runs multiple legs) IN-ROW to certify a production tier, so
    * its bench time is harness cost, not the operator's production
    * cost. [[Bench]] tags them in its JSON so calm-total comparisons
    * can split harness seconds from engine seconds.
    */
  val measurementRows: Set[String] = Set(
    "sim_recall", "sim_pq_recall", "sim_ivfpq_recall", "sim_sq_recall",
    "sim_bq_recall", "sim_twostage_recall", "sim_hnsw_recall",
    "sim_filtered_ivf_recall", "sim_range_ivf_recall", "mm_phash_recall",
    "dedup_edit_recall", "sim_reciprocal_nn_ivf", "a63_dialect_parity")
}
