package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory (SURVEY.md §7 step 1) — single place that pins the
  * session semantics every entry point (Verify, Bench, tests, pipeline CLI)
  * must share:
  *
  *   - UTC session time zone: the reference's DATETIME mapping is wall-clock
  *     (reference dags/cloudsql_to_bigquery.py:157-158), so all engines
  *     compare timestamps at UTC.
  *   - AQE on (Spark default) — runtime join selection / skew handling is the
  *     100 TB answer to static planning.
  *   - `legacy.parquet.nanosAsLong`: the driver's `events.ts` is
  *     TIMESTAMP(NANOS) parquet, which Spark 4 otherwise refuses to read;
  *     we read ns-as-long and convert to µs in [[Tables.load]].
  *
  * CLUSTER-SUBMITTABLE: the factory sets `local[N]` only as a FALLBACK for
  * direct JVM runs (tests, Verify, Bench on this host). A master supplied by
  * the submission environment — `spark-submit --master ...` lands it in the
  * `spark.master` system property; the legacy `MASTER` env works too — is
  * respected untouched, and the local-only tuning (`shuffle.partitions` =
  * core count, UI off) is NOT applied in that case: on a real cluster those
  * belong to `spark-defaults.conf` / AQE coalescing, not hardcoded here.
  */
object Engine {

  /** Master supplied by the submission environment, if any: the
    * `spark.master` system property (how `spark-submit --master` and
    * `--conf spark.master=` arrive in the driver JVM) or the legacy
    * `MASTER` env var.
    */
  private[graft] def injectedMaster: Option[String] =
    sys.props.get("spark.master").orElse(sys.env.get("MASTER"))
      .map(_.trim).filter(_.nonEmpty)

  /** The factory's master decision: `None` = leave the builder alone (the
    * injected master wins), `Some(local[N])` = the direct-JVM fallback.
    * Split out so the decision is spec-testable without tearing down the
    * shared test session.
    */
  private[graft] def localMasterFallback(cpus: String): Option[String] =
    if (injectedMaster.isDefined) None else Some(s"local[$cpus]")

  /** Streaming state-store provider selector: `SPARK_GRAFT_STATE_STORE`
    * (or the session conf the tests flip directly) ∈ {memory, rocksdb}.
    *
    * The default (memory) keeps Spark's HDFSBackedStateStoreProvider —
    * every key lives on the executor heap, fine for the test corpora. At
    * 100× the stateful patterns (userTotals' per-user state, the
    * trending-top-k window maps, the outer join's buffered rows) outgrow
    * heap: `rocksdb` switches to Spark's bundled RocksDB provider, which
    * keeps working state on executor-local disk with block-cache reads
    * and incremental (changelog-capable) checkpoints — the standard
    * large-state deployment. Results are IDENTICAL by contract (the
    * provider is a storage engine, not a semantics change) — pinned by
    * EventsStreamSpec's RocksDB run.
    */
  private[graft] val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def session(appName: String = "graft",
              cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val base0 = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      // engine-semantics contract — applies in every deployment mode
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base =
      if (sys.env.get("SPARK_GRAFT_STATE_STORE").map(_.trim.toLowerCase)
          .contains("rocksdb"))
        base0.config("spark.sql.streaming.stateStore.providerClass",
          RocksDbProvider)
      else base0
    val builder = localMasterFallback(cpus) match {
      case Some(local) =>
        base.master(local)
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
      case None => base // cluster submission: master + tuning come from the conf
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
