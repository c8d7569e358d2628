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
  *   - `shuffle.partitions` = local core count here; on a real cluster this
  *     is left to AQE coalescing (`spark.sql.adaptive.coalescePartitions`).
  *   - `legacy.parquet.nanosAsLong`: the driver's `events.ts` is
  *     TIMESTAMP(NANOS) parquet, which Spark 4 otherwise refuses to read;
  *     we read ns-as-long and convert to µs in [[Tables.load]].
  */
object Engine {
  def session(appName: String = "graft",
              cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
