package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the Spark-native form of the reference's two scan
  * paths:
  *
  *   - A1 server-side export: the whole `export_query` executes inside the
  *     source engine (reference dags/cloudsql_to_bigquery.py:100-127) —
  *     here the `query` option, which Spark pushes verbatim as a subquery.
  *   - A2 client-side partitioned cursor (reference
  *     dags/copy_cloudsql_to_bigquery_v2.py:82-95): `partitionColumn` +
  *     bounds + `numPartitions` open N parallel cursors, each reading one
  *     key range — the chunked export (A8) falls out of partitioned output.
  *
  * Scale: `numPartitions` bounds source connections (the reference
  * serializes exports for the same reason, :284-287); a 100 TB fact pull
  * sets partitionColumn on the PK so every executor streams a disjoint
  * range.
  */
object JdbcSource {

  /** A1 — whole-query pushdown: the source engine is the executor of
    * `exportQuery`, exactly like `gcloud sql export --query=...`.
    */
  def readQuery(spark: SparkSession, url: String, exportQuery: String,
                props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", exportQuery)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** A2 — partitioned parallel read of a table: N disjoint range cursors. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(mode)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }
}
