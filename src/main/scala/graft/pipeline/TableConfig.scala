package graft.pipeline

/** The unit of work: one table sync, mirroring the reference's 10-field
  * config dict (reference dags/cloudsql_to_bigquery.py:42-73) with the same
  * defaulting rules:
  *   - `exportQuery` defaults to `SELECT * from <table>` (:46-47,:66)
  *   - `stageTable` defaults to `exportTable` (:69)
  *   - `location` defaults to "EU" (:72)
  *   - `stageFinalQuery` is optional — when absent the stage snapshot IS
  *     the final table (the sample configs ship None, :58)
  *
  * `sourceDir`/`stagingDir`/`warehouseDir` replace the reference's Cloud SQL
  * instance / GCS bucket / BQ dataset coordinates with engine-native
  * locations (any Hadoop-compatible FS URI at cluster scale).
  */
final case class TableConfig(
    exportTable: String,
    database: String = "db",
    exportQuery: Option[String] = None,
    stageTable: Option[String] = None,
    stageFinalQuery: Option[String] = None,
    location: Option[String] = None,
    isFact: Boolean = false,
) {
  def resolvedExportQuery: String =
    exportQuery.getOrElse(s"SELECT * from $exportTable")
  def resolvedStageTable: String = stageTable.getOrElse(exportTable)
  def resolvedLocation: String = location.getOrElse("EU")
}
