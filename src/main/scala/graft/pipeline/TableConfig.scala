package graft.pipeline

/** The unit of work: one table sync, mirroring the reference's 10-field
  * config dict (reference dags/cloudsql_to_bigquery.py:42-73) with the same
  * defaulting rules:
  *   - `exportQuery` defaults to `SELECT * from <table>` (:46-47,:66)
  *   - `stageTable` defaults to the table's BASE name (:69; for qualified
  *     names, the reference stages under `tbl.split(".")[-1]` —
  *     dags/mssql_to_bigquery.py:10-11 — while the export SQL keeps the
  *     full `database.schema.table` form, :19)
  *   - `location` defaults to "EU" (:72)
  *   - `stageFinalQuery` is optional — when absent the stage snapshot IS
  *     the final table (the sample configs ship None, :58)
  *
  * `exportTable` accepts multi-part qualified names
  * (`database.dbo.thetable`, reference dags/mssql_to_bigquery.py:2):
  * the full name is shipped verbatim into the default export SQL, the
  * base name keys the staging/warehouse artifacts, and a 3-part name's
  * leading segment resolves the database when none is given explicitly.
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
  /** `database.schema.table` split on dots (1–3 segments). */
  def nameParts: Seq[String] = exportTable.split("\\.").toSeq
  /** The bare table name — the reference's `tbl.split(".")[-1]`. */
  def tableBaseName: String = nameParts.last
  def resolvedExportQuery: String =
    exportQuery.getOrElse(s"SELECT * from $exportTable")
  def resolvedStageTable: String = stageTable.getOrElse(tableBaseName)
  /** Explicit database, else the catalog segment of a 3-part name. */
  def resolvedDatabase: String =
    if (database != "db") database
    else if (nameParts.length == 3) nameParts.head
    else database
  def resolvedLocation: String = location.getOrElse("EU")
}
