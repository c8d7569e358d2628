package graft.schema

import org.apache.spark.sql.types._

/** Source-catalog → engine type mapping and schema codegen.
  *
  * Re-expresses the reference's `datatype_to_bq`
  * (reference dags/cloudsql_to_bigquery.py:152-165): substring matching on
  * the upper-cased source DATA_TYPE, checked IN ORDER — `DATETIME` must hit
  * before `DATE`, and anything unmatched falls back to STRING ("you can fix
  * it later", :155). Name sanitization per :187 (`" "→"_"`, `"/"→"_and_"`,
  * `"` stripped); every column forced nullable per :189.
  *
  * Two output domains:
  *   - [[toBqType]]: the reference's 5-type warehouse system (DATETIME,
  *     DATE, INTEGER, FLOAT, STRING) — used by the BQ-JSON schema codec.
  *   - [[toSparkType]]: the engine-native Catalyst type. DECIMAL→DOUBLE is
  *     lossy BY DESIGN in the reference (:163-164); `lossyDecimal = false`
  *     is the fidelity flag that keeps DecimalType(38,9) instead.
  */
object TypeMapper {

  /** Ordered substring rules (first match wins). Order traps pinned by
    * tests: DATETIME before DATE, TIMESTAMP before anything; INT would also
    * catch POINT — preserved as reference-faithful behavior.
    */
  private val rules: Seq[(String, String)] = Seq(
    "TIMESTAMP" -> "DATETIME",
    "DATETIME"  -> "DATETIME",
    "DATE"      -> "DATE",
    "INT"       -> "INTEGER",
    "FLOAT"     -> "FLOAT",
    "DOUBLE"    -> "FLOAT",
    "DECIMAL"   -> "FLOAT",
  )

  def toBqType(sourceType: String): String = {
    val up = Option(sourceType).getOrElse("").toUpperCase
    rules.collectFirst { case (pat, bq) if up.contains(pat) => bq }
      .getOrElse("STRING")
  }

  def toSparkType(sourceType: String, lossyDecimal: Boolean = true): DataType = {
    val up = Option(sourceType).getOrElse("").toUpperCase
    // Engine-native fidelity extension (not in the reference's 5-type
    // warehouse map, which calls every INT an INTEGER): MySQL's unsigned
    // BIGINT tops out at 2^64−1 — past any signed 64-bit type — so the
    // engine widens it to DECIMAL(20,0) instead of silently overflowing
    // LongType. [[toBqType]] stays reference-faithful (INTEGER).
    if (up.contains("BIGINT") && up.contains("UNSIGNED")) return DecimalType(20, 0)
    // PostgreSQL dialect extensions (the reference ships a Postgres
    // cloud_sql_proxy alongside MySQL —
    // reference yaml/sql_proxy_postgresql_deployment_with_sa.yaml:56-57 —
    // but its type map is MySQL-tuned; these names all fall through the
    // reference's substring rules to STRING, which [[toBqType]] preserves
    // faithfully while the engine keeps the native type):
    //   - BOOLEAN: no BOOL rule exists in the reference map;
    //   - SMALLSERIAL/SERIAL/BIGSERIAL: the DDL-level autoincrement names
    //     carry no "INT" substring (the PG catalog's data_type reports
    //     the base int types, which DO map INTEGER — both spellings are
    //     pinned by a04d) — all int-valued, widened to 64-bit like every
    //     reference INT;
    //   - TIMESTAMPTZ / WITH TIME ZONE: an INSTANT, not the wall-clock
    //     the reference's DATETIME rule assumes — TimestampType
    //     (session-zoned), not TimestampNTZType;
    //   - NUMERIC: PG's spelling of DECIMAL — without (p,s) it is
    //     arbitrary-precision, so the fidelity flag matters most here.
    // Microsoft SQL Server dialect extensions (the reference's THIRD
    // engine — reference dags/mssql_to_bigquery.py:2 queries
    // `database.dbo.thetable`; 3-part naming is covered by TableConfig,
    // these are the value/type quirks):
    //   - BIT: SQL Server's 0/1 boolean. "BIT" carries no INT substring
    //     (despite the visual similarity), so the reference map falls
    //     through to STRING — toBqType stays faithful; the engine keeps
    //     BooleanType. Exact-match guard so PG's VARBIT stays STRING.
    //   - MONEY/SMALLMONEY: fixed-point decimal(19,4)/(10,4); no
    //     substring rule matches → STRING faithfully; the engine keeps
    //     the exact decimal so the 922337203685477.5807 max survives.
    //   - DATETIMEOFFSET: an INSTANT with explicit offset (SQL Server's
    //     timestamptz analog), but the DATETIME substring rule calls it
    //     wall-clock DATETIME — the engine parses the offset and
    //     normalizes to UTC (TimestampType), like PG's timestamptz.
    if (up == "BIT") return BooleanType
    if (up.contains("SMALLMONEY")) return DecimalType(10, 4)
    if (up.contains("MONEY")) return DecimalType(19, 4)
    if (up.contains("DATETIMEOFFSET")) return TimestampType
    if (up.contains("BOOL")) return BooleanType
    if (up.contains("SERIAL")) return LongType
    if (up.contains("TIMESTAMPTZ") || up.contains("WITH TIME ZONE"))
      return TimestampType
    if (up.contains("NUMERIC"))
      return if (lossyDecimal) DoubleType else DecimalType(38, 9)
    toBqType(sourceType) match {
      case "DATETIME" => TimestampNTZType // wall-clock, no zone (ref :157)
      case "DATE"     => DateType
      case "INTEGER"  => LongType         // all int widths widened to 64-bit
      case "FLOAT" if up.contains("DECIMAL") && !lossyDecimal =>
        DecimalType(38, 9)
      case "FLOAT"    => DoubleType
      case _          => StringType
    }
  }

  /** Column-name sanitization (reference :187). */
  def sanitizeName(name: String): String =
    name.replace("\"", "").replace(" ", "_").replace("/", "_and_")

  /** Schema inference from catalog rows `(COLUMN_NAME, DATA_TYPE)` in
    * ordinal order — the shape of the reference's INFORMATION_SCHEMA query
    * (reference dags/cloudsql_to_bigquery.py:141). All fields nullable.
    */
  def schemaFromCatalogRows(rows: Seq[(String, String)],
                            lossyDecimal: Boolean = true): StructType =
    StructType(rows.map { case (name, dt) =>
      StructField(sanitizeName(name), toSparkType(dt, lossyDecimal), nullable = true)
    })
}
