package graft.schema

import org.apache.spark.sql.types._

/** StructType ⇄ warehouse-JSON-schema codec — the Spark-native form of the
  * reference's schema codegen (`create_bigquery_schema_from_kv`,
  * reference dags/cloudsql_to_bigquery.py:168-196): emits a JSON array of
  * `{name, type, mode}` objects, every column NULLABLE (:189).
  */
object SchemaCodec {

  private def bqTypeOf(dt: DataType): String = dt match {
    case TimestampNTZType | TimestampType => "DATETIME"
    case DateType                         => "DATE"
    case LongType | IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType | FloatType | _: DecimalType       => "FLOAT"
    case BooleanType                      => "BOOLEAN"
    case _                                => "STRING"
  }

  private def sparkTypeOf(bq: String): DataType = bq.toUpperCase match {
    case "DATETIME" | "TIMESTAMP" => TimestampNTZType
    case "DATE"                   => DateType
    case "INTEGER" | "INT64"      => LongType
    case "FLOAT" | "FLOAT64"      => DoubleType
    case "BOOLEAN" | "BOOL"       => BooleanType
    case _                        => StringType
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Emit the JSON schema doc (names sanitized, all NULLABLE). */
  def toJson(schema: StructType): String =
    schema.fields.map { f =>
      s"""{"name": ${jstr(TypeMapper.sanitizeName(f.name))}, "type": ${jstr(bqTypeOf(f.dataType))}, "mode": "NULLABLE"}"""
    }.mkString("[", ", ", "]")

  /** Evolution verdict between two catalog snapshots of the same table —
    * the REFUSAL half of the schema-evolution story (a32 pins the
    * additive path): per column, one of
    *
    *   - `unchanged` — same warehouse type;
    *   - `added` — new column (additive, NULL-backfill applies);
    *   - `removed` — column gone at the source (history keeps it,
    *     future rows carry NULL — additive in reverse, still safe);
    *   - `widened` — the engine-native type widens losslessly while the
    *     warehouse label is unchanged or relaxes to STRING ("you can
    *     fix it later" absorbs ANY type as text — reference :155);
    *   - `incompatible` — the warehouse type CHANGES between two
    *     non-STRING labels (INTEGER→FLOAT, DATETIME→DATE, …): day-1
    *     parquet cannot be read under the day-2 schema, so the sync
    *     must REFUSE loudly instead of silently coercing.
    *
    * Verdicts are derived from the reference's 5-type warehouse system
    * ([[TypeMapper.toBqType]]), matching what the BQ-side load would
    * actually accept. `compatible` = no `incompatible` column.
    */
  def evolutionVerdicts(oldCat: Seq[(String, String)],
                        newCat: Seq[(String, String)]): Seq[(String, String, String, String)] = {
    val o = oldCat.map { case (n, t) =>
      TypeMapper.sanitizeName(n) -> TypeMapper.toBqType(t) }.toMap
    val n = newCat.map { case (nm, t) =>
      TypeMapper.sanitizeName(nm) -> TypeMapper.toBqType(t) }.toMap
    val names = (oldCat.map(c => TypeMapper.sanitizeName(c._1)) ++
      newCat.map(c => TypeMapper.sanitizeName(c._1))).distinct
    names.map { nm =>
      val verdict = (o.get(nm), n.get(nm)) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(a), Some(b)) if a == b     => "unchanged"
        case (Some(_), Some("STRING"))        => "widened"
        case _                                => "incompatible"
      }
      (nm, o.getOrElse(nm, ""), n.getOrElse(nm, ""), verdict)
    }
  }

  /** Parse a JSON schema doc back into a StructType (all nullable).
    * Minimal recursive-descent over the `[{...}, ...]` shape the codec
    * emits — no external JSON library (zero-dependency constraint).
    */
  def fromJson(json: String): StructType = {
    val field = """\{\s*"name"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"type"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"mode"\s*:\s*"[^"]*"\s*\}""".r
    val unescape = (s: String) => s
      .replace("\\\"", "\"").replace("\\\\", "\\")
    StructType(field.findAllMatchIn(json).map { m =>
      StructField(unescape(m.group(1)), sparkTypeOf(unescape(m.group(2))), nullable = true)
    }.toSeq)
  }
}
