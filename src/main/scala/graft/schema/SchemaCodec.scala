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
