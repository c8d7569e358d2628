package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV exchange format with pinned NULL/quote/escape semantics.
  *
  * The reference's CSV surface is broken at the writer (Cloud SQL emits
  * `"N` for NULL and mangles `\r`, repaired by a sed chain — reference
  * dags/cloudsql_to_bigquery.py:239-270, Google issue 64579566 at :244).
  * A correct writer makes the repair unnecessary; what must survive is the
  * CONTRACT the repair established: NULLs round-trip as empty unquoted
  * fields, embedded quotes/commas/CR/LF survive quoting, and a read-back
  * yields the exact rows written. These options pin that contract; the
  * round-trip property test (CsvIOSpec) is the reference's A7 semantics
  * re-expressed as an invariant instead of a sed chain.
  */
object CsvIO {
  private val common = Map(
    "header"      -> "false",
    // \N (the MySQL NULL marker — the very token Cloud SQL mangled into
    // `"N`, reference :244): an unambiguous NULL spelling, so quoted-empty
    // ("") survives as empty STRING instead of collapsing into NULL.
    "nullValue"   -> "\\N",
    "quote"       -> "\"",
    "escape"      -> "\"",      // RFC-4180 doubled quotes
    "multiLine"   -> "true",    // embedded CR/LF inside quotes
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "dateFormat"  -> "yyyy-MM-dd",
  )
  // Writer-only: empty string is written QUOTED ("") so it stays distinct
  // from NULL (unquoted empty). The reader keeps its defaults — univocity
  // already yields "" for a quoted-empty field and null for an unquoted
  // one; overriding read-side emptyValue would replace "" with the literal
  // option string.
  private val writeOpts = common + ("emptyValue" -> "\"\"")

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").options(writeOpts).csv(path)

  /** Schema is explicit — the reference never infers from data files; v1
    * derives it from the source catalog (A4/A6) and ships it alongside.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.options(common).schema(schema).csv(path)
}

/** NDJSON exchange format — the v2 pipeline's wire format
  * (`NEWLINE_DELIMITED_JSON`, reference dags/copy_cloudsql_to_bigquery_v2.py:109,
  * chunked files at :87-88 read back by glob at :102-103). Spark's
  * partitioned json output IS chunked-file export; a glob read restores it.
  */
object JsonIO {
  /** Writes chunked NDJSON plus — like the v2 operator's
    * `schema_filename` side-file (reference
    * dags/copy_cloudsql_to_bigquery_v2.py:89, consumed at :107) — a
    * `_schema.json` doc emitted by [[graft.schema.SchemaCodec]], so a
    * reader needs no inference.
    */
  def write(df: DataFrame, path: String, chunks: Int = 0): Unit = {
    val out = if (chunks > 0) df.repartition(chunks) else df
    out.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_schema.json"),
      graft.schema.SchemaCodec.toJson(df.schema))
  }

  def read(spark: SparkSession, glob: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .schema(schema).json(glob)

  /** Read back using the side-file schema (the v2 `schema_object` path). */
  def readWithSidecar(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.schema.SchemaCodec.fromJson(
      java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "_schema.json")))
    read(spark, dir + "/part-*", schema)
  }
}
