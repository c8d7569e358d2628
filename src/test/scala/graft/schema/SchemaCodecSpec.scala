package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaCodecSpec extends AnyFunSuite {

  val fixture: StructType = TypeMapper.schemaFromCatalogRows(Seq(
    "id" -> "int", "full name" -> "varchar", "born" -> "datetime",
    "start_date" -> "date", "balance" -> "decimal", "note" -> "text"))

  test("emits NULLABLE JSON for every field") {
    val json = SchemaCodec.toJson(fixture)
    assert(json.startsWith("[") && json.endsWith("]"))
    assert("\"mode\": \"NULLABLE\"".r.findAllIn(json).size == fixture.size)
    assert(json.contains("""{"name": "born", "type": "DATETIME", "mode": "NULLABLE"}"""))
    assert(json.contains("""{"name": "balance", "type": "FLOAT", "mode": "NULLABLE"}"""))
  }

  test("round-trips through JSON") {
    val back = SchemaCodec.fromJson(SchemaCodec.toJson(fixture))
    assert(back == fixture)
  }

  test("escapes quotes and backslashes in names") {
    val s = StructType(Seq(StructField("""we"ird\name""", StringType)))
    val json = SchemaCodec.toJson(s)
    // sanitizer strips double quotes; backslash must survive escaped
    val back = SchemaCodec.fromJson(json)
    assert(back.fieldNames.head == """weird\name""")
  }
}
