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

  test("evolutionVerdicts: every verdict class, STRING widening is never " +
      "incompatible, sanitized names align across snapshots") {
    val v = SchemaCodec.evolutionVerdicts(
      Seq("id" -> "int", "full name" -> "varchar", "born" -> "datetime",
        "bal" -> "decimal", "gone" -> "int"),
      Seq("id" -> "bigint", "full name" -> "text", "born" -> "varchar",
        "bal" -> "date", "fresh" -> "double"))
      .map(t => t._1 -> t._4).toMap
    assert(v("id") == "unchanged", "both INT widths map INTEGER")
    assert(v("full_name") == "unchanged",
      "sanitized name must align varchar->text as STRING->STRING")
    assert(v("born") == "widened", "DATETIME relaxing to STRING is safe")
    assert(v("bal") == "incompatible", "FLOAT->DATE must refuse")
    assert(v("gone") == "removed" && v("fresh") == "added")
    // exhaustive: any old type relaxing to a STRING-mapped new type is
    // widened, never incompatible
    Seq("int", "datetime", "date", "double", "decimal").foreach { t =>
      val r = SchemaCodec.evolutionVerdicts(Seq("c" -> t), Seq("c" -> "text"))
      assert(r.head._4 == "widened", s"$t -> text")
    }
  }
}
