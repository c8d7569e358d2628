package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeMapperSpec extends AnyFunSuite {

  // FIXTURES.md §2.1 table-driven expectations, incl. the ordering traps.
  val cases: Seq[(String, String, DataType)] = Seq(
    ("int", "INTEGER", LongType),
    ("tinyint", "INTEGER", LongType),
    ("bigint", "INTEGER", LongType),
    ("datetime", "DATETIME", TimestampNTZType), // DATETIME before DATE
    ("date", "DATE", DateType),
    ("timestamp", "DATETIME", TimestampNTZType),
    ("decimal", "FLOAT", DoubleType),           // lossy by design
    ("double", "FLOAT", DoubleType),
    ("float", "FLOAT", DoubleType),
    ("varchar", "STRING", StringType),
    ("text", "STRING", StringType),
    ("blob", "STRING", StringType),             // fallback
    ("point", "INTEGER", LongType),             // faithful quirk: *INT* catches POINT
    ("", "STRING", StringType),
  )

  test("ordered substring rules (table-driven)") {
    cases.foreach { case (src, bq, spark) =>
      assert(TypeMapper.toBqType(src) == bq, s"bq($src)")
      assert(TypeMapper.toSparkType(src) == spark, s"spark($src)")
      // case-insensitive
      assert(TypeMapper.toBqType(src.toUpperCase) == bq, s"BQ($src)")
    }
  }

  test("DATETIME-before-DATE ordering trap") {
    // 'datetime' contains 'date' as substring; rule order must win
    assert(TypeMapper.toBqType("datetime") == "DATETIME")
    assert(TypeMapper.toBqType("datetime(6)") == "DATETIME")
  }

  test("fidelity flag keeps decimals") {
    assert(TypeMapper.toSparkType("decimal(10,2)", lossyDecimal = false) == DecimalType(38, 9))
    assert(TypeMapper.toSparkType("double", lossyDecimal = false) == DoubleType)
  }

  test("MySQL unsigned BIGINT widens to DECIMAL(20,0); BQ map stays faithful") {
    assert(TypeMapper.toSparkType("bigint unsigned") == DecimalType(20, 0))
    assert(TypeMapper.toSparkType("BIGINT(20) UNSIGNED") == DecimalType(20, 0))
    assert(TypeMapper.toBqType("bigint unsigned") == "INTEGER") // reference-faithful
    // plain bigint and other unsigned types are untouched
    assert(TypeMapper.toSparkType("bigint") == LongType)
    assert(TypeMapper.toSparkType("int unsigned") == LongType)
    assert(TypeMapper.toSparkType("decimal(10,2) unsigned") == DoubleType)
  }

  test("a04c dialect quirks: zero-date nulls, unsigned max survives, " +
      "tinyint(1) stays integer") {
    val spark = graft.Engine.session("typemapper-a04c", "2")
    val got = graft.operators.PipelineQueries.a04cMysqlQuirks(spark, "")
      .collect().map(r => r.getString(0) -> Option(r.getString(4))).toMap
    assert(got("born").isEmpty, "zero-date must CONVERT_TO_NULL")
    assert(got("updated").contains("2024-05-01 10:30:00"))
    assert(got("big_id").contains("18446744073709551615"),
      "2^64-1 must survive the DECIMAL(20,0) widening bit-for-bit")
    assert(got("is_active").contains("1"))
  }

  test("PostgreSQL dialect rules: bool/serial/timestamptz/numeric; " +
      "BQ map stays faithful (STRING fallback for non-reference names)") {
    // engine-native types
    assert(TypeMapper.toSparkType("boolean") == BooleanType)
    assert(TypeMapper.toSparkType("bool") == BooleanType)
    assert(TypeMapper.toSparkType("smallserial") == LongType)
    assert(TypeMapper.toSparkType("serial") == LongType)
    assert(TypeMapper.toSparkType("bigserial") == LongType)
    assert(TypeMapper.toSparkType("timestamptz") == TimestampType)
    assert(TypeMapper.toSparkType("timestamp with time zone") == TimestampType)
    assert(TypeMapper.toSparkType("numeric") == DoubleType)
    assert(TypeMapper.toSparkType("numeric", lossyDecimal = false) ==
      DecimalType(38, 9))
    // plain (wall-clock) timestamp is NOT caught by the tz rule
    assert(TypeMapper.toSparkType("timestamp") == TimestampNTZType)
    // reference-faithful BQ fallbacks: these names miss every substring
    // rule in the reference's map
    assert(TypeMapper.toBqType("boolean") == "STRING")
    assert(TypeMapper.toBqType("serial") == "STRING")
    assert(TypeMapper.toBqType("numeric") == "STRING")
    // ...while the tz forms DO hit the TIMESTAMP rule
    assert(TypeMapper.toBqType("timestamptz") == "DATETIME")
    // and the PG catalog's data_type spelling of a serial maps INTEGER
    assert(TypeMapper.toBqType("integer") == "INTEGER")
  }

  test("a04d dialect quirks: t/f booleans, serial widening, timestamptz " +
      "normalizes to the UTC instant, infinity nulls, numeric keeps digits") {
    val spark = graft.Engine.session("typemapper-a04d", "2")
    val got = graft.operators.PipelineQueries.a04dPgQuirks(spark, "")
      .collect().map(r => r.getString(0) -> Option(r.getString(4))).toMap
    assert(got("is_active").contains("true"))
    assert(got("is_deleted").contains("false"))
    assert(got("big_id").contains("9223372036854775807"))
    assert(got("created_at").contains("2024-05-01 08:30:00"),
      "+02 offset must normalize to the UTC instant")
    assert(got("expires_at").isEmpty, "infinity must CONVERT_TO_NULL")
    assert(got("balance").contains("12345678901234567890.123456789"),
      "29 significant digits must survive DECIMAL(38,9)")
  }

  test("SQL Server dialect rules: bit/money/datetimeoffset/tinyint; " +
      "BQ map stays substring-faithful") {
    // "BIT" contains no "INT" — reference map falls through to STRING
    assert(TypeMapper.toBqType("bit") == "STRING")
    assert(TypeMapper.toSparkType("bit") == BooleanType)
    // exact-match guard: PG's VARBIT is NOT a boolean
    assert(TypeMapper.toSparkType("varbit") == StringType)
    assert(TypeMapper.toBqType("money") == "STRING")
    assert(TypeMapper.toSparkType("money") == DecimalType(19, 4))
    assert(TypeMapper.toSparkType("smallmoney") == DecimalType(10, 4))
    assert(TypeMapper.toBqType("datetimeoffset") == "DATETIME",
      "the DATETIME substring rule fires — reference-faithful wall-clock label")
    assert(TypeMapper.toSparkType("datetimeoffset") == TimestampType,
      "engine treats the offset type as an instant")
    assert(TypeMapper.toBqType("datetime2") == "DATETIME")
    assert(TypeMapper.toSparkType("datetime2") == TimestampNTZType)
    assert(TypeMapper.toSparkType("smalldatetime") == TimestampNTZType)
    assert(TypeMapper.toBqType("tinyint") == "INTEGER")
    assert(TypeMapper.toBqType("uniqueidentifier") == "STRING")
    assert(TypeMapper.toSparkType("uniqueidentifier") == StringType)
    assert(TypeMapper.toBqType("nvarchar") == "STRING")
  }

  test("a04e dialect quirks: datetime2 truncation, UTC-normalized " +
      "datetimeoffset, money maxima, GUID lowercasing") {
    val spark = graft.Engine.session("typemapper-a04e", "2")
    val got = graft.operators.PipelineQueries
      .a04eMssqlQuirks(spark, "")
      .collect().map(r => r.getString(0) -> Option(r.getString(4))).toMap
    assert(got("created_at").contains("2024-05-01 10:30:00.123456"),
      "datetime2(7)'s 100-ns digit must truncate at engine microseconds")
    assert(got("event_at").contains("2024-05-01 08:30:00"),
      "+02:00 offset must normalize to the UTC instant")
    assert(got("is_active").contains("true"))
    assert(got("flag_off").contains("false"))
    assert(got("balance").contains("922337203685477.5807"),
      "money max must survive DECIMAL(19,4)")
    assert(got("tip").contains("214748.3647"))
    assert(got("row_guid").contains("6f9619ff-8b86-d011-b42d-00c04fc964ff"))
    assert(got("qty").contains("255"), "SQL Server tinyint is unsigned")
    assert(got("title").contains("naïve café"))
  }

  test("name sanitization rules") {
    assert(TypeMapper.sanitizeName("full name") == "full_name")
    assert(TypeMapper.sanitizeName("either/or") == "either_and_or")
    assert(TypeMapper.sanitizeName("a\"b") == "ab")
    assert(TypeMapper.sanitizeName("both kinds/of bad") == "both_kinds_and_of_bad")
  }

  test("sanitization is idempotent (seeded random strings)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(20)).map(_ => rnd.nextPrintableChar()).mkString
      val once = TypeMapper.sanitizeName(s)
      assert(TypeMapper.sanitizeName(once) == once, s"input: $s")
    }
  }

  test("schema inference from catalog rows (FIXTURES.md §2.1)") {
    val schema = TypeMapper.schemaFromCatalogRows(Seq(
      "id" -> "int", "full name" -> "varchar", "either/or" -> "varchar",
      "born" -> "datetime", "start_date" -> "date", "balance" -> "decimal",
      "ratio" -> "double", "note" -> "text"))
    assert(schema.fieldNames.toSeq == Seq(
      "id", "full_name", "either_and_or", "born", "start_date", "balance", "ratio", "note"))
    assert(schema("born").dataType == TimestampNTZType)
    assert(schema("start_date").dataType == DateType)
    assert(schema("balance").dataType == DoubleType)
    assert(schema.fields.forall(_.nullable))
  }
}
