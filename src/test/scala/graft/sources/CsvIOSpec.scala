package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** A7 — the CSV NULL/quote/escape contract as round-trip invariants
  * (FIXTURES.md §2.2: the reference's broken-NULL sed chain re-expressed
  * as reader/writer options that must round-trip faithfully).
  */
class CsvIOSpec extends SparkTestBase {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("note", StringType), StructField("d", StringType)))

  val trickyRows: Seq[Row] = Seq(
    Row(1L, "alice", null, "2020-01-01"),            // NULL mid-row
    Row(null, "bob", "x", "2020-01-02"),             // NULL first field
    Row(3L, "carol", "y", null),                     // NULL last field
    Row(4L, "da\rend", "cr", "2020-01-03"),          // embedded CR (the \r" case)
    Row(5L, "e,with,commas", "quoted \"inner\"", "2020-01-04"),
    Row(6L, "", "empty-string", "2020-01-05"),       // "" vs NULL distinction
    Row(7L, "line\nbreak", "lf", "2020-01-06"),      // embedded LF
    Row(8L, "unicodé 中文", "uni", "2020-01-07"),
  )

  test("tricky rows round-trip exactly (NULLs, quotes, CR/LF, unicode)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(trickyRows, 2), schema)
    val tmp = Files.createTempDirectory("csvspec").toString
    CsvIO.write(df, tmp)
    val back = CsvIO.read(spark, tmp, schema)
    assert(back.count() == trickyRows.size)
    val orig = df.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got == orig)
  }

  test("NULL and empty string stay distinct") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(trickyRows, 1), schema)
    val tmp = Files.createTempDirectory("csvspec2").toString
    CsvIO.write(df, tmp)
    val back = CsvIO.read(spark, tmp, schema).collect()
    val r6 = back.find(_.getAs[Long]("id") == 6L).get
    assert(r6.getAs[String]("name") == "")
    val r1 = back.find(_.getAs[Long]("id") == 1L).get
    assert(r1.getAs[String]("note") == null)
  }

  test("NDJSON schema side-file round-trips without inference") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(trickyRows.take(3), 1), schema)
    val tmp = Files.createTempDirectory("jsonschema").toString
    JsonIO.write(df, tmp, chunks = 2)
    assert(new java.io.File(tmp, "_schema.json").exists())
    val back = JsonIO.readWithSidecar(spark, tmp)
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back.count() == 3)
  }

  test("HLL approximate distinct lands within its error bound") {
    // the 10% bound check now lives IN the query (oracle-verified via the
    // hll_ok flag); the spec asserts every group passed it
    val got = graft.operators.LlmQueries.dedupApproxHll(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"${r.getAs[String]("lang")}: HLL estimate outside the 10% bound " +
          s"of exact ${r.getAs[Long]("exact_distinct")}")
    }
  }

  test("NDJSON chunked write produces multiple part files, glob read restores") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(trickyRows, 1), schema)
    val tmp = Files.createTempDirectory("jsonspec").toString
    JsonIO.write(df, tmp, chunks = 3)
    val parts = new java.io.File(tmp).listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 3, "chunk count drives file count")
    val back = JsonIO.read(spark, tmp + "/part-*", schema)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }
}
