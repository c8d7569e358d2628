package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Storage-layout scale behaviors: date-partitioned layout → partition
  * pruning (the engine-native form of the reference's date-keyed staging
  * objects, reference dags/cloudsql_to_bigquery.py:109,226-227).
  */
class StorageSpec extends SparkTestBase {

  test("date-partitioned staging prunes partitions at the scan") {
    val tmp = Files.createTempDirectory("partspec").toString
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("ds", date_format(col("ts"), "yyyyMMdd"))
    ev.write.mode("overwrite").partitionBy("ds").parquet(tmp)
    val nDays = ev.select("ds").distinct().count()
    assert(nDays > 5, "fixture needs several partitions")

    val oneDay = spark.read.parquet(tmp).filter(col("ds") === "20240115")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ds"),
      s"partition filter must reach the scan:\n$plan")
    // the pruned scan must read only the one matching directory
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }.sum
    assert(scanned == 1L, s"expected 1 partition read, got $scanned of $nDays")
    assert(oneDay.count() ==
      ev.filter(col("ds") === "20240115").count())
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val tmp = Files.createTempDirectory("dynspec").toString
      val ev = Tables.load(spark, sfDir, "events")
        .withColumn("ds", date_format(col("ts"), "yyyyMMdd"))
      ev.write.mode("overwrite").partitionBy("ds").parquet(tmp)
      val before = spark.read.parquet(tmp).count()
      // overwrite ONE day with a single marker row
      ev.filter(col("ds") === "20240115").limit(1)
        .write.mode("overwrite").partitionBy("ds").parquet(tmp)
      val after = spark.read.parquet(tmp)
      val day = after.filter(col("ds") === "20240115").count()
      assert(day == 1, "touched partition fully replaced")
      val others = after.filter(col("ds") =!= "20240115").count()
      assert(others == before - ev.filter(col("ds") === "20240115").count(),
        "untouched partitions must survive")
    } finally {
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("jsonl roundtrip preserves hostile strings byte-for-byte") {
    import spark.implicits._
    // every JSON escape class: quotes, backslash, control chars, tabs,
    // newlines, unicode outside the BMP-ASCII range, leading/trailing ws
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "with \"quotes\" and \\backslash\\"),
      (3L, "tab\there\nnewline\rcarriage"),
      (4L, "unicode: café 日本語 😀"),
      (5L, "  leading and trailing  "),
      (6L, "{\"looks\":\"like json\"}"))
    val df = nasty.toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("jsonlspec").toString + "/nasty"
    df.write.mode("overwrite").json(tmp)
    val back = spark.read.schema("doc_id BIGINT, text STRING").json(tmp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    nasty.foreach { case (id, s) =>
      assert(back(id) == s, s"doc $id mutated through the JSON cycle") }
  }
}
