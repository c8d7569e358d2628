package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order layout: the interleave must match a bit-level reference, and
  * the layout must actually buy multi-column pruning — the quantitative
  * claim the operator exists for.
  */
class ZOrderSpec extends SparkTestBase {

  private def refMorton(x: Long, y: Long): Long =
    (0 until 16).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("morton16 column matches the bit-level reference") {
    val rows = spark.range(0, 2000, 7)
      .select((col("id") * 131).mod(65536).as("x"),
        (col("id") * 37 + 11).mod(65536).as("y"))
      .withColumn("z", Analytics.morton16(col("x"), col("y")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === refMorton(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-cells prune on BOTH dimensions; a single-key sort prunes on one") {
    val cells = Analytics.zorderLayout(spark, sfDir).collect()
    assert(cells.length === 32)
    val pkMax = cells.map(_.getLong(3)).max
    val skMax = cells.map(_.getLong(5)).max
    // a 10%-wide slice in the middle of each key domain
    def touched(lo: Long, hi: Long, mins: Array[Long], maxs: Array[Long]) =
      mins.zip(maxs).count { case (mn, mx) => mx >= lo && mn <= hi }
    val zTouchPk = touched(pkMax * 45 / 100, pkMax * 55 / 100,
      cells.map(_.getLong(2)), cells.map(_.getLong(3)))
    val zTouchSk = touched(skMax * 45 / 100, skMax * 55 / 100,
      cells.map(_.getLong(4)), cells.map(_.getLong(5)))
    // single-column layout: 32 equal pk-range files over the same rows
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"))
    val single = li
      .withColumn("bucket", expr(s"pk * 32 div (${pkMax + 1})"))
      .groupBy("bucket")
      .agg(min("pk").as("min_pk"), max("pk").as("max_pk"),
        min("sk").as("min_sk"), max("sk").as("max_sk"))
      .collect()
    val sTouchPk = touched(pkMax * 45 / 100, pkMax * 55 / 100,
      single.map(_.getLong(1)), single.map(_.getLong(2)))
    val sTouchSk = touched(skMax * 45 / 100, skMax * 55 / 100,
      single.map(_.getLong(3)), single.map(_.getLong(4)))
    // pk-sorted: perfect on pk, zero pruning on sk (every file spans it)
    assert(sTouchPk <= 8, s"pk-sort should prune pk hard, touched $sTouchPk")
    assert(sTouchSk === single.length, "pk-sort cannot prune sk")
    // z-order: real pruning on BOTH keys — ≤ half the cells for a 10% slice
    assert(zTouchPk <= 16, s"z-order pk pruning too weak: $zTouchPk/32")
    assert(zTouchSk <= 16, s"z-order sk pruning too weak: $zTouchSk/32")
  }
}
