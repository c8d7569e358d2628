package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest preceding right row; no-match keeps nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"), // before any right row
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (2L, ts("2024-01-01 09:30:00"), "r3"),
    ).toDF("k", "t", "rv")
    val out = AsOf.join(left, right, "k", "t", Seq("rv"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getAs[String]("lv"), r.getAs[String]("rv"))).toSeq ==
      Seq(("l1", "r1"), ("l2", "r2"), ("l3", null)))
  }

  test("equal timestamps match (r.ts <= l.ts, ASOF >= semantics)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "r")).toDF("k", "t", "rv")
    val out = AsOf.join(left, right, "k", "t", Seq("rv")).collect()
    assert(out.head.getAs[String]("rv") == "r")
  }

  test("one shuffle: plan contains a single hash exchange on the key") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r")).toDF("k", "t", "rv")
    val p = AsOf.join(left, right, "k", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one key shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
