// (native-operator tests appended at the bottom of this suite)
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

  test("native operator agrees with the composed form on every semantic case") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"), // no preceding right row
      (3L, ts("2024-01-01 10:00:00"), "l4"), // equal-ts match
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1", 1.0),
      (1L, ts("2024-01-01 11:00:00"), "r2", 2.0),
      (2L, ts("2024-01-01 09:30:00"), "r3", 3.0),
      (3L, ts("2024-01-01 10:00:00"), "r4", 4.0),
    ).toDF("k", "t", "rv", "amt")
    val composed = AsOf.join(left, right, "k", "t", Seq("rv", "amt"))
    val native = AsOf.joinNative(left, right, "k", "t", Seq("rv", "amt"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == left.count(), "left join: every left row survives")
  }

  test("native operator plans AsOfJoinExec with one exchange per side") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "r")).toDF("k", "t", "rv")
    val p = AsOf.joinNative(left, right, "k", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec node must plan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"one co-partitioning exchange per side:\n$p")
  }

  test("native operator: duplicate (key, ts) right rows resolve to the " +
       "payload-greatest row (deterministic tie-break)") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), "rA", 1.0),
      (1L, ts("2024-01-01 09:00:00"), "rB", 2.0),
    ).toDF("k", "t", "rv", "amt")
    val native = AsOf.joinNative(left, right, "k", "t", Seq("rv", "amt")).collect()
    val composed = AsOf.join(left, right, "k", "t", Seq("rv", "amt")).collect()
    assert(native.head.getAs[String]("rv") == "rB")
    assert(composed.head.getAs[String]("rv") == "rB")
  }

  test("native operator: null keys/timestamps are null-rejecting, not a crash") {
    import spark.implicits._
    // null key and null ts rows on BOTH sides: right-side ones must be
    // skipped (never a match), left-side ones survive with null payload —
    // the SQL ASOF oracle's ON-equality semantics
    val left = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), "l1"),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), "lNullKey"),
      (Option(1L), Option.empty[Timestamp], "lNullTs"),
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), "r1"),
      (Option.empty[Long], Option(ts("2024-01-01 08:00:00")), "rNullKey"),
      (Option(1L), Option.empty[Timestamp], "rNullTs"),
    ).toDF("k", "t", "rv")
    val out = AsOf.joinNative(left, right, "k", "t", Seq("rv"))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("rv")).toMap
    assert(out == Map("l1" -> "r1", "lNullKey" -> null, "lNullTs" -> null))
  }

  test("native operator works when both sides share one source relation " +
       "(exprId dedup)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    import org.apache.spark.sql.functions._
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    val out = AsOf.joinNative(clicks, purchases, "user_id", "ts", Seq("p_id"))
    val expected = AsOf.join(clicks, purchases, "user_id", "ts", Seq("p_id"))
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("tolerance: in-window matches kept, stale matches nulled, boundary " +
      "inclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "in"),      // match 30 min back
      (1L, ts("2024-01-01 13:00:00"), "stale"),   // latest match 2 h back
      (1L, ts("2024-01-01 12:00:00"), "boundary"),// match EXACTLY 1 h back
      (2L, ts("2024-01-01 09:00:00"), "none")     // no preceding row at all
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2")
    ).toDF("k", "t", "rv")
    val got = AsOf.joinWithTolerance(left, right, "k", "t", Seq("rv"),
        tolerance = "INTERVAL 1 HOUR")
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("rv")).toMap
    assert(got === Map("in" -> "r1", "stale" -> null,
      "boundary" -> "r2", "none" -> null))
    // zero-width sanity: with an unbounded tolerance the operator IS the
    // plain as-of join
    val wide = AsOf.joinWithTolerance(left, right, "k", "t", Seq("rv"),
      tolerance = "INTERVAL 100 DAYS")
    val plain = AsOf.join(left, right, "k", "t", Seq("rv"))
    assert(wide.exceptAll(plain).isEmpty && plain.exceptAll(wide).isEmpty)
  }

  test("nearest: picks the |dist|-argmin either direction, equidistant " +
      "ties go backward, equal-ts wins outright") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "back"),    // r@09:50 nearer than r@10:30
      (1L, ts("2024-01-01 10:25:00"), "fwd"),     // r@10:30 nearer than r@09:50
      (1L, ts("2024-01-01 10:10:00"), "tie"),     // 20 min both ways -> back
      (1L, ts("2024-01-01 10:30:00"), "exact"),   // equal ts wins
      (2L, ts("2024-01-01 10:00:00"), "only_fwd"),// no preceding row at all
      (3L, ts("2024-01-01 10:00:00"), "none")     // no right rows for key
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, ts("2024-01-01 09:50:00"), "r0950"),
      (1L, ts("2024-01-01 10:30:00"), "r1030"),
      (2L, ts("2024-01-01 11:00:00"), "r1100")
    ).toDF("k", "t", "rv")
    val got = AsOf.joinNearest(left, right, "k", "t", Seq("rv"))
      .collect().map(r => r.getAs[String]("lv") -> r.getAs[String]("rv")).toMap
    assert(got === Map("back" -> "r0950", "fwd" -> "r1030",
      "tie" -> "r0950", "exact" -> "r1030",
      "only_fwd" -> "r1100", "none" -> null))
  }

  test("nearest equals the brute-force argmin on real events (sf0.001)") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    val got = AsOf.joinNearest(clicks, purch, "user_id", "ts", Seq("p_id"))
      .collect().map(r => r.getLong(2) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val ps = purch.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    clicks.collect().foreach { c =>
      val (u, t, id) = (c.getLong(0), c.getTimestamp(1).getTime, c.getLong(2))
      val cand = ps.filter(_._1 == u)
      val expect =
        if (cand.isEmpty) None
        else Some(cand.minBy(p => (math.abs(p._2 - t), p._2, -p._3))._3)
      assert(got(id) == expect, s"click $id")
    }
  }
}
