package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariants of the round-3 analytics layer: reshape round-trips,
  * sessionization gap semantics, sampling determinism, Bloom-prune
  * equivalence, bucketed-range-join equivalence, SCD2 history laws.
  */
class AnalyticsSpec extends SparkTestBase {

  test("dqEwma: the closed-form windowed EWMA equals the sequential " +
      "recursion, and the band rule flags exactly the deviating days") {
    val got = Analytics.dqEwma(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    // driver-side sequential recursion over the same day counts
    val alpha = 0.3
    var ewma = got.head._2.toDouble
    got.zipWithIndex.foreach { case ((day, n, expected, flag), i) =>
      if (i == 0) {
        assert(expected == n.toDouble, "first day expects itself")
        assert(!flag, "first day can never flag")
      } else {
        // `expected` is the closed form ROUNDED to 4 decimals
        assert(math.abs(expected - ewma) < 5.1e-5,
          s"$day: closed form $expected != recursion $ewma")
        assert(flag == (n > ewma * 1.5 || n < ewma / 1.5), s"$day flag")
      }
      ewma = alpha * n + (1 - alpha) * ewma
    }
  }

  test("pivot and unpivot are inverse reshapes of the same aggregate") {
    val wide = Analytics.pivotOrders(spark, sfDir)
    // every (yr, status) cell equals the direct group-by value
    val direct = graft.Tables.load(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderstatus").as("st"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
    wide.collect().foreach { r =>
      val yr = r.getInt(0)
      Seq(("F", 1), ("O", 2), ("P", 3)).foreach { case (st, i) =>
        val cell = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        assert(cell == direct.get((yr, st)), s"pivot cell ($yr, $st)")
      }
    }
    val long = Analytics.unpivotCustomer(spark, sfDir)
    assert(long.columns.toSeq == Seq("nation", "metric", "value"))
    // 3 metrics per nation, no nulls introduced by the melt
    val perNation = long.groupBy("nation").count().collect()
    assert(perNation.forall(_.getLong(1) == 3))
  }

  test("sessionize: every session gap <= 30 min inside, > 30 min between") {
    val sessions = Analytics.sessionize(spark, sfDir)
    // session_seq is dense from 1 per user and session starts are ordered
    val perUser = sessions.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("session_seq").as("mx"), min("session_seq").as("mn"))
      .collect()
    assert(perUser.forall(r => r.getLong(3) == 1L && r.getLong(2) == r.getLong(1)))
    // duration is non-negative and bounded by (n_events - 1) * max gap
    assert(sessions.filter(col("duration_sec") < 0).isEmpty)
    assert(sessions.filter(col("n_events") === 1 && col("duration_sec") =!= 0).isEmpty)
  }

  test("hashSample is deterministic and respects per-stratum rates") {
    val a = Analytics.hashSample(spark, sfDir).collect()
    val b = Analytics.hashSample(spark, sfDir).collect()
    assert(a.sameElements(b), "hash sampling must be run-stable")
    assert(a.nonEmpty)
  }

  test("bloomSemiJoin equals the exact semi join (false positives re-checked)") {
    val viaBloom = Analytics.bloomSemiJoin(spark, sfDir)
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val exact = graft.Tables.load(spark, sfDir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), round(sum("l_extendedprice"), 2).as("rev"))
      .orderBy("l_orderkey")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
  }

  test("rangeBucketJoin equals the unbucketed range join") {
    val bucketed = Analytics.rangeBucketJoin(spark, sfDir)
    val ev = graft.Tables.load(spark, sfDir, "events")
    val w = ev.filter(col("event_type") === "error")
      .select(date_trunc("DAY", col("ts")).as("win_start")).distinct()
      .withColumn("win_end", col("win_start") + expr("INTERVAL 1 DAY"))
    val plain = ev.join(w, // no bucket key: pure range predicate
        col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy("win_start").agg(count(lit(1)).as("n_events"))
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
  }

  test("interval-overlap join equals the un-bucketed theta join " +
      "(first-shared-bucket emits each pair once)") {
    val windows = graft.Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 300000)
      .select(date_trunc("DAY", col("o_orderdate")).as("win_start"))
      .distinct()
      .withColumn("win_last", col("win_start") + expr("INTERVAL 2 DAY"))
    val ship = graft.Tables.load(spark, sfDir, "lineitem")
      .select(date_trunc("DAY", col("l_shipdate")).as("sd"),
        expr("date_trunc('DAY', l_shipdate) + (CAST(l_quantity AS INT) % 7 + 1) * INTERVAL '1' DAY").as("rd"))
    // reference: plain overlap theta join (BNLJ — fine at spec scale)
    val want = ship.join(windows,
        col("sd") <= col("win_last") && col("rd") >= col("win_start"))
      .groupBy("win_start")
      .agg(count(lit(1)).as("n_overlaps"),
        round(avg(datediff(least(col("rd"), col("win_last")),
          greatest(col("sd"), col("win_start"))) + 1), 4).as("avg_overlap_days"))
    val got = Analytics.intervalOverlapJoin(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "bucketed overlap join must equal the direct theta join")
    assert(got.count() > 0)
  }

  test("approx percentiles land within sketch tolerance of the exact values") {
    // the rank-bound check now lives IN the query (oracle-verified via
    // the approx_ok flag): the sketch estimate must land in the exact
    // value band at q ± 0.002 (4× the guaranteed n/2000 rank error)
    val rows = Queries.q22b(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"${r.getString(0)}: approx_percentile outside the rank band " +
          s"around exact (${r.getDouble(1)}, ${r.getDouble(2)}, ${r.getDouble(3)})")
    }
    // and the exact columns match q22's formulation bit-for-bit
    val exact = Queries.q22(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    rows.foreach { r =>
      assert(exact(r.getString(0)) == ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
    }
  }

  test("profile emits one row per column with exact null/distinct counts") {
    val p = Analytics.profile(spark, sfDir, "nation")
      .collect().map(r => r.getString(0) -> r).toMap
    val n = graft.Tables.load(spark, sfDir, "nation")
    assert(p.keySet == n.columns.toSet)
    assert(p("n_nationkey").getLong(1) == n.count())
    assert(p("n_nationkey").getLong(3) == 25L) // 25 distinct nations
  }

  test("dqOutliers covers every event group and flags only the tails") {
    val out = Analytics.dqOutliers(spark, sfDir).collect()
    val total = graft.Tables.load(spark, sfDir, "events").count()
    assert(out.map(_.getLong(1)).sum == total, "groups partition the table")
    out.foreach { r =>
      // 3-sigma tails: a handful of rows at most, never a broad sweep
      assert(r.getDouble(3) <= 0.05, s"${r.getString(0)} frac ${r.getDouble(3)}")
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("driftPsi: identical snapshots measure zero, known drift registers") {
    import spark.implicits._
    val snap = (1 to 50).map(i => (s"t${i % 3}", i.toDouble)).toDF("cat", "v")
    // identical snapshots: every (pc - pb) term is zero in both columns
    val same = Analytics.driftPsi(snap, snap, "cat", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(same == Map("cat_psi" -> 0.0, "v_psi" -> 0.0))
    // a vanished category and a uniform value shift both register
    val drifted = snap.select(
      when(col("cat") === "t0", "t9").otherwise(col("cat")).as("cat"),
      (col("v") + 100.0).as("v"))
    val got = Analytics.driftPsi(snap, drifted, "cat", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("cat_psi") > 1.0, s"category swap must dominate: $got")
    // +100 pushes every value past the baseline max → all mass clamps to
    // the top bin: a maximal single-bin migration
    assert(got("v_psi") > 1.0, s"full range shift must dominate: $got")
  }

  test("windowed funnel: order and window both gate each step") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    // u1 completes in order within the window;
    // u2 clicks BEFORE viewing (order violation — stops at step 1);
    // u3 clicks 2h after the view (window violation at lim=1h);
    // u4 re-views, then converts off the LATER view (must count: the
    //    latest-prior-step semantics) but purchases before clicking
    //    (order violation at step 3);
    // u5 never views (contributes to no step).
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"), (1L, ts(30), 3L, "purchase"),
      (2L, ts(0), 4L, "click"), (2L, ts(10), 5L, "view"),
      (3L, ts(0), 6L, "view"), (3L, ts(120), 7L, "click"),
      (4L, ts(0), 8L, "view"), (4L, ts(90), 9L, "view"),
      (4L, ts(100), 10L, "purchase"), (4L, ts(110), 11L, "click"),
      (5L, ts(0), 12L, "click"), (5L, ts(5), 13L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Analytics.funnelSteps(ev, lim = "INTERVAL 1 HOUR")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // step1: u1,u2,u3,u4 viewed; step2: u1 and u4 clicked in-window
    // after a view; step3: only u1 purchased after its click
    assert(got === Map(1L -> 4L, 2L -> 2L, 3L -> 1L))
  }

  test("retention: offset-0 is total cohort, ratios bounded, Monday cohorts") {
    val rows = Analytics.retention(spark, sfDir).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val c0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cohort, off, n, ret) =>
      assert(off >= 0L)
      assert(cohort.toLocalDate.getDayOfWeek
        === java.time.DayOfWeek.MONDAY, s"cohort $cohort not a Monday")
      assert(n <= c0(cohort), "no offset can exceed its cohort size")
      assert(ret > 0.0 && ret <= 1.0)
      if (off == 0L) assert(ret === 1.0, "week 0 retention is 1 by definition")
    }
  }

  test("rollingDistinct: wau7 matches a brute-force trailing window, " +
      "dau <= wau7") {
    val rows = Analytics.rollingDistinct(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, dau, wau) => assert(dau <= wau) }
    // brute force from the raw (user, day) pairs
    val ud = graft.Tables.load(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    rows.foreach { case (day, dau, wau) =>
      val expectDau = ud.filter(_._2 == day).map(_._1).distinct.length
      val expectWau = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6)) }
        .map(_._1).distinct.length
      assert(dau === expectDau.toLong, s"dau on $day")
      assert(wau === expectWau.toLong, s"wau7 on $day")
    }
  }

  test("dqFreshness: full calendar covered, counts reconcile, statuses " +
      "consistent with the median rule") {
    val rows = Analytics.dqFreshness(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getString(2)))
    val total = graft.Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_._2).sum === total, "day counts reconcile to the table")
    // contiguous calendar
    rows.map(_._1).sliding(2).foreach {
      case Array(a, b) => assert(b == a.plusDays(1), s"gap between $a and $b")
      case _ =>
    }
    val present = rows.filter(_._2 > 0).map(_._2)
    val sorted = present.sorted
    val med =
      if (sorted.length % 2 == 1) sorted(sorted.length / 2).toDouble
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    rows.foreach { case (day, n, st) =>
      val want = if (n == 0) "missing" else if (n < med * 0.5) "low" else "ok"
      assert(st === want, s"status on $day (n=$n, med=$med)")
    }
  }

  test("dqMad: registered query flags tails per group, robust stats " +
      "match a driver-side recompute") {
    val rows = Analytics.dqMad(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    val vals = graft.Tables.load(spark, sfDir, "events")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    rows.foreach { case (et, (n, med, mad, nOut)) =>
      val xs = vals(et).map(_._2)
      assert(n === xs.length.toLong)
      val m = median(xs)
      val d = median(xs.map(x => math.abs(x - m)))
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(med === r4(m), s"median for $et")
      assert(mad === r4(d), s"mad for $et")
      assert(nOut === xs.count(x => math.abs(x - m) > 3.0 * 1.4826 * d).toLong,
        s"outliers for $et")
    }
  }

  test("histogram: counts partition the table, cumulative and share close") {
    val total = graft.Tables.load(spark, sfDir, "lineitem").count()
    val rows = Analytics.histogram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._3).sum === total, "bucket counts partition the rows")
    assert(rows.last._4 === total, "last cumulative count is the total")
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)), "bucket order")
    rows.foreach { case (b, lo, _, _, _) => assert(lo === b * 5000.0) }
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-2, "shares sum to ~1")
  }

  test("dq_seasonal: flags agree with a driver-side per-weekday median " +
      "recompute, and every weekday's median comes from its own days") {
    val rows = Analytics.dqSeasonal(spark, sfDir)
      .collect().map(r => (r.getDate(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    val byDow = rows.groupBy(_._2)
    byDow.foreach { case (dow, ds) =>
      // exact interpolated median of this weekday's counts
      val ns = ds.map(_._3).sorted
      val med =
        if (ns.length % 2 == 1) ns(ns.length / 2).toDouble
        else (ns(ns.length / 2 - 1) + ns(ns.length / 2)) / 2.0
      ds.foreach { case (day, _, n, wdMed, status) =>
        assert(math.abs(wdMed - math.rint(med * 10) / 10) < 1e-9,
          s"$day dow=$dow median $wdMed vs recompute $med")
        val expect =
          if (n * 10.0 < med * 6.0) "low"
          else if (n * 10.0 > med * 14.0) "high"
          else "ok"
        assert(status == expect, s"$day n=$n med=$med -> $status")
      }
    }
  }

  test("dqEntropy: a constant column scores 0 entropy / 0 gini / mode 1; " +
      "uniform categories hit ln(k) and (k-1)/k exactly") {
    val got = Analytics.dqEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet ==
      Set("o_orderstatus", "o_orderpriority", "order_year"))
    got.values.foreach { case (nd, ent, gini, mode) =>
      assert(nd >= 1 && ent >= 0 && gini >= 0 && gini < 1
        && mode > 0 && mode <= 1)
      // entropy is bounded by ln(n_distinct); gini by (nd-1)/nd
      assert(ent <= math.log(nd.toDouble) + 1e-9, s"entropy bound $ent vs $nd")
      assert(gini <= (nd - 1).toDouble / nd + 1e-9)
    }
    // hand frames through the same math: constant and uniform
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def profile(vals: Seq[String]): (Double, Double, Double) = {
      val counts = vals.groupBy(identity).values.map(_.size.toDouble)
      val n = vals.size.toDouble
      def r4(v: Double) = BigDecimal(v)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r4(-counts.map(c => c / n * math.log(c / n)).sum),
       r4(1.0 - counts.map(c => (c / n) * (c / n)).sum),
       r4(counts.max / n))
    }
    assert(profile(Seq.fill(10)("x")) == ((0.0, 0.0, 1.0)))
    val (e4, g4, m4) = profile(Seq("a", "b", "c", "d"))
    assert(math.abs(e4 - math.log(4.0)) < 1e-4 && g4 == 0.75 && m4 == 0.25)
  }

  test("bitwise folds: OR-bitmap, XOR-parity, AND-common are exact and " +
      "partitioning-invariant (commutative monoids)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, 1, 0xF0L), (1L, 2, 0x0FL), (1L, 3, 0xFFL),
      (2L, 1, 0x55L), (2L, 2, 0x55L))
    def fold(parts: Int) = rows.toDF("k", "ln", "pk").repartition(parts)
      .select(col("k"), expr("shiftleft(1L, ln)").as("slot"), col("pk"))
      .groupBy("k")
      .agg(expr("bit_or(slot)").as("mask"), expr("bit_xor(pk)").as("xr"),
        expr("bit_and(pk)").as("ad"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val one = fold(1)
    assert(one(1L) == ((0b1110L, 0xF0L ^ 0x0FL ^ 0xFFL, 0xF0L & 0x0F & 0xFF)))
    assert(one(2L) == ((0b0110L, 0L, 0x55L)))
    assert(fold(7) == one, "fold must not depend on the partition tree")
  }
}
