package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** OLS invariants: an exactly-linear dataset is recovered with R² = 1;
  * a noisy dataset matches a driver-side normal-equation solve; the
  * registered lineitem fit has sane diagnostics.
  */
class RegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("exactly linear data recovers the generating betas with r2 = 1") {
    // y = 2 + 3*x1 + 5*x2 over a non-degenerate integer grid
    val rows = for (a <- 0 to 9; b <- 0 to 9)
      yield ("g", a.toDouble, b.toDouble, 2.0 + 3 * a + 5 * b)
    val got = Regression.olsTwoFeature(rows.toDF("g", "x1", "x2", "y"),
        "g", col("x1"), col("x2"), col("y"))
      .collect().head
    assert(got.getDouble(1) === 2.0)
    assert(got.getDouble(2) === 3.0)
    assert(got.getDouble(3) === 5.0)
    assert(got.getDouble(4) === 1.0)
    assert(got.getLong(5) === 100L)
  }

  test("noisy data matches the scalar normal-equation solve") {
    // deterministic pseudo-noise from the index (no RNG — reproducible)
    val data = (0 until 200).map { i =>
      val (x1, x2) = ((i % 13).toDouble, (i % 7).toDouble)
      ("g", x1, x2, 1.0 + 2 * x1 - 3 * x2 + (i % 5) - 2.0)
    }
    val got = Regression.olsTwoFeature(data.toDF("g", "x1", "x2", "y"),
        "g", col("x1"), col("x2"), col("y"))
      .collect().head
    // scalar solve with the same sums and the same Cramer expansion
    val (n, s1, s2, sy) = (data.size.toDouble, data.map(_._2).sum,
      data.map(_._3).sum, data.map(_._4).sum)
    val s11 = data.map(d => d._2 * d._2).sum
    val s12 = data.map(d => d._2 * d._3).sum
    val s22 = data.map(d => d._3 * d._3).sum
    val s1y = data.map(d => d._2 * d._4).sum
    val s2y = data.map(d => d._3 * d._4).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    assert(math.abs(got.getDouble(1) - b0) < 1e-6, s"beta0 ${got.getDouble(1)} vs $b0")
    assert(math.abs(got.getDouble(2) - b1) < 1e-6)
    assert(math.abs(got.getDouble(3) - b2) < 1e-6)
    assert(got.getDouble(4) > 0.5 && got.getDouble(4) < 1.0, "noise lowers r2 below 1")
  }

  test("registered lineitem fit: one row per flag, r2 in [0, 1], groups " +
      "partition the table") {
    val rows = Regression.mlLinReg(spark, sfDir).collect()
    assert(rows.length === 3)
    // this synthetic lineitem draws price independently of quantity, so
    // the fit's value here is the DIAGNOSTIC: r2 near zero, finite betas
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
    val total = graft.Tables.load(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(5)).sum === total)
  }

  test("ridge: equals the direct penalized normal-equation solve; " +
      "lambda = 0 reduces to OLS; slope norm shrinks") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val stats = Regression.suffStats(li, "l_returnflag",
      col("l_quantity").cast("long"),
      round(col("l_discount") * 100).cast("long"),
      round(col("l_extendedprice")).cast("long"))
    // brute-force: solve (X'X + lambda*diag(0,1,1)) b = X'y per group
    def solve3(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
      val a = m.map(_.clone); val b = v.clone
      for (i <- 0 until 3) {
        val p = (i until 3).maxBy(r => math.abs(a(r)(i)))
        val (ti, tb) = (a(i), b(i)); a(i) = a(p); a(p) = ti
        b(i) = b(p); b(p) = tb
        for (r <- 0 until 3 if r != i) {
          val f = a(r)(i) / a(i)(i)
          for (c <- 0 until 3) a(r)(c) -= f * a(i)(c)
          b(r) -= f * b(i)
        }
      }
      Array.tabulate(3)(i => b(i) / a(i)(i))
    }
    val lam = Regression.RidgeLambda
    val expect = stats.collect().map { r =>
      def d(c: String) = r.getDouble(r.fieldIndex(c))
      val m = Array(
        Array(d("n"), d("s1"), d("s2")),
        Array(d("s1"), d("s11") + lam, d("s12")),
        Array(d("s2"), d("s12"), d("s22") + lam))
      val bb = solve3(m, Array(d("sy"), d("s1y"), d("s2y")))
      r.getString(0) -> bb
    }.toMap
    val got = Regression.mlRidge(spark, sfDir).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val g = r.getString(0)
      assert(math.abs(r.getDouble(3) - expect(g)(0)) < 1e-4, s"$g b0")
      assert(math.abs(r.getDouble(4) - expect(g)(1)) < 1e-6, s"$g b1")
      assert(math.abs(r.getDouble(5) - expect(g)(2)) < 1e-6, s"$g b2")
      // penalized slope norm never exceeds the OLS slope norm
      val olsN = r.getDouble(1) * r.getDouble(1) +
        r.getDouble(2) * r.getDouble(2)
      val ridN = r.getDouble(4) * r.getDouble(4) +
        r.getDouble(5) * r.getDouble(5)
      assert(ridN <= olsN + 1e-12, s"$g slope norm must shrink")
    }
    // lambda = 0 through the same path IS the OLS fit
    val viaZero = Regression.fitFromStats(stats, "l_returnflag")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val ols = Regression.mlLinReg(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(viaZero == ols)
  }

  test("bagging: per-bag winner equals the single-frame stump argmin on " +
      "that bag's rows; the ensemble RMSE is shared and sane") {
    val got = Regression.mlBagging(spark, sfDir).collect()
    assert(got.length == Regression.BaggingBags)
    assert(got.map(_.getLong(0)).toSeq ==
      (0 until Regression.BaggingBags).map(_.toLong))
    // replica: filter the fact frame to one bag, run the shared
    // stumpSplits core, take the (sse, q) argmin — must equal the
    // bag-partitioned window path bit-for-bit
    val li = graft.Tables.load(spark, sfDir, "lineitem").select(
      col("l_quantity").cast("long").as("q"),
      floor(col("l_extendedprice") + 0.5).cast("long").as("v"),
      ((col("l_orderkey").cast("long") * 7 +
        col("l_linenumber").cast("long")) % Regression.BaggingBags).as("bag"))
    got.foreach { r =>
      val b = r.getLong(0)
      val best = Regression.stumpSplits(li.filter(col("bag") === b), "q", "v")
        .orderBy(col("sse"), col("q")).limit(1).collect().head
      assert(r.getLong(1) == best.getAs[Long]("q"), s"bag $b threshold")
      assert(r.getLong(2) == best.getAs[Long]("nl"), s"bag $b n_left")
      assert(r.getLong(3) == best.getAs[Long]("nr"), s"bag $b n_right")
      assert(r.getLong(4) ==
        math.floor(best.getAs[Double]("ml") * 10000).toLong, s"bag $b ml")
      assert(r.getLong(5) ==
        math.floor(best.getAs[Double]("mr") * 10000).toLong, s"bag $b mr")
      assert(r.getLong(6) ==
        math.floor(best.getAs[Double]("sse") * 100).toLong, s"bag $b sse")
    }
    // the ensemble RMSE column is one shared value, positive, and below
    // the target's raw scale (predicting beats emitting zero)
    val rmses = got.map(_.getLong(7)).distinct
    assert(rmses.length == 1 && rmses.head > 0)
    // bags are disjoint and exhaustive: per-bag counts sum to the corpus
    val total = li.count()
    assert(got.map(r => r.getLong(2) + r.getLong(3)).sum == total)
  }

  test("mlConformal: empirical coverage sits at the 90% guarantee and " +
      "q_hat is the k-th order statistic of the calibration scores") {
    val out = Regression.mlConformal(spark, sfDir)
      .orderBy("l_returnflag").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val cov = r.getDouble(5)
      assert(cov >= 0.82 && cov <= 0.97,
        s"coverage $cov escaped the finite-sample band")
      assert(r.getDouble(3) > 0.0)
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
    // driver-side re-derivation of q_hat: same folds/fit/scores, but the
    // rank comes from an in-memory sort, not the window machinery
    val base = graft.Tables.load(spark, sfDir, "lineitem").select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100).cast("long").as("x2"),
      round(col("l_extendedprice")).cast("long").as("y"),
      (Hashing.md5Long(concat_ws("-", col("l_orderkey"),
        col("l_linenumber"))) % 10).as("fold"))
    val fit = Regression.fitFromStats(
      Regression.suffStats(base.filter(col("fold") < 6), "l_returnflag",
        col("x1"), col("x2"), col("y")), "l_returnflag")
    val calScores = base.filter(col("fold") >= 6 && col("fold") < 8)
      .join(broadcast(fit), Seq("l_returnflag"))
      .withColumn("score", expr(Regression.conformalScoreSql))
      .select("l_returnflag", "score").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    out.foreach { r =>
      val flag = r.getString(0)
      val scores = calScores(flag)
      assert(r.getLong(1) == scores.length, s"$flag n_cal")
      val k = (9 * (scores.length + 1) + 9) / 10
      val want = BigDecimal(scores(k - 1))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == want, s"$flag q_hat ${r.getDouble(3)} != $want")
    }
  }

  test("stumpSplitsFromStats over composed per-fold stats is row-identical " +
      "to stumpSplits over the matching raw rows (the ml_cv rewrite)") {
    // deterministic fixture with folds, duplicate q values and ties
    val rows = (1 to 400).map { i =>
      (i.toLong % 7, (i.toLong * 13) % 101 + (i % 3), i.toLong % 3)
    }
    val df = rows.toDF("q", "v", "fold")
    val perQF = df.groupBy("q", "fold")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"))
    for (f <- 0L to 2L) {
      val direct = Regression.stumpSplits(
          df.filter(col("fold") =!= f), "q", "v")
        .orderBy("q").collect()
      val composed = Regression.stumpSplitsFromStats(
          perQF.filter(col("fold") =!= f)
            .groupBy("q").agg(sum("n").as("n"), sum("s").as("s"),
              sum("ss").as("ss")))
        .orderBy("q").collect()
      assert(direct.toSeq == composed.toSeq,
        s"fold $f: composed integer stats must reproduce the raw-row " +
          "split table bit-for-bit")
    }
  }

  test("target encoding: every category's code lies BETWEEN its raw mean " +
      "and the global prior, and shrinkage scales with 1/n") {
    val got = Regression.mlTargetEncode(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty) // category count scales with the test SF
    val prior = got.head._5
    assert(got.forall(_._5 == prior), "prior is global")
    got.foreach { case (cat, n, raw, code, _) =>
      val lo = math.min(raw, prior); val hi = math.max(raw, prior)
      assert(code >= lo - 1 && code <= hi + 1, // floor slack 1 unit
        s"cat $cat code $code outside [$lo, $hi]")
      // shrink fraction toward prior is m/(n+m) up to quantization
      val expected = (raw - prior).toDouble * n / (n + 50.0) + prior
      assert(math.abs(code - expected) <= 2, s"cat $cat shrink amount")
    }
  }
}
