package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Laws for the evaluation-metric and centrality operators: AUC against
  * the definitional quadratic pair count (the statistic the rank
  * algebra must reproduce), and harmonic centrality against per-source
  * Dijkstra-free BFS recomputation on the collected graph.
  */
class MetricsSpec extends SparkTestBase {

  test("aucByGroup equals the definitional pair-count AUC (ties at 1/2)") {
    import spark.implicits._
    // hand-built: heavy ties, a group with perfect separation, and a
    // group with pure noise
    val rows = Seq(
      // g, score, y
      ("m", 1L, 0L), ("m", 1L, 0L), ("m", 2L, 0L), ("m", 2L, 1L),
      ("m", 3L, 1L), ("m", 3L, 0L), ("m", 3L, 1L), ("m", 4L, 1L),
      ("p", 1L, 0L), ("p", 2L, 0L), ("p", 3L, 1L), ("p", 4L, 1L),
      ("n", 5L, 1L), ("n", 5L, 0L), ("n", 5L, 1L), ("n", 5L, 0L))
    val df = rows.toDF("g", "sc", "y")
    val got = Metrics.aucByGroup(df, "g", "sc", "y").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def bruteAuc(g: String): Double = {
      val grp = rows.filter(_._1 == g)
      val pos = grp.filter(_._3 == 1L).map(_._2)
      val neg = grp.filter(_._3 == 0L).map(_._2)
      val s = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      s / (pos.size * neg.size)
    }
    for (g <- Seq("m", "p", "n")) {
      val (p, n, auc) = got(g)
      assert(p == rows.count(r => r._1 == g && r._3 == 1L).toLong)
      assert(n == rows.count(r => r._1 == g && r._3 == 0L).toLong)
      assert(math.abs(auc - bruteAuc(g)) < 1e-9, s"group $g")
    }
    assert(got("p")._3 == 1.0)  // perfectly separated
    assert(got("n")._3 == 0.5)  // all tied = coin flip
  }

  test("ml_auc lands strictly inside (0.5, 1) for every group") {
    val out = Metrics.mlAuc(spark, sfDir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val auc = r.getDouble(3)
      assert(auc > 0.55 && auc < 0.99, s"${r.getString(0)}: $auc")
      assert(math.abs(r.getDouble(4) - (2 * auc - 1)) < 1e-5) // gini
    }
  }

  test("ml_prf: confusion bookkeeping closes — tp+fn = class support, " +
      "tp+fp = predictions, F1 is the harmonic mean, totals = probes") {
    val scored = Metrics.mlKnn(spark, sfDir).collect()
      .map(r => (r.getLong(3), r.getLong(2)))  // (y_true, yhat)
    val got = Metrics.mlPrf(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    for (c <- Seq(0L, 1L)) {
      val (tp, fp, fn, p, rec, f1) = got(c)
      assert(tp == scored.count(x => x._1 == c && x._2 == c))
      assert(fp == scored.count(x => x._1 != c && x._2 == c))
      assert(fn == scored.count(x => x._1 == c && x._2 != c))
      assert(math.abs(p - tp.toDouble / (tp + fp)) < 1e-6)
      assert(math.abs(rec - tp.toDouble / (tp + fn)) < 1e-6)
      assert(math.abs(f1 - 2.0 * tp / (2 * tp + fp + fn)) < 1e-6)
    }
    // every probe is exactly one cell of the matrix
    assert(got.values.map(v => v._1 + v._3).sum == scored.length.toLong)
  }

  test("graph_closeness matches per-source BFS recomputation") {
    val e = Graph.nationTradeEdges(spark, sfDir).select("src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    def bfsFrom(s: Long): Map[Long, Int] = {
      var dist = Map(s -> 0)
      var frontier = Set(s)
      for (d <- 1 to 4) {
        frontier = e.filter(p => frontier(p._1)).map(_._2)
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> d)
      }
      dist
    }
    val all = nodes.toSeq.flatMap(s => bfsFrom(s).map { case (v, d) => (s, v, d) })
    val expect = all.filter(_._3 > 0).groupBy(_._2).map { case (v, rs) =>
      v -> (rs.size.toLong, rs.map(r => 12 / r._3).sum.toLong)
    }
    val got = Graph.graphCloseness(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    // output is ranked most-central first
    val h12s = Graph.graphCloseness(spark, sfDir).collect().map(_.getLong(3))
    assert(h12s.sameElements(h12s.sortBy(-_)))
  }

  test("prAucByGroup: hand case equals the exact AP; a perfect ranker " +
      "scores 1; a label-free score scores the prevalence baseline") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // scores 4>3>2>1 with labels 1,0,1,0: AP = 1/2*(1/1) + 1/2*(2/3)
    val hand = Seq(("g", 4L, 1L), ("g", 3L, 0L), ("g", 2L, 1L),
      ("g", 1L, 0L)).toDF("g", "sc", "y")
    val got = Metrics.prAucByGroup(hand, "g", "sc", "y").collect().head
    val exp = BigDecimal(0.5 * 1.0 + 0.5 * (2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(1) == 2 && got.getLong(2) == 2)
    assert(got.getDouble(3) == exp, s"${got.getDouble(3)} vs $exp")
    // perfect ranker: all positives above all negatives -> AP = 1
    val perfect = Seq(("g", 9L, 1L), ("g", 8L, 1L), ("g", 2L, 0L),
      ("g", 1L, 0L)).toDF("g", "sc", "y")
    assert(Metrics.prAucByGroup(perfect, "g", "sc", "y")
      .collect().head.getDouble(3) == 1.0)
    // one score for everything (no ranking signal): AP = prevalence
    val flat = Seq(("g", 5L, 1L), ("g", 5L, 0L), ("g", 5L, 0L),
      ("g", 5L, 1L)).toDF("g", "sc", "y")
    val fr = Metrics.prAucByGroup(flat, "g", "sc", "y").collect().head
    assert(fr.getDouble(3) == fr.getDouble(4), "AP == prevalence baseline")
    // registered fixture: AP strictly above prevalence (the planted
    // signal ranks), strictly below 1 (the noise hurts)
    Metrics.mlPrAuc(spark, sfDir).collect().foreach { r =>
      assert(r.getDouble(3) > r.getDouble(4) && r.getDouble(3) < 1.0,
        r.toString)
    }
  }

  test("mlMcc: cells sum to the kNN probe count and cross-check mlPrf; " +
      "MCC/kappa sit in (-1,1]; balanced accuracy matches the cells") {
    val r = Metrics.mlMcc(spark, sfDir).collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    val probes = Metrics.mlKnn(spark, sfDir).count()
    assert(tp + fp + fn + tn == probes, "cells partition the probe set")
    // mlPrf class-1 row carries the SAME tp/fp/fn
    val prf1 = Metrics.mlPrf(spark, sfDir).collect()
      .find(_.getLong(0) == 1L).get
    assert((prf1.getLong(1), prf1.getLong(2), prf1.getLong(3)) ==
      ((tp, fp, fn)))
    val (mcc, kappa, bacc) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(mcc > -1 && mcc <= 1 && kappa > -1 && kappa <= 1)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(bacc == r6((tp.toDouble / (tp + fn) + tn.toDouble / (tn + fp))
      / 2.0))
    // replica of the MCC formula over the same cells
    val expMcc = r6((tp.toDouble * tn - fp.toDouble * fn) /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn)))
    assert(mcc == expMcc, s"$mcc vs $expMcc")
  }

  test("roc points: monotone staircase with (1,1) at the lowest " +
      "threshold; abtest statistic replicates the scalar formula") {
    val roc = Metrics.mlRocPoints(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(roc.nonEmpty)
    roc.groupBy(_._1).foreach { case (g, pts) =>
      val sorted = pts.sortBy(_._2) // ascending threshold
      // the lowest threshold predicts everything positive
      assert(sorted.head._5 == 1.0 && sorted.head._6 == 1.0, s"group $g")
      // tp/fp (and so tpr/fpr) are non-increasing in the threshold
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._3 >= pair(1)._3 && pair(0)._4 >= pair(1)._4,
            s"monotone in $g")
      }
    }
    val ab = Metrics.mlAbTest(spark, sfDir).collect().head
    val (na, nb, ka, kb) = (ab.getLong(0), ab.getLong(1), ab.getLong(2),
      ab.getLong(3))
    assert(na > 0 && nb > 0 && ka > 0 && kb > 0)
    val a = (ka * nb - kb * na).toDouble
    val exp = BigDecimal(a * (ka * nb - kb * na) * (na + nb) /
        (na * nb * (ka + kb)).toDouble / ((na + nb) - (ka + kb)).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ab.getDouble(4) == exp)
    assert(ab.getBoolean(5) == (ab.getDouble(4) > 3.841459))
  }

  test("lift: hand deciles pin lift and cumulative gains; a group " +
      "smaller than the tile count fills tiles one row each") {
    import spark.implicits._
    // group A: 20 rows, scores 20..1, positives at ranks 1,2,3,4,10
    val a = (1 to 20).map(i =>
      ("A", 21L - i, f"k$i%02d", if (Set(1, 2, 3, 4, 10)(i)) 1L else 0L))
    // group B: 5 rows, positive only at the top rank
    val b = (1 to 5).map(i =>
      ("B", 6L - i, f"k$i%02d", if (i == 1) 1L else 0L))
    val planted = (a ++ b).toDF("g", "sc", "k", "y")
    val got = Metrics.liftStats(planted).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // A: base rate 5/20; deciles of 2 rows each
    assert(got(("A", 1)) == ((2L, 2L, 4.0, 0.4)))
    assert(got(("A", 2)) == ((2L, 2L, 4.0, 0.8)))
    assert(got(("A", 3)) == ((2L, 0L, 0.0, 0.8)))
    assert(got(("A", 5)) == ((2L, 1L, 2.0, 1.0)))
    assert(got(("A", 10)) == ((2L, 0L, 0.0, 1.0)))
    // B: 5 rows over 10 tiles -> tiles 1..5 get one row each
    assert(got(("B", 1)) == ((1L, 1L, 5.0, 1.0)))
    assert(got(("B", 5)) == ((1L, 0L, 0.0, 1.0)))
    assert(!got.contains(("B", 6)), "empty tiles emit no row")
  }
}
