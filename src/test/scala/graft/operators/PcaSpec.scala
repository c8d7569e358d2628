package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class PcaSpec extends SparkTestBase {

  test("pcaPowerTop1: projections are centered, their variance equals " +
      "the reported dominant eigenvalue, and the result is partition-" +
      "order independent") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = Pca.pcaPowerTop1(e, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val eig = out.head._3
    assert(eig > 0.0, "dominant covariance eigenvalue must be positive")
    val n = out.length
    val mean = out.map(_._2).sum / n
    assert(math.abs(mean) < 1e-3, s"projections must be centered, got $mean")
    // Var(pc1) = uᵀ C u = λ for the dominant eigenvector (Rayleigh);
    // tolerance covers the 1e-4 projection rounding and integer
    // quantization of the coordinates
    val varP = out.map(p => (p._2 - mean) * (p._2 - mean)).sum / n
    assert(math.abs(varP - eig) / eig < 0.02,
      s"projection variance $varP must match eigenvalue $eig")
    // partitioning must not change a single output value (exact integer
    // moments are order-independent; everything after is driver-local)
    val out7 = Pca.pcaPowerTop1(e.repartition(7), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(out7 == out.toSet, "repartitioning changed PCA output")
  }

  test("pcaPowerTop2: components are uncorrelated, eigenvalues ordered, " +
      "second variance matches the second eigenvalue") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val out = Pca.pcaPowerTop2(e, "vec_id", "embedding")
      .collect().map(r => (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val (e1, e2) = (out.head._3, out.head._4)
    assert(e1 >= e2 && e2 > 0.0, s"eigenvalues must order: $e1 >= $e2 > 0")
    val n = out.length
    val m1 = out.map(_._1).sum / n
    val m2 = out.map(_._2).sum / n
    val v2 = out.map(p => (p._2 - m2) * (p._2 - m2)).sum / n
    assert(math.abs(v2 - e2) / e2 < 0.05,
      s"pc2 variance $v2 must match eigenvalue2 $e2")
    // orthogonal directions of centered data → uncorrelated projections.
    // Tolerance is loose: 20 fixed power iterations leave residual
    // non-convergence when the deflated matrix's eigen-gap is small —
    // the projections stay deterministic and oracle-exact, just not
    // perfectly orthogonal (the trade documented on the operator).
    val cov = out.map(p => (p._1 - m1) * (p._2 - m2)).sum / n
    assert(math.abs(cov) / math.sqrt(e1 * e2) < 0.15,
      s"pc1/pc2 correlation too high: cov=$cov")
  }

  test("pcaPowerTop2 separates two planted directions by strength") {
    import spark.implicits._
    // strong axis0 signal, weaker independent axis1 signal
    val rows = (0 until 60).map { i =>
      val a = (if (i % 2 == 0) 1 else -1) * (0.40 + 0.002 * (i % 7))
      val b = (if (i % 3 == 0) 1 else -1) * (0.15 + 0.001 * (i % 5))
      val v = Array.fill(8)(0.0f)
      v(0) = a.toFloat; v(1) = b.toFloat
      (i.toLong, v.toSeq)
    }
    val got = Pca.pcaPowerTop2(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dims = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // projections are CENTERED — compare against mean-removed coordinates
    // (the axis1 sign pattern is deliberately unbalanced, so its mean is
    // nonzero)
    val mean0 = rows.map(_._2(0).toDouble).sum / rows.size
    val mean1 = rows.map(_._2(1).toDouble).sum / rows.size
    rows.foreach { case (id, v) =>
      val (p1, p2) = got(id)
      assert(math.abs(math.abs(p1) - math.abs(v(0) - mean0)) < 0.03,
        s"vec $id: |pc1|=$p1 vs centered axis0=${v(0) - mean0}")
      assert(math.abs(math.abs(p2) - math.abs(v(1) - mean1)) < 0.03,
        s"vec $id: |pc2|=$p2 vs centered axis1=${v(1) - mean1}")
    }
  }

  test("pcaPowerTopK: k=3 prefixes the top-2 surface exactly and " +
      "eigenvalues stay ordered") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val v = Array.fill(8)(0.0f)
      v(0) = (math.sin(i * 0.7) * 0.5).toFloat
      v(1) = (math.cos(i * 1.3) * 0.3).toFloat
      v(2) = (math.sin(i * 2.1) * 0.1).toFloat
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val top2 = Pca.pcaPowerTop2(df, "vec_id", "embedding", dims = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val top3 = Pca.pcaPowerTopK(df, "vec_id", "embedding", k = 3, dims = 8)
    assert(top3.columns.toSeq === Seq("vec_id", "pc1", "pc2", "pc3",
      "eigenvalue", "eigenvalue2", "eigenvalue3"))
    val t3 = top3.collect().map(r => r.getLong(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toMap
    rows.foreach { case (id, _) =>
      val (p1, p2, e1, e2) = top2(id)
      val (q1, q2, f1, f2, f3) = t3(id)
      assert(p1 == q1 && p2 == q2,
        s"vec $id: deflation chain must prefix exactly")
      assert(e1 == f1 && e2 == f2)
      assert(f1 >= f2 && f2 >= f3, "eigenvalues must be ordered")
    }
  }

  test("pcaPowerTop1 recovers a planted dominant direction") {
    import spark.implicits._
    // 40 vectors along ±axis0 with small axis1 noise: the dominant
    // component must be ~axis0, so |pc1| ~ the axis0 coordinate
    val rows = (0 until 40).map { i =>
      val a = if (i % 2 == 0) 0.4 + 0.001 * i else -(0.4 + 0.001 * i)
      val v = Array.fill(8)(0.0f)
      v(0) = a.toFloat
      v(1) = (0.01 * (i % 5)).toFloat
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Pca.pcaPowerTop1(df, "vec_id", "embedding", dims = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, v) =>
      assert(math.abs(math.abs(got(id)) - math.abs(v.head)) < 0.02,
        s"vec $id: |pc1|=${got(id)} vs axis0=${v.head}")
    }
  }
}
