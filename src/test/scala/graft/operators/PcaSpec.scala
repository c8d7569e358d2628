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
