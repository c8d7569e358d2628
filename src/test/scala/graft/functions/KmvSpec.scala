package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** KMV bottom-k overlap estimator: exact in the unsaturated regime,
  * error-bounded in the saturated regime the operator exists for.
  */
class KmvSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val a = docs.filter(col("source") =!= "src0")
  private lazy val b = docs.filter(col("source") === "src0")

  private def exact(n: Int): (Long, Long, Long, Long) = {
    val ga = TextAnalysis.gramHashes(a, "text", n).collect().map(_.getLong(0)).toSet
    val gb = TextAnalysis.gramHashes(b, "text", n).collect().map(_.getLong(0)).toSet
    val i = (ga & gb).size.toLong
    (ga.size.toLong, gb.size.toLong, ga.size + gb.size - i, i)
  }

  test("unsaturated sketch returns the exact overlap (bigram domain < k)") {
    val (na, nb, nu, ni) = exact(2)
    assert(nu < 4096, "fixture must stay unsaturated for this test")
    val r = TextAnalysis.kmvOverlap(a, b, "text", k = 4096, n = 2).head()
    assert(r.getLong(0) === na)
    assert(r.getLong(1) === nb)
    assert(r.getLong(2) === nu)
    assert(r.getLong(3) === ni)
    assert(math.abs(r.getDouble(4) - ni.toDouble / nu) < 1e-6)
  }

  test("saturated sketch estimates land within the 1/sqrt(k) error class") {
    val (na, nb, nu, ni) = exact(5)
    val jTrue = ni.toDouble / nu
    for (k <- Seq(256, 1024)) {
      assert(nu > k, s"5-gram domain must saturate k=$k")
      val r = TextAnalysis.kmvOverlap(a, b, "text", k = k, n = 5).head()
      val tol = 5.0 / math.sqrt(k) // 5σ of the KMV relative-error class
      assert(math.abs(r.getLong(0) - na) <= tol * na,
        s"k=$k n_a est ${r.getLong(0)} vs $na")
      assert(math.abs(r.getLong(1) - nb) <= tol * nb.max(k),
        s"k=$k n_b est ${r.getLong(1)} vs $nb")
      assert(math.abs(r.getLong(2) - nu) <= tol * nu,
        s"k=$k n_union est ${r.getLong(2)} vs $nu")
      // Jaccard: binomial σ = sqrt(J(1−J)/k); 5σ + the true-J offset
      val jTol = 5.0 * math.sqrt(jTrue * (1 - jTrue) / k) + 1.0 / k
      assert(math.abs(r.getDouble(4) - jTrue) <= jTol,
        s"k=$k jaccard est ${r.getDouble(4)} vs $jTrue (tol $jTol)")
    }
  }

  test("registered tolerance flags are TRUE (the oracle-pinned contract)") {
    val r = graft.operators.LlmQueries.textOverlapKmv(spark, sfDir).head()
    assert(r.getBoolean(5) && r.getBoolean(6))
  }
}
