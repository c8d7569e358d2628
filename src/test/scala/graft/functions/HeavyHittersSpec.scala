package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** Misra–Gries sketch: exact in the over-capacity regime, and the three
  * classic bounds in the lossy regime — under Spark's real partial/final
  * aggregation (map-side combine across partitions exercises merge()).
  */
class HeavyHittersSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet")

  test("over-capacity sketch equals the exact bigram counts") {
    val sketch = TextAnalysis.heavyHitters(docs, "text", k = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size < 4096, "fixture must stay in the exact regime")
    assert(sketch === exact)
  }

  test("lossy sketch (k=32) keeps the MG bounds under distributed merge") {
    val exact = TextAnalysis.heavyHitters(docs, "text", k = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 32
    val bar = n.toDouble / (k + 1)
    // repartition(7) forces ≥7 partial sketches through merge()
    val grams = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("gram"))
      .repartition(7)
    val hh = udaf(HeavyHittersAgg(k))
    val sketch = grams.agg(hh(col("gram")).as("sk"))
      .select(explode(col("sk"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= k, "capacity is a hard cap")
    // undercount only, and by at most N/(k+1)
    sketch.foreach { case (g, est) =>
      val t = exact(g)
      assert(est <= t, s"$g overcounted: $est > $t")
      assert(t - est <= bar, s"$g error ${t - est} exceeds N/(k+1)=$bar")
    }
    // every true heavy hitter above the bar is retained
    exact.filter(_._2 > bar).keys.foreach { g =>
      assert(sketch.contains(g), s"heavy hitter $g (count ${exact(g)}) dropped")
    }
  }

  test("unit merge: offset trick preserves bounds on adversarial maps") {
    val a = new MGSketch(3)
    Seq("x", "x", "x", "y", "y", "z").foreach(a.add)
    val b = new MGSketch(3)
    Seq("p", "p", "q", "x").foreach(b.add)
    val m = a.mergeWith(b).toMap
    assert(m.size <= 3)
    val exact = Map("x" -> 4L, "y" -> 2L, "z" -> 1L, "p" -> 2L, "q" -> 1L)
    m.foreach { case (g, est) => assert(est <= exact(g)) }
    // N=10, k=3 → bound 2.5; x(4) must survive any merge order
    assert(m.contains("x"))
    exact.foreach { case (g, t) => assert(t - m.getOrElse(g, 0L) <= 2.5) }
  }
}
