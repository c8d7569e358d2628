package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.TextAnalysis

/** Count–Min sketch probe: the hard overcount-only guarantee in the
  * lossy (narrow-width) regime, and exactness at the registered width.
  * Together with HeavyHittersSpec this pins both sketch error
  * directions: MG never overcounts, CMS never undercounts.
  */
class CmsSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private lazy val exact: Map[String, Long] = docs
    .withColumn("tk", split(col("text"), " "))
    .filter(size(col("tk")) >= 2)
    .select(explode(expr(
      "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("gram"))
    .groupBy("gram").agg(count(lit(1)).as("c"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("registered width: every probed estimate equals the exact count") {
    val got = TextAnalysis.cmsFreqProbe(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (g, est) => assert(est === exact(g), s"gram $g") }
  }

  test("narrow width (eps=0.05): overcount only, within eps*N of truth") {
    // width = ceil(2/0.05) = 40 counters per row vs ~900 distinct grams:
    // collisions are constant, so this exercises the lossy path hard
    val n = exact.values.sum
    val got = TextAnalysis.cmsFreqProbe(docs, "doc_id", "text",
      eps = 0.05, confidence = 0.99)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    var overcounted = 0
    got.foreach { case (g, est) =>
      val t = exact(g)
      assert(est >= t, s"CMS must never undercount: $g est=$est true=$t")
      if (est > t) overcounted += 1
      assert(est - t <= (0.05 * n).ceil.toLong,
        s"$g overcount ${est - t} exceeds eps*N=${0.05 * n}")
    }
    assert(overcounted > 0,
      "the narrow sketch must actually collide, or this test proves nothing")
  }
}
