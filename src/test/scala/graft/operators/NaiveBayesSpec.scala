package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** NB invariants: a separable corpus classifies perfectly; one posterior
  * cross-checked against the hand-computed Laplace arithmetic including
  * the unseen-token fallback.
  */
class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  test("separable two-class corpus: perfect held-out accuracy, posterior " +
      "matches the hand computation") {
    val train = Seq(
      (1L, "buy cheap pills now", "spam"),
      (2L, "cheap pills buy", "spam"),
      (3L, "meeting agenda notes", "ham"),
      (4L, "notes from the meeting", "ham")).toDF("doc_id", "text", "lang")
    val probes = Seq(
      (10L, "cheap pills", "spam"),
      (11L, "meeting notes", "ham"),
      (12L, "buy unknownword", "spam")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.trainScore(train, probes, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got(10L)._1 === "spam" && got(10L)._3)
    assert(got(11L)._1 === "ham" && got(11L)._3)
    assert(got(12L)._1 === "spam", "unseen token must not flip a clear case")
    // hand computation for probe 10 under class spam:
    // spam tokens: buy(2) cheap(2) pills(2) now(1) -> ctot = 7
    // global vocab V = distinct train tokens = 9
    // ll(cheap|spam) = ln(3/16), ll(pills|spam) = ln(3/16)
    // prior(spam) = ln(2/4)
    val want = math.log(3.0 / 16) + math.log(3.0 / 16) + math.log(0.5)
    val r4 = BigDecimal(want).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._2 === r4, s"posterior ${got(10L)._2} vs $r4")
  }

  test("registered langid query: rows cover the probe slice, accuracy is " +
      "bounded and consistent") {
    val rows = NaiveBayes.mlNaiveBayes(spark, sfDir).collect()
    val probeCount = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 11 === 0).count()
    assert(rows.length.toLong === probeCount, "one row per probe doc")
    rows.foreach { r =>
      assert(r.getBoolean(4) === (r.getString(1) == r.getString(2))) }
  }
}
