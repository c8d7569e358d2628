package graft.operators

import graft.SparkTestBase

/** Apriori invariants: exact supports/confidence/lift on a hand corpus,
  * the frequent-1 prune (an infrequent item can never reach a pair),
  * multiplicity collapse, and the b1 < b2 canonical pair form.
  */
class AssociationsSpec extends SparkTestBase {
  import spark.implicits._

  // baskets: 1{a,b,c} 2{a,b} 3{a,c} 4{a} 5{b,c,d}; item d support 1/5
  private val corpus = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "a"),
    (5L, "b"), (5L, "c"), (5L, "d"))

  test("hand corpus: exact supports, confidence, and lift") {
    val got = Associations.apriori(corpus.toDF("basket", "item"),
        minSupPpm = 400000L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // d (support 200000 ppm) pruned before pair generation
    assert(!got.exists(t => t._1 == "d" || t._2 == "d"))
    // (a,b): pair 2, cnt(a)=4, cnt(b)=3; conf = 2e6 div 4 = 500000;
    // lift = 500000 * 5 div 3 = 833333
    assert(got.contains(("a", "b", 2L, 4L, 3L, 500000L, 833333L)), got.toSeq)
    // (b,c): pair 2, conf = 2e6 div 3 = 666666; lift = 666666*5 div 3
    assert(got.contains(("b", "c", 2L, 3L, 3L, 666666L, 1111110L)), got.toSeq)
    assert(got.length == 3) // (a,b) (a,c) (b,c)
    got.foreach { t => assert(t._1 < t._2, s"canonical order: $t") }
  }

  test("duplicate (basket, item) rows collapse before support counting") {
    val dup = corpus ++ Seq((1L, "a"), (1L, "a"), (4L, "a"))
    val base = Associations.apriori(corpus.toDF("basket", "item"), 400000L, 10)
      .collect().map(_.toSeq).toSet
    val got = Associations.apriori(dup.toDF("basket", "item"), 400000L, 10)
      .collect().map(_.toSeq).toSet
    assert(got == base)
  }

  test("ml_apriori query: rows within support floor, ordered by pair count") {
    val rows = Associations.marketBasket(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.sameElements(cnts.sortBy(-_)), "pair_cnt descending")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L) // conf is a ppm
    }
  }
}
