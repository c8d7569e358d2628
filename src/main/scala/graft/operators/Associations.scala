package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket association mining — Apriori (Agrawal & Srikant 1994)
  * re-expressed as three declarative stages so Catalyst plans every one:
  *
  *   1. basket–item DISTINCT collapse — the only fact-sized stage, one
  *      map-side-combined aggregate (a basket buying an item five times
  *      supports the item once);
  *   2. frequent-1-itemset prune — item supports against the minimum
  *      support BEFORE any pair materializes (the Apriori property:
  *      a pair can only be frequent if both members are), carried as a
  *      semi-join back onto the basket–item table;
  *   3. pair generation by basket self-join with `item1 < item2` — the
  *      fan-out is per-basket C(k,2), bounded by basket SIZE (k ≤ a few
  *      dozen in any retail-shaped corpus), never |items|² and never
  *      |baskets|²; the shuffle key is the basket id.
  *
  * Metrics are integer-exact and portable: support counts are longs;
  * confidence is `pair·1e6 div cnt(antecedent)` ppm; lift composes the
  * two integer divisions (`conf·n_baskets div cnt(consequent)`) instead
  * of the textbook single fraction so no intermediate exceeds
  * ~1e6·|baskets| — documented exactness trade (ulp-level) for overflow
  * safety at 100 TB basket counts. Corpus-size stats ride a broadcast
  * 1-row frame (the house pattern), never a driver collect.
  */
object Associations {

  /** Frequent item pairs + association rules over a (basket, item)
    * relation. `minSupPpm` is the minimum support as parts-per-million
    * of the basket count (relative, so the same query is meaningful at
    * any scale factor).
    */
  def apriori(basketItems: DataFrame, minSupPpm: Long, topK: Int): DataFrame = {
    val bi = basketItems.select(col("basket"), col("item")).distinct()
      .localCheckpoint(true) // feeds supports AND both pair-join sides
    val nb = bi.agg(countDistinct("basket").as("nb"))
    val f1 = bi.groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nb))
      .filter(col("cnt") * lit(1000000L) >= lit(minSupPpm) * col("nb"))
    // frequent-item prune BEFORE pair generation (supports travel along)
    val bif = bi.join(f1, "item")
      .select(col("basket"), col("item"), col("cnt"), col("nb"))
    val pairs = bif.as("x")
      .join(bif.select(col("basket"), col("item").as("item2"),
        col("cnt").as("cnt2")).as("y"), "basket")
      .filter(col("item") < col("item2"))
      .groupBy(col("item").as("b1"), col("item2").as("b2"),
        col("cnt").as("cnt1"), col("cnt2"), col("nb"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") * lit(1000000L) >= lit(minSupPpm) * col("nb"))
    pairs.select(col("b1"), col("b2"), col("pair_cnt"), col("cnt1"),
        col("cnt2"),
        expr("CAST(pair_cnt * 1000000L DIV cnt1 AS BIGINT)").as("conf_ppm"),
        expr("CAST((pair_cnt * 1000000L DIV cnt1) * nb DIV cnt2 AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("pair_cnt").desc, col("b1"), col("b2"))
      .limit(topK)
  }

  /** Registered query: brand co-purchase rules — baskets are orders,
    * items the part brands on their lines (the reference's export-query
    * tables joined the way a recommender feature pipeline would).
    */
  def marketBasket(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val p = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
    val bi = li.join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").cast("long").as("basket"),
        col("p_brand").as("item"))
    apriori(bi, minSupPpm = 20000L, topK = 20)
  }
}
