package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch — a mergeable, bounded-memory
  * frequent-items summary (SURVEY §2.D sketch family, beside HLL and
  * approx-percentile).
  *
  * Why a sketch and not `groupBy(item).count`: at 100 TB the distinct
  * n-gram domain is trillions of keys — an exact count shuffles the whole
  * domain and the reducer-side hash map is unbounded. Misra–Gries keeps a
  * HARD cap of `k` counters per partial buffer, so the aggregation state
  * is constant-size no matter the corpus: one map-side combine over the
  * token stream, then a shuffle of ≤k-entry maps (the same partial/final
  * lifecycle as a built-in sum — Spark's ObjectHashAggregate keeps the
  * buffer as a live object between rows, so per-row cost is one hash
  * probe, amortized O(1) decrements).
  *
  * Guarantees (the classic bounds, preserved under merge per Agarwal et
  * al., "Mergeable Summaries", PODS'12):
  *   - undercount only: est(x) ≤ true(x);
  *   - bounded error:  true(x) − est(x) ≤ N/(k+1) for EVERY item, where
  *     N = stream length;
  *   - total recall above the bar: any x with true(x) > N/(k+1) is
  *     guaranteed retained.
  * Corollary: with k ≥ |distinct|, no decrement ever fires and the
  * sketch IS the exact count map — that configuration is oracle-checkable
  * against an exact SQL aggregate, while the small-k error bounds are
  * property-tested (the HLL/approx-percentile precedent).
  *
  * reduce() is textbook MG: new item into spare capacity, else decrement
  * all k counters by 1 (dropping zeros frees ≥1 slot). merge() sums the
  * two maps, then subtracts the (k+1)-th largest count from everything
  * and keeps the strictly-positive survivors — the offset trick that
  * keeps the merged buffer inside both bounds.
  */
class MGSketch(val k: Int) extends Serializable {
  val counts = new java.util.HashMap[String, Long]()

  def add(item: String): Unit = {
    if (item == null) return
    val cur = counts.getOrDefault(item, 0L)
    if (cur > 0L) counts.put(item, cur + 1L)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      // full + unseen: decrement every counter, evict zeros; the incoming
      // item's weight is consumed by the same decrement.
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeWith(o: MGSketch): MGSketch = {
    o.counts.forEach { (item, c) =>
      counts.put(item, counts.getOrDefault(item, 0L) + c)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest value; > it survives, ≤ it drops.
      val vals = counts.values().asScala.toArray.sorted(Ordering[Long].reverse)
      val cut = vals(k)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    this
  }

  def toMap: Map[String, Long] = counts.asScala.toMap
}

case class HeavyHittersAgg(k: Int)
    extends Aggregator[String, MGSketch, Map[String, Long]] {
  override def zero: MGSketch = new MGSketch(k)
  override def reduce(b: MGSketch, v: String): MGSketch = { b.add(v); b }
  override def merge(a: MGSketch, b: MGSketch): MGSketch = a.mergeWith(b)
  override def finish(r: MGSketch): Map[String, Long] = r.toMap
  // live-object buffer between rows; kryo only at the partial/final shuffle
  override def bufferEncoder: Encoder[MGSketch] = Encoders.kryo[MGSketch]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
