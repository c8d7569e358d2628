package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PageRank invariants: fixed-point on the symmetric 2-cycle, mass
  * conservation when every node has out-edges, the teleport floor, and
  * the exact recurrence cross-checked against a driver-side scalar
  * re-implementation on an asymmetric graph with a dangling node.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("symmetric 2-cycle is a fixed point at 0.5/0.5") {
    val r = ranksOf(Seq((1L, 2L, 1.0), (2L, 1L, 1.0)), iters = 7)
    assert(r == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("nation trade graph: mass conserved, teleport floor holds") {
    val pr = Graph.pageRank(Graph.nationTradeEdges(spark, sfDir), iters = 5)
      .collect().map(_.getDouble(1))
    assert(pr.length == 25)
    // every customer nation ships somewhere, so no dangling mass: ranks
    // sum to 1 up to the 25 per-node 1e-6 roundings per iteration
    assert(math.abs(pr.sum - 1.0) < 25 * 5e-6, s"rank mass ${pr.sum}")
    assert(pr.forall(_ >= 0.15 / 25 - 1e-9), "teleport floor violated")
  }

  test("asymmetric graph with dangling node matches the scalar recurrence") {
    // 1 -> 2 (w 3), 1 -> 3 (w 1), 2 -> 3 (w 1); 3 dangles (mass leaks)
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    val got = ranksOf(edges, iters = 4)
    def rnd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = Map(1L -> rnd(1.0 / 3), 2L -> rnd(1.0 / 3), 3L -> rnd(1.0 / 3))
    for (_ <- 1 to 4) {
      val t = 0.15 / 3
      r = Map(
        1L -> rnd(t),
        2L -> rnd(t + 0.85 * (r(1L) * 0.75)),
        3L -> rnd(t + 0.85 * (r(1L) * 0.25 + r(2L) * 1.0)))
    }
    assert(got == r, s"engine $got vs scalar $r")
    assert(got.values.sum < 1.0, "dangling node must leak mass")
  }
}
