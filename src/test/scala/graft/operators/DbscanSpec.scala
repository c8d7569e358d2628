package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Density-clustering laws: the grid-cell pair generator is EXACTLY the
  * brute-force eps-neighbor relation on random point sets (including
  * cross-cell neighbors the fixture's column geometry never exercises),
  * and the full operator reproduces a reference DBSCAN's
  * core/border/noise partition and clustering.
  */
class DbscanSpec extends SparkTestBase {

  private def brutePairs(pts: Seq[(Long, Long, Long)],
                         eps: Long): Set[(Long, Long)] =
    (for {
      (ak, ax, ay) <- pts
      (bk, bx, by) <- pts
      if (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= eps * eps
    } yield (ak, bk)).toSet

  test("epsPairs equals the brute-force eps-neighbor relation on random " +
      "points (cross-cell adjacency included)") {
    import spark.implicits._
    val rnd = new Random(11L)
    for (trial <- 1 to 4) {
      val eps = Seq(7L, 25L, 60L)(trial % 3)
      val pts = (1L to 400L).map(k =>
        (k, rnd.nextInt(500).toLong - 250L, rnd.nextInt(500).toLong - 250L))
      val got = Metrics.epsPairs(
          pts.toDF("k", "x", "y"), eps)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brutePairs(pts, eps), s"trial $trial eps=$eps")
    }
  }

  test("ml_dbscan reproduces a reference DBSCAN: same cores, same " +
      "cluster partition (up to the min-id labeling), border minimum " +
      "attachment, same noise") {
    val got = Metrics.mlDbscan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSeq
    // reference: brute-force DBSCAN over the same extracted points
    val pts = graft.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") <= 5000)
      .groupBy(col("l_orderkey").as("k"))
      .agg((count(lit(1)) / 4.0 - 0.7).as("x1"),
        (sum("l_extendedprice") / count(lit(1)) / 50000.0 - 0.6).as("x2"))
      .select(col("k"),
        expr("CAST(floor(x1 * 1000 + 0.5D) AS BIGINT)").as("x"),
        expr("CAST(floor(x2 * 1000 + 0.5D) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val eps = 40L
    val byK = pts.map(p => p._1 -> p).toMap
    val neigh = pts.map { case (k, x, y) =>
      k -> pts.filter { case (_, bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by) <= eps * eps
      }.map(_._1)
    }.toMap
    val core = pts.map(_._1).filter(k => neigh(k).size >= 5).toSet
    // union-find over core-core adjacency
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    for (a <- core; b <- neigh(a) if core(b)) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val cluster = core.map(k => k -> find(k)).toMap
    val expect = pts.map { case (k, _, _) =>
      if (core(k)) (k, "core", cluster(k), neigh(k).size.toLong)
      else {
        val coreN = neigh(k).filter(core)
        if (coreN.nonEmpty)
          (k, "border", coreN.map(cluster).min, neigh(k).size.toLong)
        else (k, "noise", -1L, neigh(k).size.toLong)
      }
    }.sortBy(_._1)
    assert(got.size == expect.size)
    got.zip(expect).foreach { case (g, e) =>
      assert(g == e, s"point ${e._1}: got $g expect $e (pt=${byK(e._1)})")
    }
  }
}
