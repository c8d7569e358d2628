package graft.operators

import graft.SparkTestBase

/** Isotonic-calibration laws: the relational min-max characterization
  * equals the classic sequential pool-adjacent-violators fit (weighted),
  * and the output is monotone non-decreasing per group.
  */
class IsotonicSpec extends SparkTestBase {

  /** Reference weighted PAV over (n, p) bins in score order: pool any
    * adjacent violator blocks until rates are non-decreasing.
    */
  private def pav(bins: Seq[(Long, Long)]): Seq[Double] = {
    case class Blk(var n: Long, var p: Long, var cnt: Int) {
      def r: Double = p.toDouble / n.toDouble
    }
    val st = scala.collection.mutable.ArrayBuffer.empty[Blk]
    bins.foreach { case (n, p) =>
      st += Blk(n, p, 1)
      while (st.length > 1 &&
          st(st.length - 2).r >= st(st.length - 1).r) {
        val b = st.remove(st.length - 1)
        st(st.length - 1).n += b.n
        st(st.length - 1).p += b.p
        st(st.length - 1).cnt += b.cnt
      }
    }
    st.toSeq.flatMap(b => Seq.fill(b.cnt)(b.r))
  }

  test("the min-max fit equals sequential weighted PAV on every group " +
      "and is monotone non-decreasing") {
    val got = Metrics.mlIsotonic(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (g, rows0) =>
      val rows = rows0.sortBy(_._2)
      val fit = rows.map(_._5)
      fit.sliding(2).foreach { case Array(a, b) =>
        assert(a <= b, s"group $g: fit must be monotone ($a > $b)")
      case _ => }
      val ref = pav(rows.map(r => (r._3, r._4)).toSeq)
        .map(v => math.floor(v * 1000000).toLong)
      assert(fit.toSeq == ref,
        s"group $g: min-max fit differs from PAV: " +
          s"${fit.toSeq.zip(ref).filter(t => t._1 != t._2).take(4)}")
    }
  }
}
