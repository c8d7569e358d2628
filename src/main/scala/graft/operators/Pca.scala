package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Principal component analysis as a distributed operator — the
  * dimensionality-reduction step an embedding pipeline runs before
  * indexing/clustering, in the shape that works at 100 TB:
  *
  *   1. ONE distributed pass aggregates the sufficient statistics
  *      (first + second moments of the embedding coordinates) with
  *      map-side combine — the corpus is touched exactly once and the
  *      shuffle carries d + d² partial sums, never rows;
  *   2. the d×d scatter matrix `M = n·S − s·sᵀ` (∝ covariance) is solved
  *      DRIVER-LOCALLY by power iteration — d = 64 makes this
  *      microseconds, the [[Regression]] Cramer-solve pattern at matrix
  *      scale;
  *   3. the projection onto the dominant component is a row-local
  *      dot product against the broadcast-literal eigenvector — one more
  *      corpus pass, no shuffle.
  *
  * Determinism/oracle contract (the part that makes a hash-compared
  * external oracle possible): coordinates are quantized to integers
  * (`floor(x·scale + 0.5)` — floor, never round, so no half-case
  * spelling differences), making every moment sum EXACT 64-bit integer
  * arithmetic — order-independent across partitions and engines. The
  * long→double conversion of the finished statistics is IEEE-determined,
  * and the power iteration then performs the identical operation
  * sequence on identical inputs (fixed start u₀ = 1/√d, per-iteration
  * sums folded in ascending index order) — so an external engine
  * replaying the same unrolled recurrence reproduces every projection
  * bit-for-bit. Exactness bound: `n²·scale²·max|x|² < 2^63` (≈ 3·10⁵
  * rows at scale 10⁴ and unit-range coordinates — far past the test
  * corpora; larger corpora lower `scale` or accept ANSI overflow
  * failing loudly rather than drifting silently).
  */
object Pca {

  /** Sufficient statistics + driver power iteration + row-local
    * projection. Returns (idCol, pc1, eigenvalue) where `pc1` is the
    * centered projection onto the dominant eigenvector in ORIGINAL
    * coordinate units and `eigenvalue` the dominant covariance
    * eigenvalue (both rounded for cross-engine float stability).
    */
  def pcaPowerTop1(df: DataFrame, idCol: String, embCol: String,
                   scale: Int = 10000, iters: Int = 20,
                   dims: Int = 64): DataFrame = {
    val d = df.select(col(idCol),
      expr(s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5d) AS BIGINT))")
        .as("ev"))
    // one distributed pass for ALL moments: the (i, j) explode happens
    // inside the scan stage and map-side combines to d² + d groups —
    // the only shuffle is (d² + d) × numPartitions partial rows
    val iDx = d.select(col("ev"), posexplode(col("ev")).as(Seq("i", "ei")))
    val moments = iDx
      .select(col("i"), col("ei"), posexplode(col("ev")).as(Seq("j", "ej")))
      .groupBy("i", "j").agg(sum(col("ei") * col("ej")).as("ss"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val firsts = iDx.groupBy("i").agg(sum("ei").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    require(firsts.nonEmpty, "PCA needs a non-empty corpus")
    val n = firsts.head._2._2
    val s = Array.tabulate(dims)(i => firsts(i)._1)
    // scatter matrix in exact integer arithmetic, THEN one IEEE-rounded
    // conversion — both engines start the iteration from equal doubles
    val m = Array.tabulate(dims, dims) { (i, j) =>
      (n * moments((i, j)) - s(i) * s(j)).toDouble
    }
    // power iteration, ascending-index fold order (the order the oracle
    // replays)
    var u = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var it = 0
    while (it < iters) {
      val v = Array.tabulate(dims) { i =>
        var acc = 0.0; var j = 0
        while (j < dims) { acc += m(i)(j) * u(j); j += 1 }
        acc
      }
      var nrm2 = 0.0; var i = 0
      while (i < dims) { nrm2 += v(i) * v(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      require(nrm > 0.0, "power iteration collapsed (zero-variance corpus)")
      // re-sync barrier: the 64-term sums above accumulate ~1e-16
      // relative float noise whose ASSOCIATION order an external engine
      // need not share, and power iteration AMPLIFIES any direction
      // noise by the eigen-gap ratio per step (measured: 3e-4 projection
      // divergence after 20 steps at sf0.1). Rounding the direction to
      // 12 decimals each step absorbs the noise (1e-12 >> 1e-16) while
      // perturbing the iterate far below the output rounding.
      u = v.map(x => BigDecimal(x / nrm)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      it += 1
    }
    // Rayleigh quotient of the final direction = dominant eigenvalue of
    // M; divide by n²·scale² for the covariance-scale eigenvalue
    val mu = Array.tabulate(dims) { i =>
      var acc = 0.0; var j = 0
      while (j < dims) { acc += m(i)(j) * u(j); j += 1 }
      acc
    }
    var lam = 0.0
    var li = 0
    while (li < dims) { lam += u(li) * mu(li); li += 1 }
    val eig = BigDecimal(lam / (n.toDouble * n * scale * scale))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // centered projection in original units:
    //   pc1 = (e − s/n)·u / scale = (e·u − (s·u)/n) / scale
    var sDotU = 0.0
    var si = 0
    while (si < dims) { sDotU += s(si) * u(si); si += 1 }
    d.select(col(idCol),
        // + 0.0 normalizes IEEE negative zero: a projection whose true
        // value is ~0 carries ±1e-16 association noise ACROSS zero, and
        // round() preserves the sign of zero — the one case where equal
        // values print differently ("−0" vs "0") in an external compare
        (round(
          (expr(s"""aggregate(zip_with(ev, ${uLitSql(u)},
                   |  (a, b) -> CAST(a AS DOUBLE) * b),
                   |0D, (acc, x) -> acc + x)""".stripMargin)
            - lit(sDotU / n)) / scale, 4) + lit(0.0)).as("pc1"),
        lit(eig).as("eigenvalue"))
  }

  /** The eigenvector inlined as a SQL double-array literal (full
    * precision via the repr round-trip — `toString` on a double is
    * shortest-exact in Scala/Java).
    */
  private def uLitSql(u: Array[Double]): String =
    u.map(x => s"CAST('$x' AS DOUBLE)").mkString("array(", ", ", ")")

  /** Registered query: dominant principal component of the embedding
    * corpus — per-vector centered projection plus the shared dominant
    * eigenvalue.
    */
  def mlPcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaPowerTop1(Tables.load(spark, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  /** The DuckDB oracle: the identical construction replayed — integer
    * moments, the same unrolled power recurrence (per-row sums built as
    * ordered lists so the fold order matches), the same projection.
    * Generated here so engine and oracle share one source of truth for
    * the iteration count and scale.
    */
  def oracleSql(scale: Int = 10000, iters: Int = 20, dims: Int = 64): String = {
    val rounds = (1 to iters).map { t =>
      s"""v$t AS MATERIALIZED (SELECT m.i AS i,
         |  list_sum(list(m.v * u.u ORDER BY m.j)) AS v
         |  FROM m JOIN u${t - 1} u ON u.i = m.j GROUP BY m.i),
         |n$t AS (SELECT sqrt(list_sum(list(v * v ORDER BY i))) AS nm FROM v$t),
         |u$t AS MATERIALIZED (SELECT i, ROUND(v / nm, 12) AS u
         |  FROM v$t, n$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5) AS BIGINT)) AS ev
       |  FROM embeddings),
       |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM e),
       |sv AS MATERIALIZED (SELECT g.i AS i, SUM(ev[g.i]) AS s
       |  FROM e, LATERAL (SELECT unnest(range(1, $dims + 1)) AS i) g
       |  GROUP BY g.i),
       |sm AS MATERIALIZED (SELECT gi.i AS i, gj.j AS j,
       |    SUM(ev[gi.i] * ev[gj.j]) AS ss
       |  FROM e, LATERAL (SELECT unnest(range(1, $dims + 1)) AS i) gi,
       |       LATERAL (SELECT unnest(range(1, $dims + 1)) AS j) gj
       |  GROUP BY 1, 2),
       |m AS MATERIALIZED (SELECT sm.i - 1 AS i, sm.j - 1 AS j,
       |    CAST(nn.n * sm.ss - si.s * sj.s AS DOUBLE) AS v
       |  FROM sm
       |  JOIN sv si ON si.i = sm.i
       |  JOIN sv sj ON sj.i = sm.j
       |  CROSS JOIN nn),
       |u0 AS (SELECT g.i - 1 AS i, 1.0 / sqrt(CAST($dims AS DOUBLE)) AS u
       |  FROM (SELECT unnest(range(1, $dims + 1)) AS i) g),
       |$rounds,
       |ul AS (SELECT list(u ORDER BY i) AS ul FROM u$iters),
       |mu AS (SELECT m.i AS i, list_sum(list(m.v * u.u ORDER BY m.j)) AS w
       |  FROM m JOIN u$iters u ON u.i = m.j GROUP BY m.i),
       |lam AS (SELECT list_sum(list(mu.w * u.u ORDER BY mu.i)) AS lam
       |  FROM mu JOIN u$iters u ON u.i = mu.i),
       |sdu AS (SELECT list_sum(list(sv.s * u.u ORDER BY sv.i)) AS sdu
       |  FROM sv JOIN u$iters u ON u.i = sv.i - 1)
       |SELECT e.vec_id,
       |  ROUND((list_sum(list_transform(range(1, $dims + 1),
       |      k -> CAST(ev[k] AS DOUBLE) * ul.ul[k]))
       |    - sdu.sdu / nn.n) / $scale, 4) + 0.0 AS pc1,
       |  ROUND(lam.lam / (CAST(nn.n AS DOUBLE) * nn.n * $scale * $scale), 6)
       |    AS eigenvalue
       |FROM e, ul, lam, sdu, nn
       |ORDER BY e.vec_id""".stripMargin
  }
}
