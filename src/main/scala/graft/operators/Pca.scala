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
                   dims: Int = 64): DataFrame =
    pcaPower(df, idCol, embCol, scale, iters, dims, components = 1)

  /** Top-2 via DEFLATION: after the dominant pair (u₁, λ₁) the matrix
    * deflates to `M₂ = M − λ₁·u₁u₁ᵀ` (Hotelling), whose dominant
    * eigenpair is the original second component — the same driver-local
    * iteration runs again; no additional corpus pass is needed until
    * the final projection, which emits both coordinates in one scan.
    */
  def pcaPowerTop2(df: DataFrame, idCol: String, embCol: String,
                   scale: Int = 10000, iters: Int = 20,
                   dims: Int = 64): DataFrame =
    pcaPower(df, idCol, embCol, scale, iters, dims, components = 2)

  /** Top-k via chained deflation: component c + 1 is the dominant pair
    * of `M_c = M_{c-1} − λ_c·u_cu_cᵀ`. Output widens to `pc1..pck` and
    * `eigenvalue, eigenvalue2..eigenvaluek` (names backward-compatible
    * with the top-1/top-2 surfaces).
    */
  def pcaPowerTopK(df: DataFrame, idCol: String, embCol: String,
                   k: Int, scale: Int = 10000, iters: Int = 20,
                   dims: Int = 64): DataFrame =
    pcaPower(df, idCol, embCol, scale, iters, dims, components = k)

  private def matVec(m: Array[Array[Double]], u: Array[Double]): Array[Double] = {
    val dims = u.length
    Array.tabulate(dims) { i =>
      var acc = 0.0; var j = 0
      while (j < dims) { acc += m(i)(j) * u(j); j += 1 }
      acc
    }
  }

  /** Power iteration with the per-step 12-decimal re-sync barrier: the
    * d-term sums accumulate ~1e-16 relative float noise whose
    * ASSOCIATION order an external engine need not share, and power
    * iteration AMPLIFIES direction noise by the eigen-gap ratio per step
    * (measured: 3e-4 projection divergence after 20 steps at sf0.1).
    * Rounding each step absorbs the noise (1e-12 >> 1e-16) while
    * perturbing the iterate far below the output rounding.
    */
  private def powerIterate(m: Array[Array[Double]], iters: Int): Array[Double] = {
    val dims = m.length
    var u = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var it = 0
    while (it < iters) {
      val v = matVec(m, u)
      var nrm2 = 0.0; var i = 0
      while (i < dims) { nrm2 += v(i) * v(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      require(nrm > 0.0, "power iteration collapsed (zero-variance corpus)")
      u = v.map(x => BigDecimal(x / nrm)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      it += 1
    }
    u
  }

  /** Rayleigh quotient uᵀMu (ascending fold order, unrounded — both
    * engines derive it from identical u and M).
    */
  private def rayleigh(m: Array[Array[Double]], u: Array[Double]): Double = {
    val mu = matVec(m, u)
    var lam = 0.0; var i = 0
    while (i < u.length) { lam += u(i) * mu(i); i += 1 }
    lam
  }

  private def pcaPower(df: DataFrame, idCol: String, embCol: String,
                       scale: Int, iters: Int, dims: Int,
                       components: Int): DataFrame = {
    require(components >= 1 && components <= dims,
      s"components must be in 1..$dims")
    val d = df.select(col(idCol),
      expr(s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale + 0.5d) AS BIGINT))")
        .as("ev"))
    // one distributed pass for ALL moments: a single (d² + d + 1)-long
    // aggregation buffer per partition ([[graft.functions.MomentsAgg]])
    // does the outer-product arithmetic in-place — the scan emits no
    // per-row expansion (the former posexplode×posexplode plan
    // materialized 4096 rows per input row before its combine), and the
    // only shuffle is one ~33 KB buffer per partition
    val momAgg = udaf(new graft.functions.MomentsAgg(dims))
    val momRow = d.select(momAgg(col("ev")).as("m"))
      .select(col("m.n"), col("m.s"), col("m.ss")).head()
    val n = momRow.getLong(0)
    require(n > 0, "PCA needs a non-empty corpus")
    val s = momRow.getSeq[Long](1).toArray
    val ss = momRow.getSeq[Long](2).toArray
    // scatter matrix in exact integer arithmetic, THEN one IEEE-rounded
    // conversion — both engines start the iteration from equal doubles
    // exact-arithmetic guards: plain Long * would wrap silently past 2^63
    // on an over-bound corpus — multiplyExact/subtractExact fail loudly,
    // matching the documented accept-overflow-failing-loudly contract the
    // aggregation buffer enforces for the distributed sums
    val m = Array.tabulate(dims, dims) { (i, j) =>
      Math.subtractExact(
        Math.multiplyExact(n, ss(i * dims + j)),
        Math.multiplyExact(s(i), s(j))).toDouble
    }
    def eigScaled(lam: Double): Double =
      BigDecimal(lam / (n.toDouble * n * scale * scale))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // top-k eigenpairs by chained Hotelling deflation: after each
    // dominant pair (u_c, λ_c) the working matrix deflates to
    // M − λ_c·u_cu_cᵀ (multiplication order pinned: λ·u_i first, then
    // ·u_j — the oracle replays the identical sequence), and the same
    // driver-local iteration runs again; no additional corpus pass
    // until the final projection, which emits all k coordinates in one
    // scan
    var mc = m
    val eigs = (1 to components).map { _ =>
      val u = powerIterate(mc, iters)
      val lam = rayleigh(mc, u)
      mc = Array.tabulate(dims, dims) { (i, j) =>
        mc(i)(j) - (lam * u(i)) * u(j)
      }
      (u, lam)
    }
    // centered projection in original units:
    //   pc = (e − s/n)·u / scale = (e·u − (s·u)/n) / scale
    // + 0.0 normalizes IEEE negative zero: a projection whose true value
    // is ~0 carries ±1e-16 association noise ACROSS zero, and round()
    // preserves the sign of zero — the one case where equal values print
    // differently ("−0" vs "0") in an external compare
    def proj(u: Array[Double], name: String): Column = {
      var sDotU = 0.0; var si = 0
      while (si < dims) { sDotU += s(si) * u(si); si += 1 }
      (round(
        (expr(s"""aggregate(zip_with(ev, ${uLitSql(u)},
                 |  (a, b) -> CAST(a AS DOUBLE) * b),
                 |0D, (acc, x) -> acc + x)""".stripMargin)
          - lit(sDotU / n)) / scale, 4) + lit(0.0)).as(name)
    }
    val projCols = eigs.zipWithIndex.map { case ((u, _), c) =>
      proj(u, s"pc${c + 1}")
    }
    val eigCols = eigs.zipWithIndex.map { case ((_, lam), c) =>
      lit(eigScaled(lam))
        .as(if (c == 0) "eigenvalue" else s"eigenvalue${c + 1}")
    }
    d.select(col(idCol) +: (projCols ++ eigCols): _*)
  }

  /** The eigenvector inlined as a SQL double-array literal (full
    * precision via the repr round-trip — `toString` on a double is
    * shortest-exact in Scala/Java).
    */
  private def uLitSql(u: Array[Double]): String =
    u.map(x => s"CAST('$x' AS DOUBLE)").mkString("array(", ", ", ")")

  /** Registered query: top-2 principal components of the embedding
    * corpus — per-vector centered 2-D projection (the
    * visualization/index layout every embedding pipeline wants) plus
    * the two shared eigenvalues.
    */
  def mlPcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaPowerTop2(Tables.load(spark, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  /** Registered query: top-3 components — the [[pcaPowerTopK]]
    * generalization driven through the oracle gate (the k = 3 chain
    * exercises a SECOND deflation, which top-2 never does).
    */
  def mlPcaTop3(spark: SparkSession, dir: String): DataFrame =
    pcaPowerTopK(Tables.load(spark, dir, "embeddings"), "vec_id", "embedding",
        k = 3)
      .orderBy("vec_id")

  /** The DuckDB oracle: the identical construction replayed — integer
    * moments, the same unrolled power recurrence (per-row sums built as
    * ordered lists so the fold order matches), the same projection —
    * generalized to `components` chained deflations (prefixes a, b, c,
    * …). Generated here so engine and oracle share one source of truth
    * for the iteration count, scale, and deflation order.
    */
  def oracleSql(scale: Int = 10000, iters: Int = 20, dims: Int = 64,
                components: Int = 2): String = {
    require(components >= 1 && components <= 26)
    // one power chain over matrix CTE `mat`, CTE names prefixed `p`
    def chain(p: String, mat: String): String = (1 to iters).map { t =>
      s"""${p}v$t AS MATERIALIZED (SELECT m.i AS i,
         |  list_sum(list(m.v * u.u ORDER BY m.j)) AS v
         |  FROM $mat m JOIN ${p}u${t - 1} u ON u.i = m.j GROUP BY m.i),
         |${p}n$t AS (SELECT sqrt(list_sum(list(v * v ORDER BY i))) AS nm
         |  FROM ${p}v$t),
         |${p}u$t AS MATERIALIZED (SELECT i, ROUND(v / nm, 12) AS u
         |  FROM ${p}v$t, ${p}n$t)""".stripMargin
    }.mkString(",\n")
    // Rayleigh + projection pieces for a finished chain
    def tail(p: String, mat: String): String =
      s"""${p}ul AS (SELECT list(u ORDER BY i) AS ul FROM ${p}u$iters),
         |${p}mu AS (SELECT m.i AS i, list_sum(list(m.v * u.u ORDER BY m.j)) AS w
         |  FROM $mat m JOIN ${p}u$iters u ON u.i = m.j GROUP BY m.i),
         |${p}lam AS (SELECT list_sum(list(mu.w * u.u ORDER BY mu.i)) AS lam
         |  FROM ${p}mu mu JOIN ${p}u$iters u ON u.i = mu.i),
         |${p}sdu AS (SELECT list_sum(list(sv.s * u.u ORDER BY sv.i)) AS sdu
         |  FROM sv JOIN ${p}u$iters u ON u.i = sv.i - 1)""".stripMargin
    val prefixes = (0 until components).map(c => ('a' + c).toChar.toString)
    val mats = (0 until components).map(c => if (c == 0) "m" else s"m${c + 1}")
    val compSql = (0 until components).map { c =>
      val p = prefixes(c); val mat = mats(c)
      val defl =
        if (c == components - 1) ""
        else {
          val nm = mats(c + 1)
          s""",
             |-- Hotelling deflation: $nm = $mat − λ·uuᵀ, multiplication
             |-- order pinned (λ·u_i first, then ·u_j) to match the engine
             |$nm AS MATERIALIZED (SELECT m.i AS i, m.j AS j,
             |    m.v - (${p}lam.lam * ui.u) * uj.u AS v
             |  FROM $mat m
             |  JOIN ${p}u$iters ui ON ui.i = m.i
             |  JOIN ${p}u$iters uj ON uj.i = m.j
             |  CROSS JOIN ${p}lam)""".stripMargin
        }
      s"""${p}u0 AS (SELECT g.i - 1 AS i, 1.0 / sqrt(CAST($dims AS DOUBLE)) AS u
         |  FROM (SELECT unnest(range(1, $dims + 1)) AS i) g),
         |${chain(p, mat)},
         |${tail(p, mat)}$defl""".stripMargin
    }.mkString(",\n")
    val pcCols = prefixes.zipWithIndex.map { case (p, c) =>
      s"""  ROUND((list_sum(list_transform(range(1, $dims + 1),
         |      k -> CAST(ev[k] AS DOUBLE) * ${p}ul.ul[k]))
         |    - ${p}sdu.sdu / nn.n) / $scale, 4) + 0.0 AS pc${c + 1}"""
        .stripMargin
    }
    val eigCols = prefixes.zipWithIndex.map { case (p, c) =>
      val nm = if (c == 0) "eigenvalue" else s"eigenvalue${c + 1}"
      s"""  ROUND(${p}lam.lam / (CAST(nn.n AS DOUBLE) * nn.n * $scale * $scale), 6)
         |    AS $nm""".stripMargin
    }
    val fromList = ("e" +:
      prefixes.flatMap(p => Seq(s"${p}ul", s"${p}lam", s"${p}sdu")) :+ "nn")
      .mkString(", ")
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
       |$compSql
       |SELECT e.vec_id,
       |${(pcCols ++ eigCols).mkString(",\n")}
       |FROM $fromList
       |ORDER BY e.vec_id""".stripMargin
  }
}
