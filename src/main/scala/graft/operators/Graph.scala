package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relation-derived edge lists — the iterative
  * sibling of [[Dedup.connectedComponents]]: weighted PageRank by power
  * iteration, expressed as DataFrame joins so Catalyst plans every step.
  *
  * Scale design (the part that must survive 100 TB):
  *   - The edge DERIVATION is the big-data stage: a fact-sized join +
  *     map-side-combined aggregate collapses billions of interactions to
  *     one weighted edge per (src, dst) — after that, iteration cost
  *     tracks |E_distinct|, not the fact table.
  *   - The normalized contribution table (`src, dst, share`) is computed
  *     ONCE, hash-partitioned by `src`, and materialized
  *     (localCheckpoint): every iteration reuses the same partitioning,
  *     so the per-iteration cost is one co-partitioned join on `src`
  *     (only the |V|-sized rank frame moves) plus one map-side-combined
  *     aggregate on `dst`. Nothing fact-sized ever moves again.
  *   - Checkpoint placement follows consumer count (the IVF-PQ audit
  *     rule): `edges`/`nodes`/`shares` feed every iteration → barrier
  *     each ONCE. The rank frame is consumed exactly once per iteration,
  *     so its lineage is LINEAR — left lazy within a checkpoint window,
  *     the power iteration collapses into one Spark job per window
  *     instead of one per round (measured 7.6 s → ~2 s warm on the
  *     nation graph at 5 rounds); every `CheckpointEvery` rounds the
  *     frame barriers once so a DEEP budget (50-round convergence run)
  *     keeps plan depth, analysis time, and codegen size bounded.
  *
  * Semantics: the classic damped recurrence without dangling-mass
  * redistribution — rank(d) = (1−α)/n + α·Σ_{s→d} rank(s)·w/out_w —
  * i.e. mass flowing into a node with no out-edges leaves the system
  * (renormalizable post-hoc). Ranks are rounded to 6 decimals each
  * iteration: partial-sum order differs between engines and
  * partitionings at ~1e-16, and in an ITERATED recurrence that noise
  * compounds — rounding re-pins the bits every pass (the
  * [[Clustering]] centroid precedent).
  */
object Graph {

  // Barrier convention (round 16, guide §5): every localCheckpoint in this
  // file is LAZY (eager = false). The barrier's two jobs — truncating
  // lineage so multi-consumer frames plan small, and splitting codegen —
  // are properties of the PLAN CUT, which lazy and eager share; eagerness
  // only adds one scheduled job per barrier (~130 ms fixed cost on
  // local[32]), which dominated these bounded-frame iterative operators
  // (graph_wcc ran ~19 jobs for milliseconds of data work). Value safety:
  // every consumer of a barriered frame here is a key join / semi join /
  // min / exact-integer sum / deterministic-keyed window — all immune to
  // the partition-row-order differences a lazily cached partition can see
  // when two concurrent stages race to materialize it.

  /** Weighted directed edges (src, dst, w) with w = Σ weight, one row per
    * distinct pair.
    */
  /** Iterations between rank-frame checkpoints: below this budget the
    * rank lineage stays lazy (linear lineage — the whole power iteration
    * is ONE Spark job, the measured fast path for the shallow oracle
    * runs), and at deep budgets (a 50-round convergence run) each
    * checkpoint truncates the plan so analysis/codegen cost stays
    * bounded in the iteration count instead of compounding per round.
    */
  private val CheckpointEvery = 10

  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.repartition(col("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count().toDouble
    // share = w / out-strength of src: exact-integer-valued doubles divided
    // identically in any engine, so the per-edge factor is bit-stable.
    val shares = e
      .join(e.groupBy("src").agg(sum("w").as("ow")), "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .repartition(col("src"))
      .localCheckpoint(false)
    var ranks = nodes.select(col("node"), round(lit(1.0 / n), 6).as("rank"))
    for (it <- 1 to iters) {
      val inflow = shares
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("share")).as("in_mass"))
      ranks = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit((1 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0)), 6).as("rank"))
      // truncate the rank lineage every CheckpointEvery rounds — values
      // are already bit-pinned by the per-iteration round(…, 6), so the
      // barrier changes the PLAN (bounded depth at deep budgets), never
      // the numbers
      if (it % CheckpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** Personalized PageRank (Jeh & Widom 2003, "Scaling Personalized Web
    * Search"): the random walk teleports to a SOURCE SET instead of the
    * uniform vector — `rank = (1−d)·tp + d·inflow` with `tp = 1/|S|` on
    * the sources and 0 elsewhere, started from tp itself. The relevance
    * ranking every "similar to these seeds" feature is built on.
    *
    * Same scale shape as [[pageRank]]: the per-iteration cost is one
    * shares⋈ranks join + one aggregate, shuffled on the edge key; the
    * teleport frame materializes once. Determinism: the round(…, 6)
    * per-iteration pin and the shared (1−d) expression tree make every
    * iterate bit-identical on any engine.
    */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
                           iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.repartition(col("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .localCheckpoint(false)
    val src = sources.select(col("node")).distinct().localCheckpoint(false)
    val ns = src.count().toDouble // |S| — includes sources off-graph, the
                                  // documented normalization (mass on
                                  // absent seeds is simply never walked)
    val shares = e
      .join(e.groupBy("src").agg(sum("w").as("ow")), "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("share"))
      .repartition(col("src"))
      .localCheckpoint(false)
    val tp = nodes
      .join(src.withColumn("is_src", lit(1)), Seq("node"), "left")
      .select(col("node"),
        when(col("is_src") === 1, lit(1.0 / ns)).otherwise(lit(0.0)).as("tp"))
      .localCheckpoint(false) // consumed every iteration
    var ranks = tp.select(col("node"), round(col("tp"), 6).as("rank"))
    for (it <- 1 to iters) {
      val inflow = shares
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("share")).as("in_mass"))
      ranks = tp
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(1 - damping) * col("tp") +
            lit(damping) * coalesce(col("in_mass"), lit(0.0)), 6).as("rank"))
      if (it % CheckpointEvery == 0 && it < iters)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** The nation-level trade graph: customer nation → supplier nation,
    * weighted by line items shipped. The one genuinely fact-sized step is
    * the lineitem⋈orders join (both sides huge at scale — an unavoidable
    * shuffle on the shared key). Customer and supplier GROW with the
    * corpus (they are entity tables, not bounded dims), so their joins
    * carry no broadcast hint — size-based planning broadcasts them at
    * test scale and degrades to key-partitioned shuffles when they
    * outgrow the threshold (a forced hint would OOM instead). The
    * closing aggregate is map-side combined down to ≤ |nations|² rows.
    */
  def nationTradeEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
    val su = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
  }

  /** Degree-ordered triangle counting + local clustering coefficients —
    * the canonical "make the triangle join scale" construction (Suri &
    * Vassilvitskii's MapReduce scheme; GraphLab/PowerGraph use the same
    * orientation): orient every undirected edge from its lower-(degree,
    * id) endpoint to the higher one. The orientation is acyclic, so each
    * triangle has exactly ONE apex with both out-edges inside it —
    * counted once, no post-hoc distinct — and, crucially, every node's
    * OUT-degree is O(√|E|), so the wedge self-join (the only quadratic
    * risk) is bounded per node no matter how skewed the raw degree
    * distribution is. A hub with a million neighbors produces a million
    * wedges in the naive formulation; oriented, it produces at most
    * ~√|E| per apex.
    *
    * Pipeline: undirected collapse (map-side combined) → weight
    * sparsification against the broadcast 1-row percentile → degree
    * aggregate (|V|-sized, UNBOUNDED in graph size, so its two joins
    * back onto the edge list carry no broadcast hint — size-based
    * planning broadcasts a small rank table and shuffle-joins a big one
    * on the node key) → wedge equi-join on the apex → closing equi-join
    * on the (x, y) edge key. Coefficient = 2·Δ(v) / (d(v)·(d(v)−1)) on
    * the sparsified simple graph.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"), col("w"))
      .groupBy("u", "v").agg(sum("w").as("w"))
    // sparsify at the 70th weight percentile: quantile-relative (not
    // mean-relative) so the kept fraction is ~30% at ANY weight
    // concentration — a mean rule keeps nothing when weights cluster
    // tightly around it (observed at sf0.1: 0 of 300 edges > 1.3×mean)
    val kept = und
      .crossJoin(broadcast(und.agg(
        expr("percentile(w, 0.7)").as("q"))))
      .filter(col("w") > col("q"))
      .select("u", "v")
      .localCheckpoint(false) // feeds degrees, wedges, and the close join
    val deg = kept.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // total order: rank = degree * 2^20 + id (ids are far below 2^20)
    val rnk = deg.select(col("n"), (col("d") * 1048576L + col("n")).as("r"))
    val oriented = kept
      .join(rnk.select(col("n").as("u"), col("r").as("ru")), "u")
      .join(rnk.select(col("n").as("v"), col("r").as("rv")), "v")
      .select(
        when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("a"),
        when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("b"),
        greatest(col("ru"), col("rv")).as("rb"))
    val w2 = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.a") === col("e2.a")
        && col("e1.rb") < col("e2.rb"))
      .select(col("e1.a").as("apex"), col("e1.b").as("x"), col("e2.b").as("y"))
    // the closing edge runs lower→higher rank, i.e. exactly x→y
    val tri = w2.join(oriented.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"))
    val perNode = tri
      .select(explode(array(col("apex"), col("x"), col("y"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("d") < 2, lit(0.0)).otherwise(
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("d") * (col("d") - 1)), 6)).as("coef"))
      .orderBy("node")
  }

  /** Registered query: triangle statistics of the sparsified (w above
    * the 70th weight percentile) undirected nation trade graph.
    */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    triangleStats(nationTradeEdges(s, dir))

  /** graph_transitivity — the GLOBAL clustering ratio 3·T/W (closed
    * triple fraction, Newman's transitivity) over the same sparsified
    * graph as [[graphTriangles]]: wedges W = Σ d(d−1)/2 and the
    * triangle incidences Σ n_tri = 3T both fall out of the per-node
    * frame as one more |V|-sized aggregate — integers end to end, one
    * final division, rounded.
    */
  def graphTransitivity(s: SparkSession, dir: String): DataFrame =
    transitivityStats(nationTradeEdges(s, dir))

  /** The global aggregate over [[triangleStats]]'s per-node frame. */
  def transitivityStats(edges: DataFrame): DataFrame =
    triangleStats(edges)
      .agg(count(lit(1)).as("n_nodes"),
        sum(expr("degree * (degree - 1)")).as("w2"),
        sum("n_tri").as("t3"))
      .select(col("n_nodes"),
        expr("w2 DIV 2").as("wedges"),
        expr("t3 DIV 3").as("n_triangles"),
        when(col("w2") === 0, lit(0.0)).otherwise(
          round(lit(2.0) * col("t3") / col("w2"), 6)).as("transitivity"))

  /** Synchronous min-label propagation, `rounds` rounds: every node
    * starts labeled with its own id; each round every node takes the
    * minimum of its own label and its in-neighbors' labels. On a
    * symmetric edge list this is the classic bounded-round community /
    * connected-component detector (Raghavan et al. 2007's LPA with min
    * tie-breaking; run to fixpoint it IS connected components — the
    * bounded-round form is what one iteration budget buys on a 100 TB
    * graph, and is deterministic, which fixpoint-free LPA variants are
    * not).
    *
    * Scale shape: edges are hash-partitioned on `src` ONCE and
    * materialized; each round is one co-partitioned join on `src` (only
    * the |V|-sized label frame moves), a map-side-combined min on `dst`,
    * and a |V|⋈|V| merge. Labels re-materialize per round — the frame
    * feeds the join AND the merge, and unbarriered lineage would double
    * the whole prefix each round (the [[Dedup.connectedComponents]]
    * precedent). Cost per round tracks |E| + |V|, never |E|².
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().localCheckpoint(false)
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val nbrMin = e
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("label").as("nmin"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** The part attribute-affinity graph: star edges from every part to the
    * min-key "hub" of its (brand, size) group and of its type group,
    * symmetrized. Two overlapping attribute groupings make the
    * propagation genuinely multi-hop — communities merge ACROSS the two
    * relations, so labels travel part→hub→part→other-hub chains that a
    * single grouping would never produce. Hub selection is one window
    * min per grouping (two shuffles on vocabulary-sized keys); stars, not
    * cliques, keep |E| = 2·|V| rows instead of Σ|group|².
    */
  def partAffinityEdges(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
    def stars(cs: String*) = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(cs.map(col): _*)
      p.select(col("p_partkey").cast("long").as("p"),
          min(col("p_partkey").cast("long")).over(w).as("hub"))
        .filter(col("p") =!= col("hub"))
    }
    val st = stars("p_brand", "p_size")
      .unionByName(stars("p_type"))
    st.select(col("p").as("src"), col("hub").as("dst"))
      .unionByName(st.select(col("hub").as("src"), col("p").as("dst")))
  }

  /** Bounded-round BFS (min-plus propagation): hop distance from a
    * source set, `rounds` synchronous relaxations — after R rounds every
    * node within R hops carries its EXACT distance; farther nodes are
    * absent (the bounded iteration budget a 100 TB graph run gets, same
    * contract as [[labelPropagation]]). Each round is one co-partitioned
    * edge⋈frontier join + a map-side-combined min + a |reached|-sized
    * merge; the distance frame re-barriers per round (two consumers).
    */
  def bfsHops(edges: DataFrame, sources: Seq[Long], rounds: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(false)
    var dist = sources.toDF("node").withColumn("d", lit(0L))
    for (_ <- 1 to rounds) {
      val nd = e.join(dist.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg((min("d") + 1).as("nd"))
      dist = dist.join(nd, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("d"), col("nd")), coalesce(col("nd"), col("d"))).as("d"))
        .localCheckpoint(false)
    }
    dist
  }

  /** Registered query: 3-round BFS from nation 0 over the directed trade
    * graph — (node, name, exact hop distance) for every nation reached
    * within 3 hops.
    */
  def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val hops = bfsHops(nationTradeEdges(s, dir), sources = Seq(0L), rounds = 3)
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    hops.join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("d").as("dist"))
      .orderBy("node")
  }

  /** graph_degree_hist — the DEGREE DISTRIBUTION (the power-law/hub
    * diagnostic every graph pipeline inspects before choosing a
    * partitioning strategy — precisely the skew signal that decides
    * whether a salted join or an oriented wedge-join is needed): over
    * the undirected simple graph, one row per occurring degree with
    * its node count and the cumulative share in micro-units. Two
    * map-side-combined aggregates, both vocabulary-sized.
    */
  def graphDegreeHist(s: SparkSession, dir: String): DataFrame = {
    // the part-affinity STAR graph: hubs carry group-sized degrees,
    // leaves degree 1-2 — a genuinely skewed distribution (the dense
    // nation graph collapses to a single histogram row)
    val und = partAffinityEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val hist = deg.groupBy("d").agg(count(lit(1)).as("n_nodes"))
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.partitionBy()
    hist
      .withColumn("cum", sum("n_nodes").over(wCum))
      .withColumn("tot", sum("n_nodes").over(wAll))
      .select(col("d").as("degree"), col("n_nodes"),
        expr("cum * 1000000 DIV tot").as("cum_share_e6"))
      .orderBy("degree")
  }

  /** graph_eccentricity — DOUBLE-SWEEP pseudo-diameter (Magnien et al.
    * 2009's standard lower-bound heuristic, what igraph/NetworKit run
    * when the exact diameter is too expensive): BFS from a pivot, hop
    * to the farthest reached node (ties to the lowest id), BFS again —
    * the second eccentricity is the pseudo-diameter. Exactly two
    * bounded-round [[bfsHops]] passes; the 1-row farthest-node pick is
    * the only driver materialization (the graph_pagerank bounded
    * class).
    */
  def graphEccentricity(s: SparkSession, dir: String): DataFrame = {
    val edges = nationTradeEdges(s, dir)
    val d1 = bfsHops(edges, sources = Seq(0L), rounds = 3)
    val top = d1.orderBy(col("d").desc, col("node")).limit(1).collect()(0)
    val u = top.getLong(0); val ecc0 = top.getLong(1)
    bfsHops(edges, sources = Seq(u), rounds = 3)
      .agg(max("d").as("pseudo_diameter"),
        count(lit(1)).as("n_reached"))
      .select(lit(0L).as("pivot"), lit(u).as("far_node"),
        lit(ecc0).as("ecc_pivot"), col("pseudo_diameter"),
        col("n_reached"))
  }

  /** Registered query: 5 rounds of min-label propagation over the part
    * attribute-affinity graph — (node, label) plus each community's
    * final size.
    */
  def graphLabelProp(s: SparkSession, dir: String): DataFrame = {
    val labels = labelPropagation(partAffinityEdges(s, dir), rounds = 5)
    val wl = org.apache.spark.sql.expressions.Window.partitionBy("label")
    labels.select(col("node"), col("label"),
        count(lit(1)).over(wl).as("community_size"))
      .orderBy("node")
  }

  /** Registered query: 5 damped iterations over the nation trade graph,
    * nation names joined back for the final report.
    */
  def graphPageRank(s: SparkSession, dir: String): DataFrame = {
    val pr = pageRank(nationTradeEdges(s, dir), iters = 5)
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    pr.join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("rank"))
      .orderBy("node")
  }

  /** Registered query: personalized PageRank seeded on region-0 nations
    * over the nation trade graph — "trade relevance to the Americas"
    * (5 damped iterations, names joined back).
    */
  def graphPpr(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(s, dir, "nation")
    val sources = nation.filter(col("n_regionkey") === 0)
      .select(col("n_nationkey").cast("long").as("node"))
    val pr = personalizedPageRank(nationTradeEdges(s, dir), sources,
      iters = 5)
    val names = nation
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    pr.join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("rank"))
      .orderBy("node")
  }

  /** Katz centrality (Katz 1953, "A new status index derived from
    * sociometric analysis"): `x = Σ_k α^k (Aᵀ)^k 1` — every inbound
    * walk counts, attenuated by length — computed as the standard fixed
    * iteration `x ← 1 + α·Aᵀx` from x = 1, over the UNWEIGHTED distinct
    * edge set (the contrast with [[pageRank]]'s out-strength-normalized
    * shares: Katz rewards raw reachability, PageRank splits mass).
    * α = 0.05 keeps α·λmax < 1 on graphs up to in-degree 20 per node
    * class; the registered query runs a FIXED 4 rounds with the
    * per-iteration round(…, 6) pin, so the emitted iterate is exact on
    * any engine regardless of spectral radius.
    *
    * Scale: per round one edges⋈scores join + one aggregate, shuffled
    * on the edge key — the [[pageRank]] loop shape.
    */
  def katz(edges: DataFrame, iters: Int, alpha: Double = 0.05): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .localCheckpoint(false)
    var x = nodes.select(col("node"), lit(1.0).as("katz"))
    for (it <- 1 to iters) {
      val inflow = e
        .join(x.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("katz")).as("in_sum"))
      x = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          round(lit(1.0) + lit(alpha) * coalesce(col("in_sum"), lit(0.0)), 6)
            .as("katz"))
      if (it % CheckpointEvery == 0 && it < iters)
        x = x.localCheckpoint(false)
    }
    x
  }

  /** Registered query: 4 Katz rounds over the unweighted nation trade
    * graph, names joined back.
    */
  def graphKatz(s: SparkSession, dir: String): DataFrame = {
    val k = katz(nationTradeEdges(s, dir), iters = 4)
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    k.join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("katz"))
      .orderBy("node")
  }

  /** The graph_katz oracle: the same 4 unrolled rounds over the
    * distinct edge set, identical `1.0 + 0.05 · Σ` tree and ROUND pin.
    */
  def katzOracleSql(): String = {
    val rounds = (1 to 4).map { k =>
      s"""x$k AS (SELECT nd.node,
         |    ROUND(1.0 + 0.05 * COALESCE(SUM(r.katz), 0), 6) AS katz
         |  FROM nodes nd
         |  LEFT JOIN e ON e.dst = nd.node
         |  LEFT JOIN x${k - 1} r ON r.node = e.src
         |  GROUP BY nd.node)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |x0 AS (SELECT node, 1.0 AS katz FROM nodes),
       |${rounds.mkString(",\n")}
       |SELECT x4.node, n.n_name, x4.katz
       |FROM x4 JOIN nation n ON x4.node = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY x4.node""".stripMargin
  }

  /** Degree assortativity (Newman 2002, "Assortativity mixing in
    * networks"): the Pearson correlation of endpoint degrees over the
    * undirected distinct edge set —
    * `r = (S1/M − (S2/2M)²) / (S3/2M − (S2/2M)²)` with
    * S1 = Σ_e j·k, S2 = Σ_e (j+k), S3 = Σ_e (j²+k²) — positive when
    * hubs link hubs, negative for hub-and-spoke. All three sums are
    * exact integers (degrees are counts), so the closing expression is
    * one identical IEEE tree on any engine; emitted ROUND 6 with the
    * raw sums beside it.
    *
    * Scale: dedupe + degree count + two degree joins keyed on the edge
    * endpoints + one bounded aggregate — each step shuffles on a key
    * the next step reuses; no pair explosion anywhere.
    */
  def graphAssortativity(s: SparkSession, dir: String): DataFrame = {
    // the customer–supplier TRADE graph at entity level (suppliers
    // offset into their own id space): genuinely varied degrees, unlike
    // the complete nation-level projection whose constant degree makes
    // r formally undefined (the NULLIF guard below keeps the query
    // total either way — the ml_ndcg discipline)
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val und = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long").as("u"),
        (col("l_suppkey").cast("long") + 1000000L).as("v"))
      .distinct()
      .localCheckpoint(false) // feeds the degree count AND both joins
    val deg = und.select(col("u").as("n")).union(und.select(col("v")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val j = und
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
    j.agg(count(lit(1)).as("m"),
        sum(col("du") * col("dv")).as("s1"),
        sum(col("du") + col("dv")).as("s2"),
        sum(col("du") * col("du") + col("dv") * col("dv")).as("s3"))
      .withColumn("mu", col("s2").cast("double") /
        (col("m") * 2).cast("double"))
      .select(col("m"), col("s1"), col("s2"), col("s3"),
        round((col("s1").cast("double") / col("m").cast("double") -
          col("mu") * col("mu")) /
          nullif(col("s3").cast("double") / (col("m") * 2).cast("double") -
            col("mu") * col("mu"), lit(0.0)), 6).as("assortativity"))
  }

  /** The graph_assortativity oracle: identical sums and the identical
    * closing expression tree.
    */
  def assortativityOracleSql(): String =
    """WITH und AS (
      |  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS u,
      |         CAST(l.l_suppkey AS BIGINT) + 1000000 AS v
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |deg AS (SELECT n, COUNT(*) AS d FROM (
      |          SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      |        GROUP BY n),
      |j AS (SELECT du.d AS du, dv.d AS dv
      |      FROM und JOIN deg du ON und.u = du.n
      |      JOIN deg dv ON und.v = dv.n),
      |a AS (SELECT COUNT(*) AS m, SUM(du * dv) AS s1,
      |        SUM(du + dv) AS s2, SUM(du * du + dv * dv) AS s3
      |      FROM j),
      |b AS (SELECT m, s1, s2, s3,
      |        CAST(s2 AS DOUBLE) / CAST(m * 2 AS DOUBLE) AS mu
      |      FROM a)
      |SELECT CAST(m AS BIGINT) AS m, CAST(s1 AS BIGINT) AS s1,
      |  CAST(s2 AS BIGINT) AS s2, CAST(s3 AS BIGINT) AS s3,
      |  ROUND((CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE) - mu * mu)
      |    / NULLIF(CAST(s3 AS DOUBLE) / CAST(m * 2 AS DOUBLE) - mu * mu,
      |             0), 6)
      |    AS assortativity
      |FROM b""".stripMargin

  /** Edge reciprocity — the directed-graph mutuality ratio (Newman et
    * al. 2002): the fraction of directed edges whose reverse edge also
    * exists, over the distinct non-loop edge set. Near 1 = mutual-trade
    * structure, near 0 = one-way flow — the first diagnostic before
    * treating a directed graph as undirected (every *_und projection in
    * this file implicitly assumes it).
    *
    * Scale: one dedupe + ONE self-join keyed on the reversed edge pair
    * (a LEFT SEMI, so no fan-out) + a bounded aggregate. Exact integer
    * counts; the ratio is one division, ROUND 6.
    */
  def graphReciprocity(s: SparkSession, dir: String): DataFrame = {
    val e = nationTradeEdges(s, dir)
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
      .localCheckpoint(false) // both sides of the semi-join
    val mutual = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("m"))
      .crossJoin(broadcast(mutual.agg(count(lit(1)).as("m_recip"))))
      .select(col("m"), col("m_recip"),
        round(col("m_recip").cast("double") / col("m").cast("double"), 6)
          .as("reciprocity"))
  }

  /** The graph_reciprocity oracle: identical distinct edge set and
    * reversed-pair membership.
    */
  def reciprocityOracleSql(): String =
    """WITH e AS (
      |  SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
      |         CAST(s.s_nationkey AS BIGINT) AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey),
      |r AS (SELECT COUNT(*) AS m_recip FROM e
      |      WHERE EXISTS (SELECT 1 FROM e e2
      |                    WHERE e2.src = e.dst AND e2.dst = e.src)),
      |t AS (SELECT COUNT(*) AS m FROM e)
      |SELECT CAST(m AS BIGINT) AS m, CAST(m_recip AS BIGINT) AS m_recip,
      |  ROUND(CAST(m_recip AS DOUBLE) / CAST(m AS DOUBLE), 6)
      |    AS reciprocity
      |FROM t, r""".stripMargin

  /** The graph_ppr oracle: the same teleport vector and 5 unrolled
    * update rounds ([[graphPageRank]]'s oracle discipline — identical
    * `(1 − 0.85)` expression tree, identical ROUND(…, 6) pin).
    */
  def pprOracleSql(): String = {
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (SELECT t.node, ROUND((1 - 0.85) * t.tp
         |         + 0.85 * COALESCE(SUM(r.rank * s.share), 0), 6) AS rank
         |       FROM tp t
         |       LEFT JOIN sh s ON s.dst = t.node
         |       LEFT JOIN r${k - 1} r ON r.node = s.src
         |       GROUP BY t.node, t.tp)""".stripMargin
    }
    s"""WITH e AS (
       |  SELECT CAST(c.c_nationkey AS BIGINT) AS src,
       |         CAST(s.s_nationkey AS BIGINT) AS dst,
       |         CAST(COUNT(*) AS DOUBLE) AS w
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1, 2),
       |sh AS (
       |  SELECT e.src, e.dst, e.w / ow.ow AS share
       |  FROM e JOIN (SELECT src, SUM(w) AS ow FROM e GROUP BY src) ow
       |    ON e.src = ow.src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nsrc AS (SELECT CAST(COUNT(DISTINCT n_nationkey) AS DOUBLE) AS ns
       |         FROM nation WHERE n_regionkey = 0),
       |tp AS (SELECT node,
       |         CASE WHEN node IN (SELECT CAST(n_nationkey AS BIGINT)
       |                            FROM nation WHERE n_regionkey = 0)
       |              THEN 1.0 / (SELECT ns FROM nsrc) ELSE 0.0 END AS tp
       |       FROM nodes),
       |r0 AS (SELECT node, ROUND(tp, 6) AS rank FROM tp),
       |${rounds.mkString(",\n")}
       |SELECT r5.node, n.n_name, r5.rank
       |FROM r5 JOIN nation n ON r5.node = CAST(n.n_nationkey AS BIGINT)
       |ORDER BY r5.node""".stripMargin
  }

  /** Neighborhood Jaccard similarity — the link-prediction / entity-
    * similarity primitive: for every node pair sharing ≥1 neighbor,
    * |N(u)∩N(v)| / |N(u)∪N(v)|, reported for pairs above a support +
    * similarity floor.
    *
    * Shape: pairs materialize ONLY through a shared neighbor (one
    * self-join of the edge list on the neighbor column, shuffled on
    * that key) — never the |V|² cross product. The per-neighbor fan-out
    * is adjacency-list-squared, so like every posting-list join in this
    * repo ([[graft.operators.Dedup]]'s frequency caps) the cap is ARMED
    * as part of the semantics: pairs only form through shared neighbors
    * of degree ≤ `maxHubDegree` (a neighbor shared by everyone carries
    * no similarity signal — the standard stop-word argument; measured
    * here, the uncapped type-star hubs cost 36 s at sf0.1 and grow as
    * deg², the capped plan is bounded by cap·|E| — linear). The oracle
    * encodes the SAME cap, so the gate checks the capped semantics
    * exactly, at every scale.
    *
    * Determinism: counts are exact longs; Jaccard divides two identical
    * integers in both engines (full degrees in the denominator, capped
    * common in the numerator — a documented lower bound); ties in the
    * similarity ordering break on (u, v).
    */
  def neighborJaccard(edges: DataFrame, minCommon: Long = 1,
                      minJaccard: Double = 0.25,
                      maxHubDegree: Long = 64): DataFrame = {
    // e feeds deg + ef, ef feeds both sides of the pair join: eager
    // barriers or the edge derivation (windowed) re-runs per consumer
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint(false)
    val lowDeg = deg.filter(col("d") <= maxHubDegree)
      .select(col("src").as("n"))
    val ef = e.select(col("src").as("u"), col("dst").as("n"))
      .join(lowDeg, Seq("n"), "left_semi")
      .localCheckpoint(false)
    val pairs = ef
      .join(ef.select(col("u").as("v"), col("n")), "n")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    pairs
      .join(deg.select(col("src").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("src").as("v"), col("d").as("dv")), "v")
      .withColumn("jaccard", round(col("common") /
        (col("du") + col("dv") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Bounded-round k-core peeling (Seidman 1983's coreness, the
    * bounded-iteration form a fixed budget buys — the [[labelPropagation]]
    * convention): each round drops every node whose CURRENT degree is
    * below k, edges restrict to surviving endpoints, repeat. After
    * enough rounds this IS the k-core; at a fixed budget both engines
    * compute the identical bounded-round approximation, so the oracle
    * gate is exact either way.
    *
    * Scale shape per round: one map-side-combined degree count + two
    * semi joins on the (re-used) edge partitioning — cost tracks |E|
    * per round, never |E|²; the edge frame re-materializes per round
    * (the lineage-barrier rule every iterative operator here follows).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("n"))
        .localCheckpoint(false)
      e = e.join(keep.select(col("n").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("n").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .localCheckpoint(false)
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** Registered query: 3-core of the sparsified nation trade graph
    * (the [[triangleStats]] edge construction — dense enough that
    * peeling does real work at the fringe) after 8 rounds, converged
    * at this diameter.
    */
  def graphKCore(s: SparkSession, dir: String): DataFrame = {
    val und = nationTradeEdges(s, dir).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"), col("w"))
      .groupBy("u", "v").agg(sum("w").as("w"))
    val kept = und
      .crossJoin(broadcast(und.agg(expr("percentile(w, 0.7)").as("q"))))
      .filter(col("w") > col("q"))
      .select("u", "v")
    val sym = kept.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(kept.select(col("v").as("src"), col("u").as("dst")))
    kCore(sym, k = 3, rounds = 8)
      .select(col("node"), col("core_degree"))
      .orderBy("node")
  }

  /** Per-source bounded BFS — [[bfsHops]] generalized to carry the
    * source key through every round: state is (s, node, d), one
    * min-merge full-outer join per round over the (s, node)
    * partitioning. State size is |sources|·|reachable|, which is why
    * the public-scale playbook (HyperBall/HADI, Eppstein–Wang pivot
    * sampling) runs centrality from a SAMPLED pivot set — `sources`
    * is that pivot frame, bounded by the caller, never "all nodes of
    * an unbounded graph".
    */
  def multiSourceHops(edges: DataFrame, sources: DataFrame,
                      rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(false)
    var dist = sources.select(col("s"), col("s").as("node"),
      lit(0L).as("d")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val nd = e.join(dist.withColumnRenamed("node", "src"), "src")
        .groupBy(col("s"), col("dst").as("node"))
        .agg((min("d") + 1).as("nd"))
      dist = dist.join(nd, Seq("s", "node"), "full_outer")
        .select(col("s"), col("node"),
          least(coalesce(col("d"), col("nd")),
            coalesce(col("nd"), col("d"))).as("d"))
        .localCheckpoint(false)
    }
    dist
  }

  /** Registered query: harmonic (in-)centrality of every nation in the
    * trade graph — `H(v) = Σ_{s≠v} 1/d(s,v)` over 4 BFS rounds from
    * every node as pivot (the graph is bounded: ≤ 25 nations; on an
    * unbounded graph the pivot frame is a sample, same plan). The
    * distance budget makes the score EXACT INTEGER arithmetic:
    * d ∈ {1..4}, so Σ 12/d (LCM scaling) is a plain integer sum —
    * `h12 = 12·H(v)` — order-independent and engine-portable with no
    * float division anywhere. Output: node, name, sources reached
    * from, h12, ranked most-central first.
    */
  def graphCloseness(s: SparkSession, dir: String): DataFrame = {
    val e = nationTradeEdges(s, dir).select("src", "dst")
    val nodes = e.select(col("src").as("s"))
      .unionByName(e.select(col("dst").as("s"))).distinct()
    val dist = multiSourceHops(e, nodes, rounds = 4)
      .filter(col("d") > 0) // drop the s=node seed rows
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    dist.groupBy("node")
      .agg(count(lit(1)).as("reached"),
        sum(expr("CASE d WHEN 1 THEN 12L WHEN 2 THEN 6L " +
          "WHEN 3 THEN 4L ELSE 3L END")).as("h12"))
      .join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("reached"), col("h12"))
      .orderBy(col("h12").desc, col("node"))
  }

  /** Minimum spanning forest by Borůvka's algorithm — THE parallel MST
    * scheme (every MapReduce/Pregel MST paper is Borůvka at heart)
    * because each round is embarrassingly relational: every component
    * picks its minimum outgoing edge (one aggregate with the
    * deterministic tie-break (w, u, v) — ties would otherwise make the
    * forest engine-dependent), the chosen edges merge components
    * (min-label + pointer doubling over the BOUNDED component graph,
    * the [[wcc]] machinery), and the component count at least halves —
    * so `rounds` = O(log |V|) with certainty, and each round costs
    * O(|E|) joins on the re-used edge partitioning.
    *
    * Input: undirected unique edges (u < v, integer weight). Output:
    * the chosen forest edges. With distinct weights this is THE MSF;
    * with ties it is the exact forest selected by the documented
    * tie-break (still minimal — lexicographic tie-breaking is the
    * standard uniqueness device).
    */
  def boruvkaMst(edgesU: DataFrame, rounds: Int,
                 driverMaxEdges: Long = 5000000L): DataFrame = {
    val s = edgesU.sparkSession
    import s.implicits._
    val e = edgesU.select(col("u"), col("v"), col("w"))
      .localCheckpoint(false)
    var comp = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node"))).distinct()
      .select(col("node"), col("node").as("c"))
      .localCheckpoint(false)
    var mstEdges = List.empty[DataFrame]
    for (_ <- 1 to rounds) {
      val e2 = e
        .join(comp.select(col("node").as("u"), col("c").as("cu")), "u")
        .join(comp.select(col("node").as("v"), col("c").as("cv")), "v")
        .filter(col("cu") =!= col("cv"))
      // every cross edge is a candidate for BOTH endpoint components
      val cand = e2.select(col("cu").as("cc"), col("u"), col("v"),
          col("w"), col("cu"), col("cv"))
        .unionByName(e2.select(col("cv").as("cc"), col("u"), col("v"),
          col("w"), col("cu"), col("cv")))
      val wMin = org.apache.spark.sql.expressions.Window
        .partitionBy("cc").orderBy(col("w"), col("u"), col("v"))
      val chosen = cand.withColumn("rk", row_number().over(wMin))
        .filter(col("rk") === 1)
        .select(col("u"), col("v"), col("w"), col("cu"), col("cv"))
        .distinct() // both sides may pick the same edge
        .localCheckpoint(false)
      mstEdges ::= chosen.select("u", "v", "w")
      // Contract the component graph. The chosen COMPONENT edges are
      // one row per surviving component (the frame Borůvka just
      // halved), so they are usually tiny — but "usually" is not a
      // size guard (the r10 verdict's one genuine scale-killer): gate
      // on a coded budget, the Dedup.connectedComponents convention.
      // ≤ driverMaxEdges → collect + union-find in O(E α(E)) on the
      // driver (milliseconds, min-root so labels stay min-ids); above
      // it → the distributed [[wcc]] pointer-doubling loop over the
      // SAME component-edge graph (also min-label roots), with a round
      // budget covering the worst chain (doubling reaches 2^r hops).
      // The forest SELECTION above (the O(|E|) part) is distributed
      // either way, so only the remap frame changes provider.
      val nChosen = chosen.count() // checkpointed: count is a cheap scan
      if (nChosen > 0 && nChosen <= driverMaxEdges) {
        val pairs = chosen.select("cu", "cv").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          r
        }
        pairs.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val remap = parent.keys.map(c => (c, find(c)))
          .filter { case (c, r) => c != r }.toSeq
        if (remap.nonEmpty) {
          val m = broadcast(remap.toDF("c0", "cnew"))
          comp = comp.join(m, col("c") === col("c0"), "left_outer")
            .select(col("node"), coalesce(col("cnew"), col("c")).as("c"))
            .localCheckpoint(false)
        }
      } else if (nChosen > 0) {
        // distributed contraction: min-label components of the chosen
        // component-edge graph; 2^r doubling rounds cover any chain of
        // merged components (≤ nChosen + 1 nodes on a path)
        val wccRounds = (64 - java.lang.Long.numberOfLeadingZeros(
          nChosen + 1)).toInt + 2
        val labels = wcc(chosen.select(col("cu").as("src"),
            col("cv").as("dst")), wccRounds)
          .select(col("node").as("c0"), col("p").as("cnew"))
          .filter(col("c0") =!= col("cnew"))
        // no broadcast hint: the label frame is component-sized, not
        // bounded by construction — AQE promotes small ones at runtime
        comp = comp.join(labels, col("c") === col("c0"), "left_outer")
          .select(col("node"), coalesce(col("cnew"), col("c")).as("c"))
          .localCheckpoint(false)
      }
    }
    mstEdges.reduce(_ unionByName _)
  }

  /** Registered query: the minimum spanning forest of the undirected
    * nation trade graph weighted by trade-line counts — the forest
    * edges plus (per component of the final forest) nothing extra: the
    * report is the edge list itself, ordered, with the total at the
    * tie-broken uniqueness the oracle replays. 3 Borůvka rounds close
    * 25 nodes with margin (components at least halve per round).
    */
  def graphMst(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val c = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
    val su = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val und = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(
        least(col("c_nationkey"), col("s_nationkey")).cast("long").as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("v"))
      .agg(count(lit(1)).as("w"))
    boruvkaMst(und, rounds = 3)
      .orderBy("u", "v")
  }

  /** Shortest-path counting from a pivot set — the σ (sigma) table of
    * Brandes' betweenness algorithm and the core statistic of any
    * path-redundancy audit: for unweighted BFS, every shortest path to
    * a node first reached at depth d comes through a predecessor at
    * EXACTLY d−1, so synchronous rounds make the count exact —
    * σ(s,v) = Σ σ(s,u) over frontier predecessors. State is
    * (source, node, d, σ); per round one map-side-combined aggregate
    * over the edge partitioning + one anti join against the settled
    * set. Bounded by |sources|·|reachable| like [[multiSourceHops]] —
    * pivots are a sample on unbounded graphs.
    */
  def shortestPathCounts(edges: DataFrame, sources: DataFrame,
                         rounds: Int): DataFrame = {
    // lazy barriers (round-15 verdict item 6): lineage still truncates
    // per round, but the per-round materialization jobs collapse into the
    // consuming action — every consumer is a key join / anti join / sum
    // aggregate, all order-insensitive
    val e = edges.select(col("src"), col("dst")).distinct()
      .repartition(col("src")).localCheckpoint(false)
    var state = sources.select(col("s"), col("s").as("node"),
      lit(0L).as("d"), lit(1L).as("sig")).localCheckpoint(false)
    for (r <- 1 to rounds) {
      val frontier = state.filter(col("d") === (r - 1))
        .select(col("s"), col("node").as("src"), col("sig"))
      val cand = e.join(frontier, "src")
        .groupBy(col("s"), col("dst").as("node"))
        .agg(sum("sig").as("sig"))
      val fresh = cand.join(state.select("s", "node"),
          Seq("s", "node"), "left_anti")
        .select(col("s"), col("node"), lit(r.toLong).as("d"), col("sig"))
      state = state.unionByName(fresh).localCheckpoint(false)
    }
    state
  }

  /** Registered query: the σ matrix of the nation trade graph — exact
    * shortest-path counts between every node pair within 4 hops, from
    * every node as pivot (bounded: ≤ 25 nations). Self rows (d = 0)
    * dropped from the report.
    */
  def graphSPaths(s: SparkSession, dir: String): DataFrame = {
    val e = nationTradeEdges(s, dir).select("src", "dst")
    val nodes = e.select(col("src").as("s"))
      .unionByName(e.select(col("dst").as("s"))).distinct()
    shortestPathCounts(e, nodes, rounds = 4)
      .filter(col("d") > 0)
      .select(col("s").as("src"), col("node"), col("d").as("dist"),
        col("sig").as("paths"))
      .orderBy("src", "node")
  }

  /** Betweenness centrality from a pivot set — Brandes' dependency
    * accumulation (Brandes 2001) run relationally over the
    * [[shortestPathCounts]] σ table: processing depths DESCENDING,
    * `δ(s,v) = Σ_{w succ of v} σ(s,v)/σ(s,w) · (1 + δ(s,w))`, and
    * `B(v) = Σ_{s≠v} δ(s,v)`. One aggregate + two settled-frame joins
    * per depth level, a FIXED number of levels — the per-pivot cost of
    * exact Brandes without any per-node driver state.
    *
    * Determinism (the repo-wide integer-sum discipline): δ carries in
    * integer MICRO-UNITS — each edge contribution is
    * `(σ_v · (10⁶ + δ_w)) div σ_w`, exact 64-bit integer arithmetic —
    * so every per-level and cross-pivot sum is order-independent on any
    * engine. The div-quantization IS the operator's semantics (error
    * ≤ 1 micro-unit per edge per level), encoded identically in the
    * oracle.
    */
  def betweenness(edges: DataFrame, sources: DataFrame,
                  rounds: Int): DataFrame = {
    // lazy barriers (round-15 verdict item 6): the dependency sweep is
    // integer-sum arithmetic end to end, so the only thing eagerness
    // bought was one scheduled job per level — ride the final action
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val st = shortestPathCounts(e, sources, rounds).localCheckpoint(false)
    var delta = st.filter(col("d") === rounds)
      .select(col("s"), col("node"), lit(0L).as("del"))
      .localCheckpoint(false)
    var acc = delta
    for (t <- rounds - 1 to 0 by -1) {
      val vs = st.filter(col("d") === t)
        .select(col("s"), col("node").as("v"), col("sig").as("sigv"))
      val ws = st.filter(col("d") === t + 1)
        .select(col("s"), col("node").as("w"), col("sig").as("sigw"))
      val contrib = vs
        .join(e.select(col("src").as("v"), col("dst").as("w")), "v")
        .join(ws, Seq("s", "w"))
        .join(delta.select(col("s"), col("node").as("w"), col("del")),
          Seq("s", "w"))
        .withColumn("c", expr("(sigv * (1000000 + del)) div sigw"))
        .groupBy(col("s"), col("v").as("node")).agg(sum("c").as("cdel"))
      delta = vs.select(col("s"), col("v").as("node"))
        .join(contrib, Seq("s", "node"), "left_outer")
        .select(col("s"), col("node"),
          coalesce(col("cdel"), lit(0L)).as("del"))
        .localCheckpoint(false)
      acc = acc.unionByName(delta)
    }
    acc.filter(col("node") =!= col("s"))
      .groupBy("node").agg(sum("del").as("bc_micro"))
  }

  /** Registered query: exact-σ Brandes betweenness of the nation trade
    * graph (all 25 nodes as pivots, 4-hop budget — converged at this
    * diameter), ranked most-central first. `bc_micro` is the exact
    * integer; the double is display only.
    */
  def graphBetweenness(s: SparkSession, dir: String): DataFrame = {
    val e = nationTradeEdges(s, dir).select("src", "dst")
    val nodes = e.select(col("src").as("s"))
      .unionByName(e.select(col("dst").as("s"))).distinct()
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    betweenness(e, nodes, rounds = 4)
      .join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("bc_micro"),
        round(col("bc_micro") / 1000000.0, 4).as("bc"))
      .orderBy(col("bc_micro").desc, col("node"))
  }

  /** Connected components by neighbor-min + POINTER DOUBLING — the
    * O(log diameter) scheme (Kiveris et al., "Connected Components in
    * MapReduce and Beyond"; pointer jumping is textbook PRAM): each
    * round first folds every node's neighbors' current labels in
    * (min), then jumps `p(v) ← p(p(v))` via a self-join, so label
    * information travels ~2^r hops after r rounds where plain
    * min-propagation ([[labelPropagation]]) travels r. On a 100 TB
    * graph with a long-path component, diameter rounds are the
    * difference between 15 iterations and 10 000 — doubling is the
    * only shape that survives.
    *
    * Per round: one map-side-combined aggregate over the (re-used) edge
    * partitioning + two key joins; the pointer frame re-materializes
    * per round (the lineage-barrier rule every iterative operator here
    * follows). Labels only decrease, so the fixpoint is the
    * per-component minimum.
    *
    * Contract: components of the EDGE LIST — nodes with no incident
    * edge are out of frame (union a node table back in for singleton
    * components; they'd only dilute every round's joins here).
    */
  def wcc(edges: DataFrame, rounds: Int): DataFrame = {
    // LAZY barriers throughout (round-15 verdict item 6): each
    // localCheckpoint(false) still truncates lineage and pins the frame
    // (the multi-consumer / ambiguous-self-join role is unchanged), but
    // materialization rides the consuming job — the eager form scheduled
    // 2 jobs per doubling round (~19 jobs of ~130 ms fixed cost for an
    // 8-round run whose data work is milliseconds; guide §5). Value
    // safety: every consumer below is an order-insensitive min/count
    // aggregate or key join, so a lazily cached partition racing two
    // concurrent stages cannot change any result.
    val e = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src")).localCheckpoint(false)
    var p = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("p")).localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val nb = e.join(p.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(min("p").as("np"))
      // barriered: feeds both sides of the jump self-join (also keeps
      // the analyzer's ambiguous-self-join check out of the plan)
      val merged = p.join(nb, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("p"), coalesce(col("np"), col("p"))).as("p"))
        .localCheckpoint(false)
      p = merged
        .join(merged.select(col("node").as("p"), col("p").as("pp")),
          Seq("p"), "left_outer")
        .select(col("node"), coalesce(col("pp"), col("p")).as("p"))
        .localCheckpoint(false)
    }
    p
  }

  /** Registered query: components of the part-key CHAIN graph — edges
    * (k, k+1) except across multiples of 97, leaving path components of
    * diameter ~96 that plain per-round propagation cannot close in any
    * reasonable budget while 8 doubling rounds (reach 2^8 = 256 hops)
    * converge with margin. Per component: its min-label root, size, and
    * key span. The oracle unrolls the identical two-step recurrence.
    */
  def graphWcc(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.load(s, dir, "part")
      .select(col("p_partkey").cast("long").as("k"))
    val e = keys.withColumn("nxt", col("k") + 1)
      .filter(col("k") % 97 =!= 0)
      .join(keys.select(col("k").as("nxt")), Seq("nxt"), "left_semi")
      .select(col("k").as("src"), col("nxt").as("dst"))
    wcc(e, rounds = 8)
      .groupBy(col("p").as("component"))
      .agg(count(lit(1)).as("size"),
        min("node").as("lo"), max("node").as("hi"))
      .orderBy("component")
  }

  /** Registered query: EXACT Newman modularity of the label-propagation
    * partition over the part affinity graph — the quality audit every
    * community detection needs (`Q = Σ_c [e_c/m − (d_c/2m)²]`). The
    * whole computation is integer-exact: per community the intra-edge
    * count e_c and degree mass d_c are plain aggregates, and the
    * contribution scales to `4m·e_c − d_c²` over the common denominator
    * 4m² — the only float is the final display division. One edge scan
    * + two label joins + one bounded per-community aggregate.
    */
  def graphModularity(s: SparkSession, dir: String): DataFrame = {
    // brand-size stars ONLY (the type stars bridge everything into one
    // giant community, making Q degenerate-zero): disjoint groups give
    // the partition real structure to score
    val p = Tables.load(s, dir, "part")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand", "p_size")
    val st = p.select(col("p_partkey").cast("long").as("p"),
        min(col("p_partkey").cast("long")).over(w).as("hub"))
      .filter(col("p") =!= col("hub"))
    val und = st
      .select(least(col("p"), col("hub")).as("u"),
        greatest(col("p"), col("hub")).as("v"))
      .distinct()
      .localCheckpoint(false) // feeds m, the label joins, and degrees
    val labels = labelPropagation(
      und.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(und.select(col("v").as("src"), col("u").as("dst"))),
      rounds = 5).localCheckpoint(false)
    val m = und.count()
    val lu = labels.select(col("node").as("u"), col("label").as("cu"))
    val lv = labels.select(col("node").as("v"), col("label").as("cv"))
    val eIn = und.join(lu, "u").join(lv, "v")
      .filter(col("cu") === col("cv"))
      .groupBy(col("cu").as("label")).agg(count(lit(1)).as("e_in"))
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .join(labels, "node")
      .groupBy("label").agg(count(lit(1)).as("d_tot"))
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    sizes.join(deg, "label").join(eIn, Seq("label"), "left_outer")
      .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
      .withColumn("q_num",
        lit(4L) * m * col("e_in") - col("d_tot") * col("d_tot"))
      .withColumn("q_contrib", round(col("q_num").cast("double") /
        (4.0 * m * m), 6))
      .select("label", "n_nodes", "e_in", "d_tot", "q_num", "q_contrib")
      .orderBy("label")
  }

  /** Registered query: neighborhood Jaccard over the part
    * attribute-affinity graph, strongest pairs first.
    */
  def graphJaccard(s: SparkSession, dir: String): DataFrame =
    neighborJaccard(partAffinityEdges(s, dir))
      .select(col("u"), col("v"), col("common"), col("du"), col("dv"),
        col("jaccard"))
      .orderBy(col("jaccard").desc, col("u"), col("v"))
      .limit(100)

  /** Registered query: resource-allocation link prediction (Zhou, Lü &
    * Zhang 2009) over the part-affinity graph — `RA(u,v) = Σ_{z ∈
    * N(u)∩N(v)} 1/deg(z)`, the neighborhood-overlap score that
    * DISCOUNTS promiscuous shared neighbors (a hub connecting everyone
    * predicts nothing; a degree-2 bridge predicts a lot) — the standard
    * log-free sibling of Adamic–Adar, which makes it exactly portable:
    * weights are integer micro-units `1e6 div deg(z)`, so every pair's
    * score is an exact 64-bit sum at any aggregation order (the
    * graph_betweenness discipline). Pairs arise ONLY through shared
    * neighbors under the same ≤64 hub-degree cap-as-semantics as
    * [[neighborJaccard]] — never |V|².
    */
  /** HITS hubs & authorities (Kleinberg 1999) by synchronous power
    * iteration over a weighted directed graph — the query-dependent
    * sibling of [[pageRank]]: a node is a good AUTHORITY when good hubs
    * point at it, a good HUB when it points at good authorities.
    *
    * Determinism contract (the [[betweenness]] integer discipline):
    * instead of the textbook L2 normalization (a sqrt both engines
    * would round differently inside an ITERATED recurrence), every
    * half-step max-normalizes to parts-per-million by exact integer
    * floor division — edge weights first (`w·1e6 div max w`), then each
    * auth/hub frame (`raw·1e6 div max raw`). Every per-round sum is an
    * exact 64-bit integer, so results are bit-identical at any
    * aggregation order, partitioning, or engine. Max-normalization
    * fixes the same degree of freedom L2 does (HITS scores are defined
    * up to scale).
    *
    * Scale shape: the normalized edge frame is computed ONCE,
    * checkpointed, and reused by all `2·rounds` co-partitioned joins;
    * per round only the |V|-sized score frame moves. Bound: each term
    * is ≤ 1e6·1e6 = 1e12, so a node needs in-/out-degree > ~9·10⁶
    * before a raw sum can overflow a Long — beyond that, pre-aggregate
    * parallel edges (this derivation already collapses to one edge per
    * pair).
    */
  def hits(edges: DataFrame, rounds: Int): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    val maxW = e0.agg(max("w").as("mw"))
    val e = e0.crossJoin(broadcast(maxW))
      .select(col("src"), col("dst"),
        expr("CAST(w * 1000000L DIV mw AS BIGINT)").as("wn"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint(false)
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth = nodes.withColumn("a", lit(1000000L))
    // Truncate lineage once per half-round (guide §3.3 / §5
    // localCheckpoint): auth is referenced by hRaw AND aMax AND the next
    // round's joins — without the checkpoint every reference re-plans and
    // re-computes the whole prior subtree, and the 2-round plan explodes
    // to 314 Exchanges / 134 SortMergeJoins (plans/r15/
    // graph_hits_before.txt) with most of the row's cost in
    // planning + duplicated aggregates (measured 3.98 s warm, 15.7 s
    // first-plan; 1.5 s after). The barriers are LAZY since round 16
    // (round-15 verdict item 6): the plan cut is identical, but each
    // half-round's materialization rides its first consumer (usually the
    // max-normalizer's broadcast build) instead of a dedicated job —
    // every consumer is an integer sum/max or key join, order-immune.
    for (_ <- 1 to rounds) {
      val aRaw = e.join(hub.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(sum(expr("wn * h")).as("araw"))
        .localCheckpoint(false)
      val aMax = aRaw.agg(max("araw").as("am"))
      auth = nodes.join(aRaw, Seq("node"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("node"),
          expr("CAST(CAST(coalesce(araw, 0L) AS DECIMAL(38,0)) * 1000000 DIV am AS BIGINT)").as("a"))
        .localCheckpoint(false)
      val hRaw = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(sum(expr("wn * a")).as("hraw"))
        .localCheckpoint(false)
      val hMax = hRaw.agg(max("hraw").as("hm"))
      hub = nodes.join(hRaw, Seq("node"), "left")
        .crossJoin(broadcast(hMax))
        .select(col("node"),
          expr("CAST(CAST(coalesce(hraw, 0L) AS DECIMAL(38,0)) * 1000000 DIV hm AS BIGINT)").as("h"))
        .localCheckpoint(false)
    }
    auth.join(hub, "node")
  }

  /** Strongly connected components — EXACT, via transitive-closure
    * squaring: after k doublings the reach relation holds every pair
    * with a path of length ≤ 2^k, so `doublings = ceil(log2 |V|)` closes
    * any graph; SCC labels then need no iteration at all — v's component
    * is `min{w : reach(v,w) ∧ reach(w,v)}` (self included), one
    * mutual-reach self-join + one min aggregate, definitionally the SCC.
    *
    * Scale tier honesty (the graph_jaccard cap-as-semantics rule): the
    * closure is O(|V|²) rows in the worst case, so each doubling is
    * guarded by `maxClosure` and RAISES with a pointer at the scale
    * path — on huge graphs SCC runs FW-BW peeling (forward/backward
    * min-label with pivot peeling, O(diameter) rounds per peel) instead
    * of materializing a closure; the dense-relation closure is the right
    * plan exactly when the condensed graph is small (here: the ≤625-row
    * nation relation). Each doubling is one co-partitioned self-join +
    * DISTINCT — map-side combined, shuffle keyed on the join column.
    */
  def sccByClosure(edges: DataFrame, doublings: Int = 5,
                   maxClosure: Long = 10000000L): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    // lazy barrier + the convergence count: one job per doubling where
    // the eager form paid two (checkpoint job + count job) — the count
    // is the materializing action (guide §5; round-15 verdict item 6)
    var r = e0.localCheckpoint(false)
    // fixed-point early exit: squaring is monotone, so a doubling that
    // adds no pair means R∘R ⊆ R — already transitively closed
    var prev = r.count()
    var converged = false
    var k = 0
    while (k < doublings && !converged) {
      r = r.unionByName(
          r.select(col("src"), col("dst").as("mid"))
            .join(r.select(col("src").as("mid"), col("dst")), "mid")
            .select(col("src"), col("dst")))
        .distinct()
        .localCheckpoint(false)
      val n = r.count()
      require(n <= maxClosure,
        s"transitive closure reached $n rows (> $maxClosure): this graph " +
          "needs the FW-BW peeling tier, not the dense-closure plan")
      converged = n == prev
      prev = n
      k += 1
    }
    // never return an unclosed relation: if the budget ran out before a
    // no-growth round, one probe squaring must confirm the fixed point
    if (!converged) {
      val probe = r.unionByName(
          r.select(col("src"), col("dst").as("mid"))
            .join(r.select(col("src").as("mid"), col("dst")), "mid")
            .select(col("src"), col("dst")))
        .distinct().count()
      require(probe == prev,
        s"closure not converged after $doublings doublings " +
          s"(grew $prev -> $probe): raise the doubling budget")
    }
    val nodes = e0.select(col("src").as("node"))
      .unionByName(e0.select(col("dst").as("node"))).distinct()
    val c = r.unionByName(nodes.select(col("node").as("src"),
      col("node").as("dst"))).distinct()
    c.join(c.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"))
      .groupBy(col("src").as("node")).agg(min(col("dst")).as("scc_id"))
  }

  /** Registered query: SCC over the sparsified trade digraph (edges
    * above the 70th weight percentile — the graph_triangles rule, kept
    * DIRECTED, so one-way trade relationships break cycles and the
    * component structure is non-trivial).
    */
  def graphScc(s: SparkSession, dir: String): DataFrame = {
    val e0 = nationTradeEdges(s, dir)
    val kept = e0
      .crossJoin(broadcast(e0.agg(expr("percentile(w, 0.7)").as("q"))))
      .filter(col("w") > col("q"))
      .select(col("src"), col("dst"))
    val scc = sccByClosure(kept)
    val sizes = scc.groupBy("scc_id").agg(count(lit(1)).as("scc_size"))
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    scc.join(sizes, "scc_id").join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("scc_id"), col("scc_size"))
      .orderBy("node")
  }

  /** Registered query: 2-round HITS over the nation trade graph
    * (importer nations point at exporter nations, weight = interaction
    * count) — authorities are the dominant EXPORTERS, hubs the dominant
    * IMPORTERS, a reading PageRank's single score conflates.
    */
  def graphHits(s: SparkSession, dir: String): DataFrame = {
    val res = hits(nationTradeEdges(s, dir), rounds = 2)
    val names = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("node"), col("n_name"))
    res.join(broadcast(names), "node")
      .select(col("node"), col("n_name"), col("a").as("auth_ppm"),
        col("h").as("hub_ppm"))
      .orderBy("node")
  }

  def graphRa(s: SparkSession, dir: String): DataFrame = {
    val e = partAffinityEdges(s, dir).select(col("src"), col("dst"))
      .distinct().localCheckpoint(false)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
      .localCheckpoint(false)
    val lowDeg = deg.filter(col("d") <= 64)
      .select(col("src").as("n"), col("d").as("dn"))
    val ef = e.select(col("src").as("u"), col("dst").as("n"))
      .join(lowDeg, "n")
      .withColumn("w", expr("CAST(1000000 DIV dn AS BIGINT)"))
      .localCheckpoint(false) // feeds both sides of the pair join
    ef.join(ef.select(col("u").as("v"), col("n")), "n")
      .filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("common"), sum("w").as("ra_e6"))
      .filter(col("common") >= 2)
      .join(deg.select(col("src").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("src").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("common"), col("du"), col("dv"),
        col("ra_e6"))
      .orderBy(col("ra_e6").desc, col("u"), col("v"))
      .limit(100)
  }
}
