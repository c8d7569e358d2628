package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SimilaritySpec extends SparkTestBase {

  test("pqTopK: ADC ranking with in-range codes, monotone per probe") {
    val out = LlmQueries.simPqAnn(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length))
      // approx distance is non-negative and non-decreasing in rank
      val dists = sorted.map(_.getDouble(5))
      assert(dists.forall(_ >= 0.0))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
      // codes come from the 10-label codebooks
      rows.foreach { r =>
        assert(r.getLong(3) >= 0 && r.getLong(3) <= 9)
        assert(r.getLong(4) >= 0 && r.getLong(4) <= 9)
      }
    }
  }

  test("twoStageTopK with an exhaustive candidate set equals brute force") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    // candidates >= |corpus| → stage 1 prunes nothing → exact answer
    val exact = Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    val twoStage = Similarity.twoStageTopK(corpus, probes, "vec_id", "emb",
        prefixDims = 16, candidates = 1000000, k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    assert(twoStage.toSeq == exact.toSeq,
      "an unpruned candidate stage must reduce to brute force")
  }

  test("pqTopK: identical-to-probe corpus vector ranks first") {
    import spark.implicits._
    // plant an exact copy of probe 0's embedding in the corpus: its ADC
    // distance equals the probe's own code distances — the minimum
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val probe0 = e.filter(col("vec_id") === 0).drop("label")
    val corpus = e.filter(col("vec_id") >= 10)
      .unionByName(e.filter(col("vec_id") === 0)
        .select((col("vec_id") + 9999).as("vec_id"), col("label"), col("emb")))
    val half = "CAST(floor(size(emb) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      corpus.select(col("label"), expr(s"slice(emb, 1, $half)").as("emb")),
      "label", "emb")
    val cb2 = Similarity.trainCentroids(
      corpus.select(col("label"),
        expr(s"slice(emb, $half + 1, size(emb) - $half)").as("emb")),
      "label", "emb")
    // ADC(probe, copy) = min over codes of pd1 + pd2 — the global minimum;
    // other candidates may TIE (same codes), but none can beat it
    val all = Similarity.pqTopK(corpus.drop("label"), probe0, cb1, cb2,
        "vec_id", "emb", k = 100000)
      .collect()
    val copyDist = all.find(_.getLong(1) == 9999L).get.getDouble(5)
    val minDist = all.map(_.getDouble(5)).min
    assert(copyDist == minDist,
      s"planted copy must achieve the minimum ADC distance ($copyDist vs $minDist)")
  }

  test("mipsTopK: norm-augmentation reduction gives the identical ranking") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val direct = Similarity.mipsTopK(corpus, probes, "vec_id", "emb", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq).toSeq
    // the reduction: augmented norms are constant M, so augmented-cosine
    // order == inner-product order — the route that feeds cosine ANN
    val (caug, paug) = Similarity.augmentForMips(corpus, probes, "emb")
    val reduced = Similarity.cosineTopK(caug, paug, "vec_id", "emb", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq).toSeq
    assert(reduced == direct,
      "augmented-cosine ANN route must reproduce the exact MIPS ranking")
  }

  test("ivfpqTopK: probed cells, monotone ADC, planted copy wins its cell") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val probe0 = e.filter(col("vec_id") === 0).drop("label")
    // plant an exact copy of probe 0 in the corpus: same coarse cell, same
    // residual, so its codes minimize that cell's ADC table entries
    val corpus = e.filter(col("vec_id") >= 10)
      .unionByName(e.filter(col("vec_id") === 0)
        .select((col("vec_id") + 9999).as("vec_id"), col("label"), col("emb")))
    val coarse = Similarity.trainCentroids(corpus, "label", "emb")
    val res = Similarity.ivfResiduals(corpus, coarse, "emb")
    val half = "CAST(floor(size(res) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      res.select(col("label"), expr(s"slice(res, 1, $half)").as("remb")),
      "label", "remb")
    val cb2 = Similarity.trainCentroids(
      res.select(col("label"),
        expr(s"slice(res, $half + 1, size(res) - $half)").as("remb")),
      "label", "remb")
    val all = Similarity.ivfpqTopK(corpus.drop("label"), probe0, coarse,
        cb1, cb2, "vec_id", "emb", k = 100000, nprobe = 2)
      .collect()
    assert(all.nonEmpty)
    // candidates come from at most nprobe distinct cells
    val cells = all.map(_.getLong(3)).distinct
    assert(cells.length <= 2, s"nprobe=2 must bound the probed cells, got ${cells.length}")
    // ranks are 1..n with non-decreasing ADC distance
    val sorted = all.sortBy(_.getLong(2))
    assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length))
    val dists = sorted.map(_.getDouble(4))
    assert(dists.forall(_ >= 0.0))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    // the planted copy shares the probe's residual, so within ITS cell no
    // candidate can beat its ADC distance (other cells use other tables)
    val copyRow = all.find(_.getLong(1) == 9999L).get
    val cellMin = all.filter(_.getLong(3) == copyRow.getLong(3)).map(_.getDouble(4)).min
    assert(copyRow.getDouble(4) == cellMin,
      s"planted copy must achieve its cell's ADC minimum (${copyRow.getDouble(4)} vs $cellMin)")
  }

  test("pqTopK: gapped / non-zero-based codebook cids rank identically") {
    // shifting and gapping the labels must not change the ADC ranking —
    // the lookup is positional, labels only surface in the output codes
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val half = "CAST(floor(size(emb) / 2) AS INT)"
    def codebooks(c: org.apache.spark.sql.DataFrame) = (
      Similarity.trainCentroids(
        c.select(col("label"), expr(s"slice(emb, 1, $half)").as("emb")),
        "label", "emb"),
      Similarity.trainCentroids(
        c.select(col("label"),
          expr(s"slice(emb, $half + 1, size(emb) - $half)").as("emb")),
        "label", "emb"))
    val (cb1, cb2) = codebooks(corpus)
    // same clustering, labels remapped to 107, 114, 121, ... (gapped, shifted)
    val (gb1, gb2) = codebooks(corpus.withColumn("label", col("label") * 7 + 100))
    val base = Similarity.pqTopK(corpus.drop("label"), probes, cb1, cb2,
        "vec_id", "emb", k = 2)
      .select("probe_id", "neighbor_id", "rn", "approx_dist")
      .orderBy("probe_id", "rn").collect().map(_.toSeq).toSeq
    val gapped = Similarity.pqTopK(corpus.drop("label"), probes, gb1, gb2,
        "vec_id", "emb", k = 2)
    assert(gapped.select("probe_id", "neighbor_id", "rn", "approx_dist")
      .orderBy("probe_id", "rn").collect().map(_.toSeq).toSeq == base,
      "ranking must be invariant to the cid labeling")
    // and the output codes surface the ORIGINAL (remapped) cids
    val codes = gapped.select("c1").distinct().collect().map(_.getLong(0))
    assert(codes.forall(c => c >= 100 && (c - 100) % 7 == 0),
      s"output codes must be the caller's cids, got ${codes.mkString(",")}")
  }

  test("exact-tier probe guard raises past maxProbes, passes under it") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 5) // 5 probes
    // under the cap: normal result
    assert(Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 2,
      maxProbes = 5).count() > 0)
    // over the cap: the lazy guard raises AT EXECUTION, mentioning the dial
    for (df <- Seq(
        Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 2, maxProbes = 4),
        Similarity.mipsTopK(corpus, probes, "vec_id", "emb", k = 2, maxProbes = 4),
        Similarity.l2TopK(corpus, probes, "vec_id", "emb", k = 2, maxProbes = 4),
        Similarity.rangeSearch(corpus, probes, "vec_id", "emb", 0.9, maxProbes = 4),
        Similarity.twoStageTopK(corpus, probes, "vec_id", "emb", 4, 10, 2,
          maxProbes = 4))) {
      val ex = intercept[Exception](df.collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("maxProbes")),
        s"guard must name the dial: ${msgs(ex)}")
    }
  }

  test("sqTopK: symmetric int8 codes bounded -128..127, ranking equals " +
      "brute force, recall@1 vs exact dot is high, guard present, " +
      "all-zero corpus codes to zero") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 5)
    val got = Similarity.sqTopK(corpus, probes, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // brute-force recomputation from raw floats (same formula)
    val cRows = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val pRows = probes.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val maxAbs = cRows.flatMap(_._2).map(math.abs).max
    def code(v: Array[Double]): Array[Long] =
      v.map { x =>
        if (maxAbs == 0.0) 0L
        else math.min(127L, math.max(-128L,
          math.floor(x / maxAbs * 128.0).toLong))
      }
    val cCodes = cRows.map { case (id, v) => id -> code(v) }
    val expected = pRows.flatMap { case (pid, pv) =>
      val pc = code(pv)
      assert(pc.forall(q => q >= -128 && q <= 127))
      cCodes.filter(_._1 != pid)
        .map { case (cid, cc) =>
          (cid, cc.zip(pc).map { case (a, b) => a * b }.sum) }
        .sortBy { case (cid, qd) => (-qd, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, qd), i) => (pid, cid, (i + 1).toLong, qd) }
    }.toSet
    assert(got.toSet == expected,
      "distributed SQ ranking must equal the driver-side brute force")
    // the symmetric scheme tracks the exact dot: recall@1 over the probe
    // set must be substantially non-zero (the per-dimension AFFINE code
    // variant measured 0.0 here — the regression this guards against)
    val exactTop = pRows.map { case (pid, pv) =>
      pid -> cRows.filter(_._1 != pid)
        .map { case (cid, cv) =>
          (cid, cv.zip(pv).map { case (a, b) => a * b }.sum) }
        .maxBy { case (cid, d) => (d, -cid) }._1
    }.toMap
    val sqTop = got.filter(_._3 == 1L).map(r => r._1 -> r._2).toMap
    val hits = exactTop.count { case (pid, t) => sqTop.get(pid).contains(t) }
    assert(hits * 2 >= exactTop.size,
      s"SQ recall@1 collapsed: $hits/${exactTop.size}")
    // exact-tier guard applies
    val ex = intercept[Exception](
      Similarity.sqTopK(corpus, probes, "vec_id", "embedding", k = 3,
        maxProbes = 4).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxProbes")))
    // an all-zero corpus codes to 0 everywhere
    val zero = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding"))
    val zq = Similarity.sqTopK(zero, zero.limit(2), "vec_id", "embedding",
      k = 1).collect()
    assert(zq.forall(_.getLong(3) == 0L), "all-zero corpus must code to 0")
  }

  test("every broadcast-probe operator carries the probe guard: the PQ " +
      "forms, both IVF forms and LSH raise past their maxProbes") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.drop("label")
    val probes = corpus.filter(col("vec_id") < 5) // 5 probes, cap at 4
    val coarse = Similarity.trainCentroids(e, "label", "emb")
    val cb1 = Similarity.trainCentroids(
      e.select(col("vec_id"), col("label"),
        expr("slice(emb, 1, CAST(floor(size(emb) / 2) AS INT))").as("emb")),
      "label", "emb")
    val cb2 = Similarity.trainCentroids(
      e.select(col("vec_id"), col("label"),
        expr("slice(emb, CAST(floor(size(emb) / 2) AS INT) + 1, size(emb))").as("emb")),
      "label", "emb")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (df <- Seq(
        Similarity.pqTopK(corpus, probes, cb1, cb2, "vec_id", "emb", k = 2,
          maxProbes = 4),
        Similarity.ivfTopK(corpus, probes, coarse, "vec_id", "emb", k = 2,
          maxProbes = 4),
        Similarity.ivfTopKNprobe(corpus, probes, coarse, "vec_id", "emb",
          k = 2, nprobe = 2, maxProbes = 4),
        Similarity.ivfpqTopK(corpus, probes, coarse, cb1, cb2, "vec_id",
          "emb", k = 2, nprobe = 2, maxProbes = 4),
        Similarity.lshTopK(corpus, probes, "vec_id", "emb", bits = 4,
          k = 2, maxProbes = 4))) {
      val ex = intercept[Exception](df.collect())
      assert(msgs(ex).exists(_.contains("maxProbes")),
        s"guard must name the dial: ${msgs(ex)}")
    }
    // and under the cap the same operators still answer
    assert(Similarity.ivfTopK(corpus, probes, coarse, "vec_id", "emb",
      k = 2, maxProbes = 5).count() > 0)
    assert(Similarity.lshTopK(corpus, probes, "vec_id", "emb", bits = 2,
      k = 2, maxProbes = 5).count() > 0)
  }

  test("ivfAssign broadcast path equals the literal path, and large " +
      "codebooks route to it") {
    import spark.implicits._
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val cents = Similarity.trainCentroids(e, "label", "emb")
    val corpus = e.drop("label")
    // small codebook: default gate takes the literal path; the broadcast
    // formulation must produce the identical assignment (same tie-break)
    val viaLit = Similarity.ivfAssign(corpus, cents, "vec_id", "emb")
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaBc = Similarity.ivfAssignBroadcast(corpus, cents, "vec_id", "emb")
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaLit == viaBc)
    // large codebook (k = 2048 × 16 dims ≈ 330 KB > the 64 KB literal
    // cap): the gate must route to the broadcast path — the plan carries
    // a broadcast exchange and partial aggregation, not a megabyte
    // literal serialized into every task
    val bigCents = spark.range(2048).select(col("id").cast("int").as("cid"),
        expr("transform(sequence(1, 16), j -> CAST(id * 31 + j AS DOUBLE) / 65536.0)").as("cemb"))
      .localCheckpoint(true)
    val assigned = Similarity.ivfAssign(corpus.limit(50), bigCents, "vec_id", "emb")
    val p = assigned.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"large codebook must broadcast, not inline:\n${p.take(2000)}")
    assert(p.length < 200000, "no megabyte codebook literal in the plan")
    assert(assigned.count() == 50 &&
      assigned.select("cid").distinct().count() >= 1)
  }

  test("maxSimTopK: an exact copy scores m, late interaction beats pooled " +
      "cosine on a permuted match, local recompute agrees") {
    import spark.implicits._
    // probe 1: 4 sub-vectors of dim 2. cand 10 = exact copy (maxsim = 4);
    // cand 11 = the SAME sub-vectors in a different order (pooled cosine
    // drops, maxsim stays 4 — the late-interaction point); cand 12 =
    // unrelated (every sub-vector orthogonal-ish to the probe's).
    val q = Array(1.0f, 0f, 0f, 1f, 1f, 1f, 2f, 0f)
    val perm = Array(0f, 1f, 1f, 0f, 2f, 0f, 1f, 1f) // sub-vectors permuted
    val other = Array(0f, -1f, -1f, 0f, 0f, -2f, -1f, 1f)
    val df = Seq((1L, q), (10L, q.clone), (11L, perm), (12L, other))
      .toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(
        df.filter(col("vec_id") >= 10), df.filter(col("vec_id") < 10),
        "vec_id", "embedding", m = 4, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 3)
    // copies (exact and permuted) both score exactly m = 4
    assert(got(0) === ((10L, 1L, 4.0)))
    assert(got(1) === ((11L, 2L, 4.0)))
    assert(got(2)._1 === 12L && got(2)._3 < 4.0)
    // pooled full-vector cosine CANNOT give the permuted copy a perfect
    // score — that separation is what maxsim buys
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos(q, perm) < 0.999)
    // registered query agrees with a driver-side recompute at sf0.001
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def maxsim(p: Array[Float], c: Array[Float]): Double =
      (0 until 8).map { i =>
        (0 until 8).map { j =>
          cos(p.slice(i * 8, i * 8 + 8), c.slice(j * 8, j * 8 + 8))
        }.max
      }.sum
    val reg = LlmQueries.simMaxsim(spark, sfDir).collect()
    reg.foreach { r =>
      val want = maxsim(e(r.getLong(0)), e(r.getLong(1)))
      assert(math.abs(r.getDouble(3) - want) < 1e-3,
        s"probe ${r.getLong(0)} cand ${r.getLong(1)}: ${r.getDouble(3)} vs $want")
    }
  }

  test("mmrRerank: greedy argmax law per step vs brute force; step 1 is " +
      "the relevance top-1; diversity beats a near-duplicate pool") {
    import spark.implicits._
    // probe between two clusters: candidates 10/11 near-dups along e1,
    // 12 along e2 (equally relevant, diverse), 13 irrelevant
    val pe = Seq(1.0, 1.0, 0.0)
    val e = Map(
      10L -> Seq(1.0, 0.05, 0.0),
      11L -> Seq(1.0, 0.0, 0.02),   // near-dup of 10
      12L -> Seq(0.02, 1.0, 0.0),   // diverse, equally relevant
      13L -> Seq(0.0, 0.01, 1.0))   // irrelevant
    val probe = Seq((0L, pe)).toDF("vec_id", "emb")
    val cands = e.toSeq.map { case (k, v) => (k, v) }.toDF("vec_id", "emb")
    val got = Similarity.mmrRerank(cands, probe, "vec_id", "emb",
        poolK = 4, k = 3).collect()
      .sortBy(_.getInt(2)).map(r => (r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).distinct.length == 3, "picks must be distinct")
    assert(got(0)._1 == 10L, "step 1 = relevance top-1")
    assert(got(1)._1 == 12L,
      "step 2 must prefer the diverse candidate over the near-dup")
    // brute-force the greedy recurrence on the same vectors
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    var sel = List(e.keys.maxBy(k => (cos(pe, e(k)), -k)))
    for (_ <- 2 to 3) {
      val pick = e.keys.filterNot(sel.contains).maxBy { c =>
        (0.7 * cos(pe, e(c)) - 0.3 * sel.map(s => cos(e(c), e(s))).max, -c)
      }
      sel = sel :+ pick
    }
    assert(got.map(_._1).toList == sel, s"greedy law: $sel")
  }

  test("hnswLiteTopK: on planted clusters the beam finds the exact NN; " +
      "output is one deterministic row per probe") {
    import spark.implicits._
    // 4 tight clusters in 8-d; cluster sign patterns differ in the
    // first dims so the bucket machinery separates them, and every
    // member is closest to its own cluster — the graph search must land
    // on the exact nearest member, not just any cluster-mate
    val rnd = new scala.util.Random(42)
    def member(center: Array[Double], i: Int): Seq[Double] =
      center.zipWithIndex.map { case (c, d) =>
        c + 0.01 * ((i * 7 + d * 3) % 5)
      }.toSeq
    val centers = Seq(
      Array(1.0, 1.0, 1.0, 1.0, 0.3, -0.2, 0.1, 0.4),
      Array(-1.0, 1.0, -1.0, 1.0, 0.2, 0.3, -0.1, 0.2),
      Array(1.0, -1.0, 1.0, -1.0, -0.3, 0.2, 0.4, -0.1),
      Array(-1.0, -1.0, -1.0, -1.0, 0.1, -0.3, 0.2, 0.3))
    val corpus = (0 until 64).map { i =>
      (16L + i, member(centers(i % 4), i / 4))
    }.toDF("vec_id", "emb")
    val probes = (0 until 4).map { c =>
      (c.toLong, member(centers(c), 99 + c))
    }.toDF("vec_id", "emb")
    val truth = Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val ann = Similarity.hnswLiteTopK(corpus, probes, "vec_id", "emb")
    val joined = truth.join(ann, Seq("probe_id")).collect()
    assert(joined.length == 4, "one row per probe")
    joined.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") == r.getAs[Long]("true_nn"),
        s"probe ${r.getAs[Long]("probe_id")}: beam must land on the exact NN")
    }
    // determinism: a second run returns the identical rows
    val again = Similarity.hnswLiteTopK(corpus, probes, "vec_id", "emb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(again ==
      ann.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("filteredCosineTopK: every neighbor shares the probe's label, and " +
      "per probe the result equals plain cosineTopK over the " +
      "label-restricted corpus") {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    val probes = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val got = Similarity.filteredCosineTopK(corpus, probes, "vec_id",
        "embedding", "label", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    val probeLabel = probes.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    got.foreach { case (pid, _, lbl, _, _) =>
      assert(lbl == probeLabel(pid), s"probe $pid neighbor label $lbl") }
    // per-probe parity with the unfiltered scorer on the scoped corpus
    probeLabel.foreach { case (pid, lbl) =>
      val scoped = Similarity.cosineTopK(
          corpus.filter(col("label") === lbl),
          probes.filter(col("vec_id") === pid), "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val mine = got.filter(_._1 == pid)
        .map(t => (t._1, t._2, t._4, t._5)).toSet
      assert(mine == scoped, s"probe $pid")
    }
  }

  test("filteredIvfTopK: every neighbor shares the probe's label, and a " +
      "single-cell codebook reduces it to the exact filtered ranking") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    val got = Similarity.filteredIvfTopK(corpus, probes, cents,
      "vec_id", "emb", "label", k = 3).collect()
    assert(got.nonEmpty)
    val probeLabel = probes.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      assert(r.getInt(2) == probeLabel(r.getLong(0)),
        s"probe ${r.getLong(0)} neighbor label ${r.getInt(2)}")
    }
    // one cell → the cell prunes nothing → exact filtered ranking
    val oneCell = cents.filter(col("cid") === 0)
    val reduced = Similarity.filteredIvfTopK(corpus, probes, oneCell,
        "vec_id", "emb", "label", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    val exact = Similarity.filteredCosineTopK(corpus, probes,
        "vec_id", "emb", "label", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    assert(reduced.toSeq == exact.toSeq,
      "an unpruning single-cell codebook must reduce to exact filtered")
  }

  test("rangeSearchIvf: in-cell pairs are a SUBSET of the exact radius " +
      "set, and a single-cell codebook recovers it exactly") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.rangeSearch(corpus.drop("label"), probes,
      "vec_id", "emb", minCos = 0.25))
    val bucketed = pairs(Similarity.rangeSearchIvf(corpus.drop("label"),
      probes, cents, "vec_id", "emb", minCos = 0.25))
    assert(bucketed.nonEmpty && bucketed.subsetOf(exact),
      "cell bucketing may only REMOVE pairs, never invent them")
    val oneCell = pairs(Similarity.rangeSearchIvf(corpus.drop("label"),
      probes, cents.filter(col("cid") === 0), "vec_id", "emb",
      minCos = 0.25))
    assert(oneCell == exact,
      "an unpruning single-cell codebook must equal the exact radius set")
  }

  test("bqTopK: midrange sign codes + hamming shortlist + exact rerank " +
      "equals the driver-side brute force; an unpruned shortlist reduces " +
      "to exact MIPS; guard present") {
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 5)
    val got = Similarity.bqTopK(corpus, probes, "vec_id", "embedding", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // driver-side brute force: same midrange thresholds, same packing,
    // same (hamming, id) shortlist of 32, same (dot desc, id) rerank
    val cRows = corpus.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val pRows = probes.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val dims = cRows.head._2.length
    val mid = (0 until dims).map { d =>
      val vs = cRows.map(_._2(d)); (vs.min + vs.max) / 2.0
    }
    def words(v: Array[Double]): Array[Long] =
      (0 until (dims + 31) / 32).map { w =>
        (0 until 32).foldLeft(0L) { (acc, j) =>
          val i = w * 32 + j
          if (i < dims && v(i) > mid(i)) acc | (1L << j) else acc
        }
      }.toArray
    val cw = cRows.map { case (id, v) => (id, v, words(v)) }
    val expected = pRows.flatMap { case (pid, pv) =>
      val pwds = words(pv)
      cw.filter(_._1 != pid)
        .map { case (cid, cv, cwd) =>
          (cid, cv, cwd.zip(pwds)
            .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum) }
        .sortBy { case (cid, _, h) => (h, cid) }.take(32)
        .map { case (cid, cv, h) =>
          (cid, h, cv.zip(pv).map { case (a, b) => a * b }.sum) }
        .sortBy { case (cid, _, ip) => (-ip, cid) }
        .take(3).zipWithIndex
        .map { case ((cid, h, _), i) => (pid, cid, (i + 1).toLong, h.toLong) }
    }.toSet
    assert(got.toSet == expected,
      "distributed BQ ranking must equal the driver-side brute force")
    // shortlist >= |corpus| → hamming prunes nothing → exact MIPS order
    val un = Similarity.bqTopK(corpus, probes, "vec_id", "embedding",
        k = 3, cand = 1000000)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    val mips = Similarity.mipsTopK(corpus, probes, "vec_id", "embedding", k = 3)
      .select("probe_id", "neighbor_id", "rn")
      .orderBy("probe_id", "rn").collect().map(_.toSeq)
    assert(un.toSeq == mips.toSeq,
      "an unpruned hamming stage must reduce to exact MIPS")
    // exact-tier guard applies
    val ex = intercept[Exception](
      Similarity.bqTopK(corpus, probes, "vec_id", "embedding", k = 3,
        maxProbes = 2).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxProbes")))
  }
}
