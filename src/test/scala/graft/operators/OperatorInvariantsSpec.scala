package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized invariants across the newer operator families — each test
  * pins a property that must hold for ANY input, not just the oracle
  * corpus (fixed ScalaCheck seeds keep CI deterministic).
  */
class OperatorInvariantsSpec extends SparkTestBase {

  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
  private val docGen = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    .map(_.mkString(" "))

  test("incrementalNew equals the plain anti-join on random corpora") {
    import spark.implicits._
    var seed = Seed(3L)
    for (round <- 1 to 3) {
      val hist = Gen.listOfN(25, docGen).pureApply(Gen.Parameters.default, seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      seed = seed.next
      val batch = Gen.listOfN(25, docGen).pureApply(Gen.Parameters.default, seed)
        .zipWithIndex.map { case (t, i) => (i + 100L, t) }
      seed = seed.next
      val (h, b) = (hist.toDF("doc_id", "text"), batch.toDF("doc_id", "text"))
      // tiny expected count → high false-positive rate → the exact
      // anti-join path does real work (the interesting regime)
      val got = Dedup.incrementalNew(b, h, "doc_id", "text",
          expectedHistoryRows = 10L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val histTexts = hist.map(_._2).toSet
      val want = batch.filterNot(r => histTexts(r._2)).map(_._1).toSet
      assert(got == want, s"round $round")
    }
  }

  test("simhash is invariant to token order and repetition") {
    import spark.implicits._
    val base = "cc aa bb dd"
    val docs = Seq(
      (1L, base),
      (2L, "dd cc bb aa"),       // permutation
      (3L, "aa aa bb cc dd dd")  // repetition
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L) && sigs(2L) == sigs(3L),
      "signature is a function of the distinct token SET")
  }

  test("balanceStrata: every stratum lands exactly at the min stratum size") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, s"s${i % 4}")) ++
      (100L until 110L).map(i => (i, "s_small"))
    val df = rows.toDF("id", "grp")
    val out = Prep.balanceStrata(df, "id", "grp")
      .groupBy("grp").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSize = 10L // s_small
    assert(out.values.toSet == Set(minSize), s"got $out")
    assert(out.keySet == Set("s0", "s1", "s2", "s3", "s_small"))
  }

  test("hashingTf: bucket counts partition the token stream") {
    import spark.implicits._
    var seed = Seed(8L)
    val docs = Gen.listOfN(20, docGen).pureApply(Gen.Parameters.default, seed)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = TextAnalysis.hashingTf(df, "doc_id", "text", dim = 8).collect()
    // Σ tf per doc == token count; every bucket within [0, dim)
    val byDoc = out.groupBy(_.getLong(0))
    docs.foreach { case (id, t) =>
      assert(byDoc(id).map(_.getLong(2)).sum == t.split(" ").length.toLong)
    }
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 8))
  }

  test("packSequences: offsets are gapless and spans cover each doc exactly") {
    import spark.implicits._
    // sparse, non-contiguous ids — the block table has holes
    val docs = Seq(3L, 7L, 4096L, 4100L, 9000L)
      .map(i => (i, Seq.fill((i % 5 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Prep.packSequences(docs, "doc_id", "text", budget = 4)
      .orderBy("doc_id").collect()
    var expectedStart = 0L
    out.foreach { r =>
      assert(r.getLong(2) == expectedStart,
        s"doc ${r.getLong(0)} starts at ${r.getLong(2)}, want $expectedStart")
      expectedStart += r.getLong(1)
      assert(r.getLong(3) == r.getLong(2) / 4)
      assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 4)
    }
  }

  test("embeddingChecks flags every corruption class") {
    import spark.implicits._
    val vecs = Seq(
      ("g", Seq(3.0, 4.0)),                    // clean, norm 5
      ("g", Seq(1.0, 0.0, 0.0)),               // wrong dim
      ("g", Seq(Double.NaN, 1.0)),             // non-finite
      ("g", Seq(0.0, 0.0))                     // zero vector
    ).toDF("grp", "emb")
    val r = Analytics.embeddingChecks(vecs, "grp", "emb", expectDim = 2)
      .collect().head
    assert(r.getLong(1) == 4L)   // n
    assert(r.getLong(2) == 1L)   // bad dim
    assert(r.getLong(3) == 1L)   // non-finite
    assert(r.getLong(4) == 1L)   // zero vector
    assert(r.getDouble(5) == 0.0) // min_norm: the zero vector
    // Spark orders NaN greatest, so the NaN-poisoned norm IS the max —
    // exactly why the non-finite gate must run before any ranking
    assert(r.getDouble(6).isNaN)
  }

  test("softDedupWeights conserves corpus mass; weights invert group sizes") {
    import spark.implicits._
    var seed = Seed(31L)
    for (round <- 1 to 3) {
      val texts = Gen.listOfN(40, docGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val rows = Dedup.softDedupWeights(corpus.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.length == corpus.size, s"round $round: rows lost")
      // Σ weights == number of distinct normalized keys (each group
      // contributes exactly one document's worth of mass, within the
      // 6-dp rounding of the per-row weights)
      val nKeys = rows.map(_._2).zip(rows.map(_._1)).groupBy(_._1).size
      val distinctGroups = Dedup.normalizedDedup(corpus.toDF("doc_id", "text"),
        "doc_id", "text").count()
      val mass = rows.map(_._3).sum
      assert(math.abs(mass - distinctGroups) < 1e-3,
        s"round $round: mass $mass != groups $distinctGroups")
      assert(nKeys >= 1)
    }
  }

  test("mixStrata output proportions match requested weights on random strata") {
    import spark.implicits._
    var seed = Seed(47L)
    val weights = Map("x" -> 0.5, "y" -> 0.3, "z" -> 0.2)
    for (round <- 1 to 3) {
      val sizes = Gen.listOfN(3, Gen.choose(40, 120))
        .pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = weights.keys.toSeq.sorted.zip(sizes).flatMap { case (s, n) =>
        (0 until n).map(i => (s"$s$i".hashCode.toLong & 0xffffff, s))
      }.toDF("id", "s")
      val got = Prep.mixStrata(df, "id", "s", weights)
        .groupBy("s").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = got.values.sum
      // every stratum hits floor(weight × feasible-total) exactly, so the
      // realized proportion is within 1/total of the requested weight
      weights.foreach { case (s, w) =>
        val p = got.getOrElse(s, 0L).toDouble / total
        assert(math.abs(p - w) <= 1.0 / total + 1e-9,
          s"round $round: stratum $s proportion $p vs weight $w")
      }
    }
  }

  test("cdcApply replayed twice is idempotent") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "x", "D"), (4L, "d", "I"))
      .toDF("k", "v", "op")
    val once = Merge.cdcApply(existing, changes, Seq("k"), "op")
    val twice = Merge.cdcApply(once, changes, Seq("k"), "op")
    assert(once.orderBy("k").collect().map(_.toSeq).toSeq ==
      twice.orderBy("k").collect().map(_.toSeq).toSeq)
  }

  test("leakageSafeSplit: no duplicate group ever straddles folds; exact " +
      "duplicates share a group; ratios are near 80/10/10 at group level") {
    import spark.implicits._
    var seed = Seed(11L)
    val base = Gen.listOfN(120, docGen).pureApply(Gen.Parameters.default, seed)
    // plant formatting variants: every 3rd doc re-appears upper-cased
    // with doubled spaces under a new id (same normalized content)
    val docs = (base.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      base.zipWithIndex.collect { case (t, i) if i % 3 == 0 =>
        (1000L + i, t.toUpperCase.replace(" ", "  ")) })
      .toDF("doc_id", "text")
    // salts = 4: ~30 groups per block, so the proportional slot rule's
    // exact-ratio regime is in force even on this small fixture
    val got = Prep.leakageSafeSplit(docs, "doc_id", "text", salts = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every group: exactly one split value
    got.groupBy(_._2).foreach { case (g, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"group $g straddles folds: ${rows.toSeq}")
    }
    // planted variant pairs share the group (and therefore the fold)
    val byId = got.map(r => r._1 -> r._2).toMap
    (0 until 120 by 3).foreach { i =>
      assert(byId(i.toLong) == byId(1000L + i),
        s"variant of doc $i landed in a different group")
    }
    // group-level ratios: proportional slots give 10/10/80 within ±1
    // group per salt block
    val groups = got.map(r => (r._2, r._3)).distinct
    val n = groups.length.toDouble
    val frac = groups.count(_._2 == "train") / n
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac off")
    val testFrac = groups.count(_._2 == "test") / n
    assert(testFrac > 0.04 && testFrac < 0.16, s"test fraction $testFrac off")
  }

  test("bpeEncodeStats: pieces never exceed chars, compression >= 1, " +
      "piece totals conserve the token stream") {
    import spark.implicits._
    var seed = Seed(13L)
    val docs = Gen.listOfN(40, docGen).pureApply(Gen.Parameters.default, seed)
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", rounds = 3)
    val got = TextAnalysis.bpeEncodeStats(docs, "doc_id", "text",
      merges.map(_._2)).collect()
    got.foreach { r =>
      val (nTok, nPieces, nChars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nPieces >= nTok, "every token is at least one piece")
      assert(nPieces <= nChars, "merging never exceeds char count")
      assert(r.getDouble(4) >= 1.0, "compression = chars/pieces >= 1")
    }
    // conservation: total pieces over docs == pieces of the applied vocab
    // weighted by token counts
    val applied = TextAnalysis.bpeApply(docs, "doc_id", "text",
        merges.map(_._2), k = 1000)
      .agg(sum("n_occ")).head().getLong(0)
    assert(got.map(_.getLong(2)).sum == applied,
      "per-doc piece totals must equal the corpus-wide piece count")
  }
}
