package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  test("connected components closes a long chain (pointer jumping, " +
      "iterative path forced)") {
    import spark.implicits._
    // a 500-link path — plain O(diameter) label propagation cannot close
    // this inside any small round budget; the pointer-jumping shortcut
    // must (O(log diameter) rounds). driverMaxEdges = 0 forces the
    // distributed loop — the default would solve this on the driver.
    val chain = (0L until 500L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(chain, driverMaxEdges = 0L)
    assert(labels.count() == 501)
    assert(labels.select("comp").distinct().count() == 1, "one component")
    assert(labels.agg(max("comp")).head().getLong(0) == 0L, "min-id label")
  }

  test("connected components keeps disjoint components apart (both paths)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
      .toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    for (threshold <- Seq(0L, 5000000L)) {
      val got = Dedup.connectedComponents(pairs, driverMaxEdges = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"driverMaxEdges=$threshold")
    }
  }

  test("connected components refuses to return split labels") {
    import spark.implicits._
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2, driverMaxEdges = 0L).count()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("simhash: bit-packed signature matches a per-bit recomputation") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val got = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical docs → identical signatures; disjoint vocab → different
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    // recompute doc 1's signature directly from the definition
    val hs = Seq("alpha", "beta", "gamma").map { t =>
      docs.sparkSession.range(1)
        .select(graft.operators.Hashing.md5Long(lit(t))).head().getLong(0)
    }
    val expected = (0 until 32).map { i =>
      val vote = hs.map(h => if (((h >> i) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << i else 0L
    }.sum
    assert(got(1L) == expected)
  }

  test("incrementalNearDupPairs: delta pairs only, equal to filtered batch") {
    import spark.implicits._
    val lake = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // old×old dup pair
      (3L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (100L, "a b c d e f g"), // near-dup of 1 and 2
      (101L, "x y z x y z x y")
    ).toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDupPairs(lake, delta, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every emitted pair involves a delta doc; the (1,2) lake dup is
    // someone else's (previous run's) work and must NOT re-surface
    assert(inc.forall { case (a, b, _) => a >= 100L || b >= 100L },
      s"old-only pair leaked: $inc")
    assert(inc.exists(p => p._1 == 1L && p._2 == 100L))
    assert(inc.exists(p => p._1 == 2L && p._2 == 100L))
    // and it equals the batch operator's answer filtered to delta pairs
    val batch = Dedup.nearDupPairs(lake.unionByName(delta), "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a >= 100L || b >= 100L }.toSet
    assert(inc == batch, s"incremental must match filtered batch: $inc vs $batch")
  }

  test("softDedupWeights: group weights sum to one document each, no row lost") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Same Doc!"), (2L, "same doc"), (3L, "SAME   DOC"),
      (4L, "unique one")
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "no row may be dropped")
    assert(got(1L) == ((3L, 0.333333)) && got(2L) == got(1L) && got(3L) == got(1L))
    assert(got(4L) == ((1L, 1.0)))
  }

  test("containmentPairs: finds doc-in-doc wrap that Jaccard misses") {
    import spark.implicits._
    // b = a wrapped in boilerplate: containment 1.0, Jaccard well below;
    // c is unrelated
    val a = "q w e r t y u i o p"
    val docs = Seq(
      (1L, a),
      (2L, s"x1 x2 x3 x4 x5 x6 $a y1 y2 y3 y4 y5 y6"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)),
      s"wrap pair must surface at containment 1.0: ${got.toSeq}")
    // and the same pair is BELOW a 0.5 Jaccard near-dup threshold —
    // the gap containment dedup exists to close
    val jac = Dedup.blockedJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "Jaccard at 0.5 must not see the wrapped pair")
  }

  test("containmentPairs: a tiny doc (fewer shingles than minKeys) still " +
      "surfaces its containment-1.0 wrap pair") {
    import spark.implicits._
    // doc 1 has THREE tokens → exactly ONE distinct shingle, below the
    // default minKeys = 2 floor; a flat floor could never admit its pair
    // with the wrapping doc 2, but the capped floor
    // least(minKeys, |smaller bottom-k set|) must
    val docs = Seq(
      (1L, "q w e"),
      (2L, s"x1 x2 x3 x4 x5 x6 q w e y1 y2 y3 y4 y5 y6"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z0")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)),
      s"tiny-doc wrap pair must surface at containment 1.0: ${got.toSeq}")
  }

  test("bandingForThreshold picks the divisor with the closest S-curve midpoint") {
    // midpoints for 16 hashes: r=1→0.0625, r=2→0.354, r=4→0.707,
    // r=8→0.917, r=16→1.0
    assert(Dedup.bandingForThreshold(16, 0.5) == 2)
    assert(Dedup.bandingForThreshold(16, 0.7) == 4)
    assert(Dedup.bandingForThreshold(16, 0.9) == 8)
    assert(Dedup.bandingForThreshold(8, 0.5) == 2) // r=2→0.5 exactly
    // exhaustive check of the minimization contract
    for (n <- Seq(8, 16, 32); t <- Seq(0.2, 0.5, 0.8)) {
      val got = Dedup.bandingForThreshold(n, t)
      def mid(r: Int) = math.pow(1.0 / (n / r), 1.0 / r)
      val best = (1 to n).filter(n % _ == 0).map(r => math.abs(mid(r) - t)).min
      assert(math.abs(mid(got) - t) == best)
    }
  }

  test("deltaNearDupPairs on precomputed lake signatures equals the " +
      "in-run incremental form") {
    import spark.implicits._
    val lake = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g x"),
      (3L, "m n o p q r s t")).toDF("doc_id", "text")
    val delta = Seq(
      (100L, "a b c d e f g h i"), (101L, "completely new doc here j k"))
      .toDF("doc_id", "text")
    val viaSig = Dedup.deltaNearDupPairs(
        Dedup.minhashSignatures(lake, "doc_id", "text").localCheckpoint(true),
        delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inRun = Dedup.incrementalNearDupPairs(lake, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSig == inRun, s"$viaSig vs $inRun")
    assert(viaSig.forall { case (a, b, _) => a >= 100L || b >= 100L },
      "every emitted pair must involve a delta doc")
    assert(viaSig.nonEmpty, "the near-identical delta doc must pair with the lake")
  }

  test("normalizedDedup: formatting variants collapse onto the original") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello   world"), (3L, "HELLO WORLD."),
      (4L, "a different doc"), (5L, "A DIFFERENT DOC")
    ).toDF("doc_id", "text")
    val got = Dedup.normalizedDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2,3 share the normalized key "hello world"; 4,5 share theirs
    assert(got == Map(1L -> 3L, 4L -> 2L))
  }

  test("semanticDedup: drops within-cluster near-dups, keeps min id, " +
      "never compares across clusters") {
    import spark.implicits._
    // two well-separated clusters on orthogonal axes; ids 1,2 are
    // near-identical (cos ≈ 1) in cluster A; id 3 is cluster A but far
    // (cos < τ from both); ids 10,11 near-identical in cluster B
    val vecs = Seq(
      (1L, Seq(1.0, 0.01, 0.0)), (2L, Seq(1.0, 0.011, 0.0)),
      (3L, Seq(0.7, 0.714, 0.0)),
      (10L, Seq(0.0, 0.01, 1.0)), (11L, Seq(0.0, 0.011, 1.0))
    ).toDF("id", "emb")
    val cents = Seq((0, Seq(1.0, 0.2, 0.0)), (1, Seq(0.0, 0.2, 1.0)))
      .toDF("cid", "cemb")
    val got = Dedup.semanticDedup(vecs, cents, "id", "emb", threshold = 0.995)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 2 dropped (near-dup of 1), 11 dropped (near-dup of 10); 1,3,10 stay
    assert(got == Map(1L -> 0, 3L -> 0, 10L -> 1))
  }

  test("duplicateSpans: diagonal islands localize each shared run; two " +
      "disjoint runs never merge; short overlaps stay out") {
    import spark.implicits._
    val t = (1 to 20).map(i => s"t$i")
    val d1 = t.mkString(" ")
    // d2 embeds d1's t5..t14 at a different offset (diagonal ≠ 0)
    val d2 = (Seq("x1", "x2", "x3") ++ t.slice(4, 14) ++ Seq("y1", "y2"))
      .mkString(" ")
    // d3 shares TWO disjoint runs with d1 (9 tokens each, distinct diagonals)
    val d3 = (t.take(9) ++ Seq("z1", "z2", "z3") ++ t.slice(11, 20))
      .mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("id", "text")
    val got = Dedup.duplicateSpans(docs, "id", "text",
        n = 4, minRun = 5, maxDf = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((1L, 2L))._1 == 10L, "embedded copy found at its true length")
    assert(got((1L, 3L)) == ((9L, 12L)),
      "two 9-token runs: longest 9 (never merged to 18+), 6+6 distinct grams")
    assert(got((2L, 3L)) == ((5L, 2L)),
      "5-token t5..t9 intersection; the 3-token t12..t14 overlap has no 4-gram")
    assert(got.size == 3)
  }

  test("duplicateSpans: over-frequent grams are capped out (boilerplate guard)") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i")
    val docs = (0 until 3).map { i =>
      (10L + i, (boiler ++ Seq(s"u${i}a", s"u${i}b", s"u${i}c")).mkString(" "))
    }.toDF("id", "text")
    // the boilerplate grams sit in 3 docs: admitted at maxDf=64...
    assert(Dedup.duplicateSpans(docs, "id", "text", n = 4, minRun = 5,
      maxDf = 64).count() == 3)
    // ...and suppressed at maxDf=2, leaving no pair (unique tails share nothing)
    assert(Dedup.duplicateSpans(docs, "id", "text", n = 4, minRun = 5,
      maxDf = 2).count() == 0)
  }

  test("spanRemoval: the min-id copy keeps its text, later copies lose " +
      "exactly the duplicated window, untouched docs emit nothing, a " +
      "fully-duplicated doc vanishes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shared = (1 to 8).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared alpha beta gamma"),        // keeper: kept whole
      (2L, s"pre1 pre2 $shared post1 post2"),   // loses the 8 dup tokens
      (3L, shared),                             // fully duplicated: vanishes
      (4L, "totally unrelated text here"))      // untouched: no row
      .toDF("doc_id", "text")
    val got = Dedup.spanRemoval(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // only docs 2 (partial removal) appear: 1 is the keeper, 3 fully
    // vanishes, 4 untouched
    assert(got.keySet == Set(2L), got.toString)
    val (nTok, nRem, fp) = got(2L)
    assert(nTok == 12 && nRem == 8)
    val expectKept = "pre1 pre2 post1 post2"
    assert(fp == java.security.MessageDigest.getInstance("MD5")
      .digest(expectKept.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString, "kept fingerprint")
  }

  test("prefixDups: chains resolve via the sorted-successor property, " +
      "exact dups flag is_exact, unrelated texts stay silent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "abcdefgh-full-text"), (2L, "abcdefgh"), (3L, "abcdefgh-full"),
      (4L, "zzzz-unrelated"),
      (5L, "qqqqqqqq-same"), (6L, "qqqqqqqq-same")).toDF("doc_id", "text")
    val got = Dedup.prefixDups(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    // 2 ("abcdefgh") precedes 3 ("abcdefgh-full") precedes 1 — each
    // link in the chain is its own flagged row
    assert(got(2L) == ((3L, 8L, false)))
    assert(got(3L) == ((1L, 13L, false)))
    assert(got(5L) == ((6L, 13L, true)), "byte-identical pair is exact")
    assert(!got.contains(1L) && !got.contains(4L) && !got.contains(6L))
  }
}
