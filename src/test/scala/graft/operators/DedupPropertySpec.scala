package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized invariants of the MinHash-LSH pipeline:
  *
  *   - RECALL floor: an exact duplicate has an identical shingle set,
  *     hence an identical signature, hence collides in EVERY band — LSH
  *     must always emit the pair (probabilistic recall only applies below
  *     jaccard 1.0).
  *   - SOUNDNESS: every emitted pair's jaccard must equal the true
  *     set-jaccard of the two docs (recomputed in plain Scala) and clear
  *     the threshold — the verify stage is exact, never sketch-valued.
  *   - exactKeepMin: groups partition the corpus (dup counts sum to corpus
  *     size) and the keeper is the minimum id of its group.
  */
class DedupPropertySpec extends SparkTestBase {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private val docGen = Gen.choose(6, 14)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    .map(_.mkString(" "))

  private def shingles(text: String, n: Int = 3): Set[String] = {
    val tk = text.split(" ")
    if (tk.length < n) Set.empty
    else tk.sliding(n).map(_.mkString(" ")).toSet
  }

  test("LSH always finds exact duplicates; emitted jaccard values are exact") {
    import spark.implicits._
    var seed = Seed(77L)
    for (round <- 1 to 3) {
      val texts = Gen.listOfN(30, docGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // ids 100+: exact copies of the first 10 docs
      val corpus = base ++ base.take(10).map { case (i, t) => (i + 100L, t) }
      val byId = corpus.toMap
      val pairs = Dedup.nearDupPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

      // recall floor: every (i, i+100) exact-dup pair must be present —
      // unless the doc's shingle set collides with nothing because the
      // doc is shorter than the shingle width (impossible here: >= 6 toks)
      val found = pairs.map(p => (p._1, p._2)).toSet
      for (i <- 0L until 10L)
        assert(found.contains((i, i + 100L)),
          s"round $round: exact duplicate pair ($i, ${i + 100}) missed")

      // soundness: emitted jaccard == true set jaccard, >= threshold
      pairs.foreach { case (a, b, j) =>
        val (sa, sb) = (shingles(byId(a)), shingles(byId(b)))
        val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
        assert(math.abs(j - math.rint(trueJ * 10000) / 10000) < 1e-9,
          s"round $round: pair ($a,$b) emitted $j, true $trueJ")
        assert(trueJ >= 0.5)
      }
    }
  }

  test("duplicateSpans equals brute-force token-level longest-common-" +
      "substring on random small-vocab corpora") {
    import spark.implicits._
    def lcsRun(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    def grams4(a: Array[String]): Set[String] =
      if (a.length < 4) Set.empty else a.sliding(4).map(_.mkString(" ")).toSet
    var seed = Seed(101L)
    for (round <- 1 to 3) {
      // 10-word vocab → many chance 4-gram collisions between docs, plus
      // planted copies: ids 100+ are the first 6 docs with 2 tokens cut
      val texts = Gen.listOfN(24, docGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val corpus = base ++ base.take(6).map { case (i, t) =>
        (i + 100L, t.split(" ").dropRight(2).mkString(" ")) }
      val byId = corpus.toMap.map { case (k, v) => k -> v.split(" ") }
      val got = Dedup.duplicateSpans(corpus.toDF("doc_id", "text"),
          "doc_id", "text", n = 4, minRun = 4, maxDf = 1000)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val want = (for {
        (i, a) <- byId; (j, b) <- byId if i < j
        run = lcsRun(a, b) if run >= 4
      } yield (i, j) -> (run.toLong, grams4(a).intersect(grams4(b)).size.toLong))
        .toMap
      assert(want.nonEmpty, s"round $round: fixture must produce span pairs")
      assert(got == want, s"round $round: " +
        s"missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
    }
  }

  test("simhashPairs equals the brute-force Hamming ball (pigeonhole exactness)") {
    import spark.implicits._
    val texts = Gen.listOfN(40, docGen).pureApply(Gen.Parameters.default, Seed(9L))
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // near-dups: copies with the last token dropped → few-bit signature flips
    val corpus = base ++ base.take(15).map { case (i, t) =>
      (i + 100L, t.split(" ").dropRight(1).mkString(" ")) }
    val df = corpus.toDF("doc_id", "text")
    val sigs = Dedup.simhash(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Dedup.simhashPairs(df, "doc_id", "text", bits = 32, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "test corpus must contain close pairs")
  }

  test("editDistancePairs (PassJoin segment blocking) equals brute-force " +
      "all-pairs banded DP on random strings with edits at random positions") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val alpha = "abc"
    var seed = Seed(41L)
    for (round <- 1 to 3) {
      val rnd = new scala.util.Random(round * 997L)
      // base strings over a tiny alphabet (natural near-pairs) including
      // SHORT strings (< maxDist+1 chars → zero-length segments in the
      // partition scheme) and empty-adjacent lengths
      val base = (0 until 40).map { i =>
        val n = rnd.nextInt(26) // 0..25
        (i.toLong, Array.fill(n)(alpha(rnd.nextInt(3))).mkString)
      }
      // planted variants: 1..3 random edits at RANDOM positions —
      // early, mid and late all arise across rounds
      val variants = base.take(20).map { case (i, t) =>
        var s = t
        val nEdits = 1 + rnd.nextInt(3)
        for (_ <- 0 until nEdits if s.nonEmpty || rnd.nextBoolean()) {
          val p = if (s.isEmpty) 0 else rnd.nextInt(s.length + 1)
          rnd.nextInt(3) match {
            case 0 => s = s.substring(0, p) + alpha(rnd.nextInt(3)) + s.substring(p)
            case 1 if s.nonEmpty && p < s.length =>
              s = s.substring(0, p) + s.substring(p + 1)
            case _ if p < s.length =>
              s = s.substring(0, p) + alpha(rnd.nextInt(3)) + s.substring(p + 1)
            case _ => ()
          }
        }
        (i + 100L, s)
      }
      val corpus = (base ++ variants).toMap.toSeq // dedupe ids, keep all
      val brute = (for {
        (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
        d = lev(ta, tb) if d <= 3
      } yield (ia, ib, d)).toSet
      val got = Dedup.editDistancePairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"round=$round: blocking must be lossless " +
        s"(missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)})")
      assert(brute.nonEmpty, "test corpus must contain close pairs")
      seed = seed.next
    }
  }

  test("editDistancePairs losslessness holds across maxDist 1..4 " +
      "(the segment count k+1 and the probe window scale with k)") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val rnd = new scala.util.Random(4242L)
    // longer strings than the base law test, edits anywhere
    val base = (0 until 25).map { i =>
      (i.toLong, Array.fill(8 + rnd.nextInt(40))(
        ('a' + rnd.nextInt(4)).toChar).mkString)
    }
    val variants = base.take(12).map { case (i, t) =>
      var s = t
      for (_ <- 0 until 1 + rnd.nextInt(4)) {
        val p = rnd.nextInt(s.length + 1)
        rnd.nextInt(3) match {
          case 0 => s = s.substring(0, p) + ('a' + rnd.nextInt(4)).toChar +
            s.substring(p)
          case 1 if p < s.length => s = s.substring(0, p) + s.substring(p + 1)
          case _ if p < s.length =>
            s = s.substring(0, p) + ('a' + rnd.nextInt(4)).toChar +
              s.substring(p + 1)
          case _ => ()
        }
      }
      (i + 100L, s)
    }
    val corpus = base ++ variants
    val df = corpus.toDF("doc_id", "text")
    for (k <- 1 to 4) {
      val brute = (for {
        (ia, ta) <- corpus; (ib, tb) <- corpus if ia < ib
        d = lev(ta, tb) if d <= k
      } yield (ia, ib, d)).toSet
      val got = Dedup.editDistancePairs(df, "doc_id", "text", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"maxDist=$k: missed=${(brute -- got).take(5)} " +
        s"extra=${(got -- brute).take(5)}")
    }
  }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.zip(Gen.choose(0L, 39L), Gen.choose(0L, 39L))
    var seed = Seed(13L)
    for (round <- 1 to 3) {
      val edges = Gen.listOfN(45, edgeGen).pureApply(Gen.Parameters.default, seed)
        .filter { case (a, b) => a != b }
      seed = seed.next
      // reference: plain union-find with min-label normalization
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = verts.map(v => v -> find(v)).toMap
      // driverMaxEdges = 0 forces the ITERATIVE path — the default would
      // answer with the same union-find being tested against
      val got = Dedup.connectedComponents(edges.toDF("a", "b"),
          driverMaxEdges = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"round $round: labels diverged from union-find")
    }
  }

  test("fuzzyBlockedPairs distinct-key rollup equals the brute-force " +
      "blocked Levenshtein (duplicate-heavy corpus)") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    var seed = Seed(41L)
    for (round <- 1 to 3) {
      val texts = Gen.listOfN(20, docGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // duplicate-heavy: every doc gets an exact copy AND a one-char edit
      // (same first token, same length bucket → same block, near prefix)
      val corpus = texts.zipWithIndex.flatMap { case (t, i) =>
        Seq((i.toLong, t), (i + 100L, t),
          (i + 200L, t.updated(t.length - 1, 'Q')))
      }
      val got = Dedup.fuzzyBlockedPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val byId = corpus.toMap
      def key(t: String) = (t.split(" ").head, t.length / 20)
      val want = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        if key(ta) == key(tb)
        d = lev(ta.take(40), tb.take(40)) if d <= 5
      } yield (a, b, d.toLong)).toSet
      assert(got == want,
        s"round $round: got ${got.size} want ${want.size}: " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      assert(byId.nonEmpty)
    }
  }

  test("exactKeepMin partitions the corpus and keeps the min id") {
    import spark.implicits._
    val texts = Gen.listOfN(40, docGen).pureApply(Gen.Parameters.default, Seed(5L))
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val groups = Dedup.exactKeepMin(corpus.toDF("doc_id", "text"),
        Seq("text"), "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.map(_._3).sum == corpus.size)
    val wantKeeper = corpus.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._1).min }
    groups.foreach { case (t, keep, _) => assert(keep == wantKeeper(t)) }
  }

  test("containmentPairs equals brute-force containment below the size bound") {
    import spark.implicits._
    // docs are 6-14 tokens → 4-12 shingles, far below the exactness bound
    // (|small| < (k − minKeys + 1)/(1 − t) = 70 at the defaults), so the
    // bottom-k path must return EXACTLY the brute-force pair set — both
    // directions: no misses AND no extras
    var seed = Seed(99L)
    for (round <- 1 to 3) {
      val texts = Gen.listOfN(25, docGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // ids 100+: the first 8 docs wrapped in id-specific boilerplate.
      // ids 200+/300+: TINY docs (3-5 tokens → 1-3 shingles, BELOW the
      // minKeys floor) and their wrapped versions — the capped
      // co-occurrence floor must keep the bottom-k path exhaustive for
      // them too (a flat minKeys floor silently drops their pairs)
      val tiny = Gen.listOfN(4, Gen.choose(3, 5)
          .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab))).map(_.mkString(" ")))
        .pureApply(Gen.Parameters.default, seed.next)
        .zipWithIndex.map { case (t, i) => (i + 200L, t) }
      val corpus = base ++ base.take(8).map { case (i, t) =>
        (i + 100L, s"p${i}x p${i}y p${i}z $t s${i}x s${i}y") } ++
        tiny ++ tiny.map { case (i, t) =>
          (i + 100L, s"w${i}a w${i}b $t w${i}c w${i}d") }
      val byId = corpus.toMap
      val got = Dedup.containmentPairs(corpus.toDF("doc_id", "text"),
          "doc_id", "text", threshold = 0.9)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        (sa, sb) = (shingles(ta), shingles(tb))
        if sa.nonEmpty && sb.nonEmpty
        c = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
        if c >= 0.9
      } yield (a, b,
        BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      assert(got == want,
        s"round $round: got ${got.size} pairs, want ${want.size}: " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      // the 8 wrap pairs are a guaranteed subset
      for (i <- 0L until 8L)
        assert(got.exists(p => p._1 == i && p._2 == i + 100L),
          s"round $round: wrap pair ($i, ${i + 100}) missed")
      assert(byId.nonEmpty)
    }
  }
}
