package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextStatsSpec extends SparkTestBase {

  test("stemTopK: the Harman S-stemmer rules on hand words — ies→y with " +
      "the eies/aies guards, es-drop with the aes/ees/oes guards, s-drop " +
      "with the us/ss guards, short words untouched") {
    import spark.implicits._
    val words = Seq(
      "ponies" -> "pony", "cities" -> "city", // ies → y
      "eies" -> "eies", "aies" -> "aies",     // ies guards PROTECT
      "makes" -> "make", "churches" -> "churche", // es → e (drop s)
      "goes" -> "goes", "trees" -> "trees", "aes" -> "aes", // es guards
      "cats" -> "cat", "runs" -> "run",       // s-drop
      "bus" -> "bus", "class" -> "class",     // us/ss guards
      "is" -> "is", "as" -> "as",             // len < 3 untouched
      "dog" -> "dog")                         // no suffix
    val df = words.zipWithIndex
      .map { case ((w, _), i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextAnalysis.stemTopK(df, "doc_id", "text", k = 100)
      .collect().map(_.getString(0)).toSet
    assert(got == words.map(_._2).toSet,
      s"\ngot $got\nexp ${words.map(_._2).toSet}")
    // conflation is visible: two surface forms onto one stem
    val two = Seq((1L, "cat cats")).toDF("doc_id", "text")
    val r = TextAnalysis.stemTopK(two, "doc_id", "text").collect()
    assert(r.length == 1 && r.head.getString(0) == "cat" &&
      r.head.getLong(1) == 2 && r.head.getLong(2) == 2)
  }

  test("llrTopK: Dunning G2 equals a driver-side replica of the " +
      "contingency formula, ranks frequent collocations above rare ones") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "strong tea strong tea strong tea strong tea strong tea"),
      (2L, "powerful computer powerful computer powerful computer powerful computer powerful computer"),
      (3L, "strong coffee strong coffee strong coffee strong coffee strong coffee"),
      (4L, "tea or coffee or tea or coffee or tea"),
      (5L, "the strong tea and the powerful computer met"))
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.llrTopK(df, "doc_id", "text", k = 20, minCount = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // driver replica
    val bigrams = corpus.flatMap { case (_, t) =>
      val tk = t.split(" "); tk.init.zip(tk.tail) }
    val bc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size.toLong
    def term(k: Long, row: Long, col: Long): Double =
      if (k <= 0) 0.0
      else k.toDouble * math.log((k.toDouble * n.toDouble) /
        (row.toDouble * col.toDouble))
    val exp = bc.toSeq.filter(_._2 >= 5).map { case ((w1, w2), k11) =>
      val r1 = c1(w1); val cc = c2(w2)
      val raw = 2.0 * (term(k11, r1, cc) + term(r1 - k11, r1, n - cc) +
        term(cc - k11, n - r1, cc) + term(n - r1 - cc + k11, n - r1, n - cc))
      val llr = BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      (w1, w2) -> (k11, r1, cc, llr)
    }.sortBy { case ((w1, w2), (_, _, _, llr)) => (-llr, w1, w2) }.take(20)
    assert(got.toSeq == exp, s"\ngot ${got.toSeq}\nexp $exp")
    // the 5x collocations must outrank any bigram seen fewer times
    val top = got.head._1
    assert(bc(top) >= 5)
  }

  test("kneserNeySurprisal: engine scores equal a driver-side replica, " +
      "and per-context probabilities sum to 1 over the vocabulary") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog"),
      (4L, "the cat and the dog sat"))
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeySurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // driver replica of the model
    val bigrams = corpus.flatMap { case (id, t) =>
      val tk = t.split(" "); tk.init.zip(tk.tail).map(p => (id, p._1, p._2)) }
    val bc = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val pc = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val nf = bc.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val nr = bc.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val tt = bc.size.toDouble
    val d = 0.75
    def p(w1: String, w2: String): Double =
      math.max(bc((w1, w2)) - d, 0.0) / pc(w1) +
        (d / pc(w1)) * nf(w1) * (nr(w2) / tt)
    corpus.foreach { case (id, t) =>
      val tk = t.split(" ")
      val ss = tk.init.zip(tk.tail).map { case (a, b) => -math.log(p(a, b)) }
      val expected = BigDecimal(ss.sum / ss.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 == ss.length)
      assert(math.abs(got(id)._2 - expected) < 2e-4,
        s"doc $id: ${got(id)._2} vs replica $expected")
    }
    // smoothing invariant: sum over the FULL vocab of P(w2|w1) = 1
    val vocab = bigrams.flatMap(b => Seq(b._2, b._3)).distinct
    pc.keys.foreach { w1 =>
      val total = vocab.map { w2 =>
        val seen = math.max(bc.getOrElse((w1, w2), 0) - d, 0.0) / pc(w1)
        seen + (d / pc(w1)) * nf(w1) * (nr.getOrElse(w2, 0) / tt)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $w1 sums to $total")
    }
  }

  test("kneserNeyTrigram: engine scores equal a driver-side replica, " +
      "and per-context probabilities sum to 1 over attested continuations") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "a cat and a dog ran"),
      (4L, "the cat and the dog sat"))
    val df = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyTrigram(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val tris = corpus.flatMap { case (id, t) =>
      val tk = t.split(" ")
      tk.indices.dropRight(2).map(i => (id, tk(i), tk(i + 1), tk(i + 2))) }
    val tc = tris.groupBy(x => (x._2, x._3, x._4)).view.mapValues(_.size).toMap
    val ctx = tc.groupBy(kv => (kv._1._1, kv._1._2)).view
      .mapValues(m => (m.values.sum, m.size)).toMap // (instances, nf12)
    val cont = tc.keys.groupBy(k => (k._2, k._3)).view.mapValues(_.size).toMap
    val mid = cont.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size)).toMap // (mid2, nf2)
    val rgt = cont.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val tt = cont.size.toDouble
    val d = 0.75
    def p(w1: String, w2: String, w3: String): Double = {
      val (cx, nf12) = ctx((w1, w2))
      val (m2, nf2) = mid(w2)
      val lower = math.max(cont.getOrElse((w2, w3), 0) - d, 0.0) / m2 +
        (d / m2) * nf2 * (rgt.getOrElse(w3, 0) / tt)
      math.max(tc.getOrElse((w1, w2, w3), 0) - d, 0.0) / cx +
        (d / cx) * nf12 * lower
    }
    corpus.foreach { case (id, t) =>
      val tk = t.split(" ")
      val ss = tk.indices.dropRight(2)
        .map(i => -math.log(p(tk(i), tk(i + 1), tk(i + 2))))
      val expected = BigDecimal(ss.sum / ss.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 == ss.length)
      assert(math.abs(got(id)._2 - expected) < 2e-4,
        s"doc $id: ${got(id)._2} vs replica $expected")
    }
    // smoothing invariant: for every attested context (w1, w2), the sum
    // of P(w3|w1w2) over the continuation model's w3 domain is exactly 1
    val w3domain = cont.keys.map(_._2).toSeq.distinct
    ctx.keys.foreach { case (w1, w2) =>
      val total = w3domain.map(p(w1, w2, _)).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"context ($w1, $w2) sums to $total")
    }
  }

  test("repetition: gram counts and fractions match hand computation") {
    import spark.implicits._
    // doc 1: "a b a b a" → bigrams [a b, b a, a b, b a] → 4 total,
    //   2 distinct, top count 2 → top_frac 0.5, dup_frac 0.5
    // doc 2: all-distinct bigrams → dup_frac 0, top_frac 1/3
    // doc 3: one token → no bigram → dropped
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "w x y z"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((4L, 2L, 2L, 0.5, 0.5)))
    assert(got(2L) == ((3L, 3L, 1L, 0.3333, 0.0)))
  }

  test("repetition: a looping doc scores far above a varied doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(50)("buy now").mkString(" ")),
      (2L, (1 to 100).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val frac = TextAnalysis.repetition(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(frac(1L) > 0.4, s"looping doc top_gram_frac ${frac(1L)}")
    assert(frac(2L) < 0.05, s"varied doc top_gram_frac ${frac(2L)}")
  }

  test("contamination: 5-gram collisions against a benchmark set") {
    import spark.implicits._
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d e x"), // grams: "a b c d e"(hit), "b c d e x"(miss)
      (2L, "p q r s t"),   // one gram, no hit
      (3L, "too short")).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(docs, bench, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((1L, 0L, 0.0)))
  }

  test("unigramLogProb: mean surprisal from corpus-wide frequencies") {
    import spark.implicits._
    // corpus tokens: a×2, b×2 → p = 0.5 each → surprisal ln 2 everywhere
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, 0.6931)))
    assert(got(2L) == ((1L, 0.6931)))
  }

  test("bigramLogProb: conditional probabilities from corpus counts") {
    import spark.implicits._
    // corpus bigrams: (a b) ×2, (b a) ×1, (b c) ×1 → prefix counts a·=2, b·=2
    //   doc 1 "a b a b": grams a b, b a, a b → -ln[1, .5, 1] avg = ln2/3
    //   doc 2 "b c": one gram, p(c|b) = .5 → ln2
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - math.rint(math.log(2) / 3 * 10000) / 10000) < 1e-9)
    assert(got(2L) == ((1L, 0.6931)))
  }

  test("bpePairStats: corpus-weighted adjacent-pair counts pick the merge") {
    import spark.implicits._
    // "abab" ×2 docs + "ab cd": pairs of "abab" = ab, ba, ab; token counts
    //   abab: 2 → ab 4, ba 2; ab: 1 → ab 1; cd: 1 → cd 1
    val docs = Seq((1L, "abab"), (2L, "abab"), (3L, "ab cd"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head == ("ab" -> 5L), s"top merge must be 'ab': ${got.toSeq}")
    assert(got.toMap == Map("ab" -> 5L, "ba" -> 2L, "cd" -> 1L))
  }

  test("piiRedact: counts and masks each pattern class, clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.ex.org now"),
      (2L, "call 555-0199 or 555-1234"),
      (3L, "host 192.168.0.1 and 10.0.3.7"),
      (4L, "nothing sensitive here"),
      (5L, "a@b.io via 555-0000 at 1.2.3.4")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiRedact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    assert(got(1L) == ((1L, 0L, 0L), "mail me at <EMAIL> now"))
    assert(got(2L) == ((0L, 2L, 0L), "call <PHONE> or <PHONE>"))
    assert(got(3L) == ((0L, 0L, 2L), "host <IP> and <IP>"))
    assert(got(4L) == ((0L, 0L, 0L), "nothing sensitive here"))
    assert(got(5L) == ((1L, 1L, 1L), "<EMAIL> via <PHONE> at <IP>"))
  }

  test("statsSummary: median/mode/moments agree with direct computation") {
    val got = Analytics.statsSummary(spark, sfDir).collect()
    assert(got.nonEmpty)
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val flag = got.head.getString(0)
    val qtys = li.filter(col("l_returnflag") === flag)
      .select("l_quantity").collect().map(_.getDouble(0)).sorted
    // exact interpolated median
    val n = qtys.length
    val med = if (n % 2 == 1) qtys(n / 2) else (qtys(n / 2 - 1) + qtys(n / 2)) / 2
    assert(math.abs(got.head.getDouble(1) - med) < 1e-9)
    // deterministic mode: max count, ties to smallest value
    val counts = qtys.groupBy(identity).view.mapValues(_.length).toMap
    val best = counts.toSeq.map { case (v, c) => (c, -v) }.max
    assert(got.head.getDouble(2) == -best._2)
    assert(got.head.getLong(3) == best._1.toLong)
    // sample variance of quantity
    val mean = qtys.sum / n
    val varS = qtys.map(q => (q - mean) * (q - mean)).sum / (n - 1)
    assert(math.abs(got.head.getDouble(5) - varS) < 1e-2)
  }

  test("bm25TopK: closed-form scores on a hand corpus, rare terms dominate, " +
      "no-hit docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join window"),        // all 3 query terms, dl 3
      (2L, "spark spark spark filter"), // one term thrice, dl 4
      (3L, "scan filter value"),        // no query terms
      (4L, "join value value spark")    // two terms, dl 4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "join", "window"), k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // closed form at N=4, avgdl=3.5; df: spark=3, join=2, window=1
    val N = 4.0; val avgdl = 3.5
    def idf(df: Double) = math.log(1 + (N - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(!got.contains(3L), "a doc with no query term must not score")
    assert(got(1L) == ((1L, 3L, r4(w(1, 3, 3) + w(1, 3, 2) + w(1, 3, 1)))),
      s"doc 1 (hits all terms incl. rare 'window') must rank first: $got")
    assert(got(4L) == ((2L, 2L, r4(w(1, 4, 3) + w(1, 4, 2)))))
    // tf saturation: 3× 'spark' still scores BELOW two distinct terms
    assert(got(2L) == ((3L, 1L, r4(w(3, 4, 3)))))
    assert(got(2L)._3 < got(4L)._3, "BM25 tf saturation must hold")
  }

  test("hybridRrf: both-list docs beat single-list docs, scores are the " +
      "coalesced reciprocal sums, no-term docs never appear") {
    import spark.implicits._
    // doc 1: strong on BOTH rankers (has both query terms, short doc).
    // doc 2: BM25-favored (repeats 'spark' — tf high, but extra distinct
    //        tokens dilute its Jaccard).
    // doc 3: Jaccard-favored (exactly the query tokens + one more).
    // doc 4: no query term — must not appear at all.
    val docs = Seq(
      (1L, "spark join"),
      (2L, "spark join spark join spark join lorem ipsum dolor sit amet consectetur"),
      (3L, "spark extra"),
      (4L, "nothing relevant at all")).toDF("doc_id", "text")
    // n = 2: each leg keeps two docs, so the lists genuinely diverge
    // (doc 1 on both; the BM25 leg keeps its tf-favorite, the Jaccard
    // leg its overlap-favorite)
    val out = TextAnalysis.hybridRrf(docs, "doc_id", "text",
        Seq("spark", "join"), n = 2, k = 4, c = 60.0)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .toMap
    assert(!out.contains(4L), "doc without any query term must be absent")
    // every present doc's rrf equals the hand-computed coalesced sum
    def rrf(b: Option[Long], j: Option[Long]) = BigDecimal(
      b.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        j.map(r => 1.0 / (60 + r)).getOrElse(0.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (id, (_, score, b, j)) =>
      assert(score === rrf(b, j), s"doc $id fused score") }
    // doc 1 tops both lists -> must be fused rank 1; docs on both lists
    // outrank any doc appearing on only one
    assert(out(1L)._1 === 1L)
    val (both, single) = out.values.partition(v => v._3.isDefined && v._4.isDefined)
    assert(both.map(_._2).min >= single.map(_._2).max,
      "a both-list doc never scores below a single-list doc here")
  }

  test("bpeApply: ordered exhaustive merges, composed pieces, leftmost " +
      "non-overlapping") {
    import spark.implicits._
    val docs = Seq((1L, "better water"), (2L, "aaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeApply(docs, "doc_id", "text",
        Seq("e r", "t er", "a a"), k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // better -> b e t t e r -> (e r) b e t t er -> (t er) b e t ter
    // water  -> w a t e r  -> w a t er -> w a ter
    // aaa    -> a a a -> (a a, leftmost non-overlapping) aa a
    assert(got === Map("b" -> 1L, "e" -> 1L, "t" -> 1L, "ter" -> 2L,
      "w" -> 1L, "a" -> 2L, "aa" -> 1L))
  }

  test("bpeTrain: per-round argmax with re-counting composes multi-char " +
      "merges; applying the trained list reproduces the final state") {
    import spark.implicits._
    // "ab" appears in 3 tokens (weights 2+1+1 = 4 occurrences of pair
    // a-b); after merging "a b", pair "ab c" (weight 3) only exists on
    // the MERGED vocabulary — a single-round statistic never sees it
    val docs = Seq((1L, "abc abc abd"), (2L, "abc xy")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "doc_id", "text", rounds = 2)
    assert(merges.map(m => (m._1, m._2, m._3)) ===
      Seq((1L, "a b", 4L), (2L, "ab c", 3L)))
    // trained list through bpeApply = trainer's final vocabulary state
    val applied = TextAnalysis.bpeApply(docs, "doc_id", "text",
        merges.map(_._2), k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(applied === Map("abc" -> 3L, "ab" -> 1L, "d" -> 1L,
      "x" -> 1L, "y" -> 1L))
  }

  test("bpeTrainBytes: GPT-2-style byte-level merges — multi-byte UTF-8 " +
      "re-assembles from its byte pair, the leading-space convention " +
      "survives pre-tokenization, and no symbol is ever UNK") {
    import spark.implicits._
    // é is C3 A9 (195 169); 'café' appears 4×, so the é byte pair must
    // be learnable; ' c' (032 099) leads each space-prefixed pretoken
    val docs = Seq((1L, "café café"), (2L, "café café x")).toDF(
      "doc_id", "text")
    val merges = TextAnalysis.bpeTrainBytes(
      docs.select(col("text")), "text", rounds = 5)
    assert(merges.nonEmpty)
    // every learned merge is a pair of well-formed byte symbols
    // (fixed-width 3-digit decimals, possibly already concatenated)
    merges.foreach { case (_, m, w) =>
      val Array(l, r) = m.split(" ")
      assert(l.length % 3 == 0 && r.length % 3 == 0, s"symbol widths: $m")
      assert((l + r).grouped(3).forall(d => d.toInt >= 0 && d.toInt < 256),
        s"all symbols must be byte values: $m")
      assert(w > 0)
    }
    // the é bytes (195 169) must end up merged into ONE symbol — either
    // as a standalone pair or inside a larger learned token (here the
    // lexicographic tie-break grows 'caf' left-to-right, so é lands as
    // the tail of the composed symbol)
    assert(merges.exists(m => m._2.replace(" ", "").contains("195169")),
      s"multi-byte é must re-assemble inside a merged symbol: $merges")
    // pre-tokenization keeps the GPT-2 leading-space convention: the
    // second 'café' pretokenizes as ' café' (byte 032 first)
    assert(merges.exists(m => m._2.startsWith("032") ||
      m._2.replace(" ", "").startsWith("032")),
      s"space-leading pretokens must appear in the learned pairs: $merges")
  }

  test("utf8Stats: differential test against the JDK's strict UTF-8 " +
      "decoder — validity verdict identical on 2000 random byte strings, " +
      "code-point counts exact on the valid ones, and every fixture " +
      "class pins its first-invalid offset") {
    import spark.implicits._
    import java.nio.charset.{CodingErrorAction, StandardCharsets}
    def javaVerdict(bytes: Array[Byte]): (Boolean, Long) = {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      try {
        val s = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
        (true, s.codePointCount(0, s.length).toLong)
      } catch { case _: java.nio.charset.CharacterCodingException =>
        (false, -1L)
      }
    }
    val rnd = new scala.util.Random(42)
    val cases = (1 to 2000).map { i =>
      val n = rnd.nextInt(12)
      val bytes = Array.fill(n)((rnd.nextInt(256) - 128).toByte)
      // bias half the cases toward near-valid shapes (pure random bytes
      // are almost always invalid, which would under-test the valid DFA
      // paths): random VALID strings re-encoded, with one byte flipped
      // in a quarter of them
      if (i % 2 == 0) bytes
      else {
        val s = (1 to rnd.nextInt(5)).map(_ =>
          new String(Character.toChars {
            var cp = 0
            do cp = rnd.nextInt(0x110000)
            while (cp >= 0xD800 && cp <= 0xDFFF)
            cp
          })).mkString
        val b = s.getBytes(StandardCharsets.UTF_8)
        if (i % 4 == 1 && b.nonEmpty)
          b.updated(rnd.nextInt(b.length), (rnd.nextInt(256) - 128).toByte)
        else b
      }
    }
    val hx = cases.zipWithIndex.map { case (b, i) =>
      (i.toLong, b.map("%02X".format(_)).mkString) }
    val got = TextAnalysis.utf8Stats(hx.toDF("id", "hx"), "id", "hx")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(4), r.getLong(2))).toMap
    cases.zipWithIndex.foreach { case (b, i) =>
      val (jv, jc) = javaVerdict(b)
      val (gv, gc) = got(i.toLong)
      assert(gv == jv,
        s"case $i ${b.map("%02X".format(_)).mkString}: engine $gv vs JDK $jv")
      if (jv) assert(gc == jc,
        s"case $i: codepoints $gc vs JDK $jc")
    }
    // fixture classes pin their exact first-invalid offsets
    val fx = TextAnalysis.utf8Stats(
      LlmQueries.Utf8Fixture.toDF("id", "hx"), "id", "hx")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val expected = Map(1L -> -1L, 2L -> -1L, 3L -> -1L, 4L -> -1L,
      5L -> -1L, 6L -> -1L, 7L -> -1L, 8L -> -1L, 9L -> -1L,
      10L -> 0L,  // C0 lead is invalid immediately
      11L -> 1L,  // E0 then 80 violates the A0..BF window
      12L -> 1L,  // F0 then 80 violates the 90..BF window
      13L -> 1L, 14L -> 1L,  // ED then A0/BF: surrogates
      15L -> 1L,  // F4 then 90: past U+10FFFF
      16L -> 0L, 17L -> 0L, 18L -> 0L, // bad leads / bare continuation
      19L -> 2L, 20L -> 1L,  // truncations report at n_bytes
      21L -> 2L,  // valid 'A' then truncated C3
      22L -> 0L,  // C1 lead
      23L -> -1L) // empty
    expected.foreach { case (id, fi) =>
      assert(fx(id) == fi, s"fixture $id: first_invalid ${fx(id)} vs $fi")
    }
  }

  test("bpeTrain: learned merges are invariant to corpus row order and " +
      "partitioning (the determinism the oracle replay relies on)") {
    import spark.implicits._
    val rows = Seq((1L, "alpha beta alphabet"), (2L, "beta betray alpha"),
      (3L, "bet alpha beta beta"), (4L, "alphabet betray bet"))
    val a = TextAnalysis.bpeTrain(rows.toDF("doc_id", "text"),
      "doc_id", "text", rounds = 4)
    val b = TextAnalysis.bpeTrain(
      rows.reverse.toDF("doc_id", "text").repartition(7),
      "doc_id", "text", rounds = 4)
    assert(a === b, "merge list must not depend on row order/partitioning")
    assert(a.length == 4 && a.map(_._2).distinct.length == 4)
  }

  test("winnowing: selection equals per-window argmin brute force, the " +
      "shared-substring guarantee holds, density near 2/(w+1)") {
    import spark.implicits._
    val words = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango"
    // doc 2 embeds doc 1's tokens 5..12 (an 8-token match >= w+k-1 = 7)
    val t1 = words.split(" ").toSeq
    val shared = t1.slice(4, 12)
    val d2 = Seq("zulu", "yankee") ++ shared ++ Seq("xray", "whiskey", "victor")
    val docs = Seq((1L, t1.mkString(" ")), (2L, d2.mkString(" ")))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2)))
    // brute force on doc 1: every length-4 window of gram hashes
    // contributes its (unique) minimum
    def md5long(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString.take(15), 16)
    val grams1 = t1.sliding(4).map(_.mkString(" ")).map(md5long).toArray
    val brute = grams1.sliding(4).zipWithIndex
      .map { case (win, j) => j + win.indexOf(win.min) + 1 }.toSet
    assert(fp.filter(_._1 == 1L).map(_._2).toSet === brute,
      "engine selection must equal the per-window argmin definition")
    // guarantee: the >= 7-token shared run yields a common fingerprint hash
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 & h2).nonEmpty, "shared substring must share a fingerprint")
    // density on the real corpus concentrates near 2/(w+1) = 0.4
    val stats = TextAnalysis.winnowStats(
      graft.Tables.load(spark, sfDir, "documents"), "doc_id", "text")
      .agg(sum("n_fp").cast("double") / sum("n_grams")).head().getDouble(0)
    assert(stats > 0.25 && stats < 0.55, s"corpus density $stats")
  }

  test("rake: phrase splitting at stopwords, deg/freq word scores, " +
      "phrase score = sum of member scores (brute force on a hand corpus)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "deep learning the neural network a deep learning"),
      (2L, "neural network the deep learning"),
      (3L, "network a network")).toDF("doc_id", "text")
    val stop = Seq("the", "a")
    val got = TextAnalysis.rakeTopK(docs, "doc_id", "text", stop, k = 10)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // brute-force RAKE on the same corpus
    val phrases = Seq("deep learning", "neural network", "deep learning",
      "neural network", "deep learning", "network", "network")
    val words = phrases.flatMap(_.split(" "))
    val freq = words.groupBy(identity).map { case (w, v) => w -> v.size }
    val deg = phrases.flatMap(p => p.split(" ").map(_ -> p.split(" ").length))
      .groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sum }
    def score(p: String): Double =
      p.split(" ").map(w => (deg(w).toLong * 1000000 / freq(w))).sum / 1e6
    val expect = phrases.groupBy(identity).map { case (p, v) =>
      p -> (p.split(" ").length.toLong, v.size.toLong,
        BigDecimal(score(p)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    assert(got == expect, s"got $got expect $expect")
    // multi-word phrases outrank their member single words (the RAKE
    // property: deg rewards co-occurrence reach)
    assert(got("deep learning")._3 > got("network")._3)
  }

  test("urlCanon: every RFC 3986 rule — case, default ports, empty path, " +
      "fragment, utm params, sort — plus equivalence and idempotence") {
    import spark.implicits._
    val cases = Seq(
      (1L, "HTTP://A.COM:80/p?b=2&a=1#x", "http://a.com/p?a=1&b=2"),
      (2L, "http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2"),   // same key
      (3L, "HTTPS://B.Org:443/", "https://b.org/"),
      (4L, "https://b.org:8443/", "https://b.org:8443/"),         // kept port
      (5L, "http://c.net", "http://c.net/"),                      // empty path
      (6L, "http://c.net?utm_source=x&utm_medium=y", "http://c.net/"),
      (7L, "ftp://D.host:21/f", "ftp://d.host:21/f"),             // non-http port kept
      (8L, "http://e.io/q?z=9", "http://e.io/q?z=9"))
    val got = TextAnalysis.urlCanon(
        cases.map(c => (c._1, c._2)).toDF("id", "url"), "id", "url")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, want) =>
      assert(got(id) == want, s"case $id: ${got(id)}")
    }
    assert(got(1L) == got(2L), "equivalent spellings must share the key")
    // idempotent: canonicalizing the canonical form is a no-op
    val twice = TextAnalysis.urlCanon(
        cases.map(c => (c._1, got(c._1))).toDF("id", "url"), "id", "url")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got)
  }

  test("readability: exact counts and both scores on hand sentences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello world. It is big!"),
      (2L, "word")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // doc 1: W=5 tokens, S=2 ([.!]), Y=6 vowel groups
    // fk_milli    = floor((390*25 + 11800*12 - 15590*10) / 10)  = -455
    // flesch_milli= floor((2068350 - 25375 - 1015200) / 10)     = 102777
    assert(got(1L) == (5L, 2L, 6L, -455L, 102777L), got(1L).toString)
    // doc 2: W=1, S floors to 1, Y=1:
    // fk = floor(390 + 11800 - 15590) = -3400
    // flesch = floor(206835 - 1015 - 84600) = 121220
    assert(got(2L) == (1L, 1L, 1L, -3400L, 121220L), got(2L).toString)
  }

  test("sentiment: lexicon scores with one-token negation scope") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the fast slow a big"), // fast negated, slow kept, big negated
      (2L, "fast fast big"),       // all positive, no negation
      (3L, "key value table")).toDF("doc_id", "text") // neutral
    val got = TextAnalysis.sentiment(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(1L) == (0L, 3L, -3L, "neg"), got(1L).toString)
    assert(got(2L) == (3L, 0L, 3L, "pos"), got(2L).toString)
    assert(got(3L) == (0L, 0L, 0L, "neu"), got(3L).toString)
  }

  test("heaps: cumulative counts are monotone, the final checkpoint is " +
      "the whole corpus, beta replicates the ln-ratio on a hand corpus") {
    import spark.implicits._
    // doc ids 0..4: each doc adds 2 tokens, one new type, one repeat
    val corpus = (0L to 4L).map(i => (i, s"common w$i")).toDF("doc_id", "text")
    val got = TextAnalysis.heaps(corpus, "doc_id", "text").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(20, 40, 60, 80, 100))
    // thresholds floor(f*4): 0, 1, 2, 3, 4 -> docs 1, 2, 3, 4, 5
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._3).toSeq == Seq(2L, 4L, 6L, 8L, 10L))
    // vocab: 'common' + one new type per doc -> 2, 3, 4, 5, 6
    assert(got.map(_._4).toSeq == Seq(2L, 3L, 4L, 5L, 6L))
    assert(got.head._5.isNaN, "first checkpoint has no slope")
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (1 until 5).foreach { k =>
      val b = r4(math.log(got(k)._4.toDouble / got(k - 1)._4) /
        math.log(got(k)._3.toDouble / got(k - 1)._3))
      assert(got(k)._5 == b, s"beta at checkpoint $k")
    }
    // corpus-level sanity on the registered fixture: monotone, final =
    // whole corpus, beta in (0, 1)
    val reg = LlmQueries.textHeaps(spark, sfDir).collect()
    assert(reg.length == 5)
    assert(reg.map(_.getLong(3)).toSeq == reg.map(_.getLong(3)).sorted.toSeq)
    // the tiny test-SF vocabulary saturates early, so beta may hit 0
    // exactly; it can never be negative or >= 1 on a growing corpus
    (1 until 5).foreach { k =>
      val b = reg(k).getDouble(4); assert(b >= 0 && b < 1, s"beta $b") }
  }

  test("burstiness: once-per-doc boilerplate -> VMR tends to 0; a term " +
      "concentrated in one doc -> VMR near its count; replica exact") {
    import spark.implicits._
    // 4 docs: 'tmpl' once in every doc; 'burst' 4 times in one doc;
    // 'half' once in two docs
    val corpus = Seq(
      (1L, "tmpl burst burst burst burst half"),
      (2L, "tmpl half"), (3L, "tmpl x"), (4L, "tmpl y"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.burstiness(corpus, "doc_id", "text", k = 10)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def vmr(cs: Seq[Long], n: Int): Double = {
      val t = cs.sum.toDouble; val ss = cs.map(c => c * c).sum.toDouble
      r4((ss - t * t / n) / t)
    }
    assert(got("tmpl") == ((4L, 4L, vmr(Seq(1, 1, 1, 1), 4))))
    assert(got("tmpl")._3 == 0.0, "exact once-per-doc template is VMR 0")
    assert(got("burst") == ((4L, 1L, vmr(Seq(4), 4))))
    assert(got("burst")._3 == 3.0, "all mass in one doc: VMR = c - c^2/n")
    assert(got("half") == ((2L, 2L, vmr(Seq(1, 1), 4))))
    assert(got("burst")._3 > got("half")._3 && got("half")._3 > 0.0)
  }

  test("html strip: tags drop, entities decode with &amp; LAST (no " +
      "double-decode), whitespace squeezes") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "<p>a &amp;lt; b</p>"), // must yield 'a &lt; b', NOT 'a < b'
      (2L, "<div class=\"x\">hi  <br/> there</div>"),
      (3L, "no markup at all"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.htmlStrip(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    def m(sx: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((2L, 1L, 8L, m("a &lt; b"))),
      "decoding &amp; first would double-decode to 'a < b'")
    assert(got(2L) == ((3L, 0L, 8L, m("hi there"))))
    assert(got(3L) == ((0L, 0L, 16L, m("no markup at all"))))
  }

  test("script profile: mixed Latin/Han/digit/punct counts are exact " +
      "and the remainder closes; dominance calls pin") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "abc 12 你好!"),    // 3 latin, 2 han, 2 digit, 2 space, 1 other
      (2L, "你好世界"),         // pure han
      (3L, "...!!!"))           // no letters at all
      .toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    assert(got(1L) == ((10L, 3L, 2L, 2L, 2L, 1L, "latin")))
    assert(got(2L) == ((4L, 0L, 4L, 0L, 0L, 0L, "han")))
    assert(got(3L) == ((6L, 0L, 0L, 0L, 0L, 6L, "none")))
  }

  test("lexdiv: all-distinct doc maxes TTR and zeroes Simpson/Yule; " +
      "all-same doc pins the closed forms; hand spectrum exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d"),          // V=4, N=4, s2=4
      (2L, "a a a a"),          // V=1, N=4, s2=16
      (3L, "a a b"),            // V=2, N=3, s2=5
      (4L, "solo"))             // N=1: simpson guard path
      .toDF("doc_id", "text")
    val got = TextAnalysis.lexDiversity(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, 4L, 1.0, 2.0, 0.0, 0.0)))
    assert(got(2L) == ((4L, 1L, 0.25, 0.5, 1.0, r6(10000.0 * 12 / 16))))
    assert(got(3L) == ((3L, 2L, r6(2.0 / 3), r6(2.0 / math.sqrt(3.0)),
      r6(2.0 / 6), r6(10000.0 * 2 / 9))))
    assert(got(4L)._5 == 0.0, "single-token doc takes the N<2 guard")
  }

  test("dsirTopK: documents sharing the target domain's vocabulary " +
      "out-rank off-domain documents; weights replicate a driver-side " +
      "model fit; the Gumbel key is deterministic") {
    import spark.implicits._
    // target = docs 1-4 (tgt language of 'code'); probe docs 10/11 share
    // the target vocabulary, 12/13 are off-domain — DSIR must tilt
    // toward 10/11 regardless of the derandomized noise, so the planted
    // margin is made large (every gram of 10/11 is target-only
    // vocabulary; every gram of 12/13 is raw-only)
    val corpus = Seq(
      (1L, 1, "def fn return val"), (2L, 1, "class def fn return"),
      (3L, 1, "val class def fn"), (4L, 1, "return val class def"),
      (10L, 0, "def fn return class"), (11L, 0, "val def fn return"),
      (12L, 0, "cat sat mat hat"), (13L, 0, "rain wet cold gray"))
      .toDF("doc_id", "tgt", "text")
    val got = TextAnalysis.dsirTopK(corpus, "doc_id", "text",
        targetPred = col("tgt") === 1, buckets = 64, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.size == 8)
    // n_grams = tokens + bigrams = 4 + 3 for every doc
    got.values.foreach { case (n, _, _, _) => assert(n == 7L) }
    // every on-domain doc outweighs every off-domain doc (logw margin)
    val onW = Seq(10L, 11L).map(got(_)._2).min
    val offW = Seq(12L, 13L).map(got(_)._2).max
    assert(onW > offW,
      s"on-domain min logw $onW must exceed off-domain max $offW")
    // driver-side model replica for one doc: rebuild bucket counts and
    // the smoothed log-ratio sum exactly as the operator defines them
    val toks = Seq("def", "fn", "return", "class")
    val grams = toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
    def md5l(s0: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val all = Seq(
      (1L, 1, "def fn return val"), (2L, 1, "class def fn return"),
      (3L, 1, "val class def fn"), (4L, 1, "return val class def"),
      (10L, 0, "def fn return class"), (11L, 0, "val def fn return"),
      (12L, 0, "cat sat mat hat"), (13L, 0, "rain wet cold gray"))
    val bucketCounts = scala.collection.mutable.Map
      .empty[(Long, Int, Long), Long].withDefaultValue(0L)
    all.foreach { case (id, tgt, text) =>
      val tk = text.split(" ").toSeq
      (tk ++ tk.sliding(2).map(_.mkString(" "))).foreach { g =>
        val b = md5l(g) % 64
        bucketCounts((id, tgt, b)) += 1
      }
    }
    val pc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val qc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    bucketCounts.foreach { case ((_, tgt, b), n) =>
      if (tgt == 1) pc(b) += n
      qc(b) += n
    }
    val ptot = pc.values.sum; val qtot = qc.values.sum
    def delta(b: Long): Double =
      math.log((pc(b) + 1).toDouble / (ptot + 64)) -
        math.log((qc(b) + 1).toDouble / (qtot + 64))
    val logw10 = bucketCounts.collect {
      case ((10L, _, b), n) => n * delta(b) }.sum
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._2 == r4(logw10),
      s"doc 10 logw ${got(10L)._2} != replica ${r4(logw10)}")
    // Gumbel key replica: rk = logw + g with g from the doc-id md5
    val u = ((md5l("10") % 1000000L) + 0.5) / 1000000.0
    assert(got(10L)._3 == r4(logw10 - math.log(-math.log(u))))
    // determinism: a second run is bit-identical
    val again = TextAnalysis.dsirTopK(corpus, "doc_id", "text",
        targetPred = col("tgt") === 1, buckets = 64, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(again == got.map { case (id, (_, _, _, rn)) => id -> rn })
  }
}
