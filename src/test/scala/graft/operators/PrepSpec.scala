package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class PrepSpec extends SparkTestBase {

  test("packSequences: offsets and chunk spans match hand computation") {
    import spark.implicits._
    // token counts: [3, 2, 5, 1, 4], budget 4
    val docs = Seq(
      (0L, "a a a"), (1L, "b b"), (2L, "c c c c c"),
      (3L, "d"), (4L, "e e e e")).toDF("doc_id", "text")
    val got = Prep.packSequences(docs, "doc_id", "text",
        budget = 4, blockSize = 2)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(0L) == ((3L, 0L, 0L, 0L)))
    assert(got(1L) == ((2L, 3L, 0L, 1L)))  // straddles the 4-token boundary
    assert(got(2L) == ((5L, 5L, 1L, 2L)))
    assert(got(3L) == ((1L, 10L, 2L, 2L)))
    assert(got(4L) == ((4L, 11L, 2L, 3L)))
  }

  test("packSequences: two-level prefix sum equals the naive global window") {
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val fast = Prep.packSequences(docs, "doc_id", "text",
        budget = 16, blockSize = 8)
      .orderBy("doc_id").collect().map(_.toSeq)
    val naive = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("n_tok"),
        (col("cum") - col("n_tok")).as("tok_start"),
        floor((col("cum") - col("n_tok")) / 16).cast("long").as("seq_first"),
        floor((col("cum") - 1) / 16).cast("long").as("seq_last"))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(fast.toSeq == naive.toSeq)
  }

  test("weightedSample: boundary weights, monotone in the weight") {
    import spark.implicits._
    val ids = (1L to 400L)
    val base = ids.map(i => (i, 0.3)).toDF("id", "w")
    // weight 1 keeps everything, weight 0 nothing
    assert(Prep.weightedSample(ids.map((_, 1.0)).toDF("id", "w"), "id", "w")
      .count() == 400L)
    assert(Prep.weightedSample(ids.map((_, 0.0)).toDF("id", "w"), "id", "w")
      .count() == 0L)
    // monotone: the 0.3-sample is a subset of the 0.6-sample, and the
    // realized rates bracket their weights sensibly
    val lo = Prep.weightedSample(base, "id", "w")
      .collect().map(_.getLong(0)).toSet
    val hi = Prep.weightedSample(ids.map((_, 0.6)).toDF("id", "w"), "id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "raising every weight must only add rows")
    assert(lo.size > 400 * 0.15 && lo.size < 400 * 0.45, s"rate ${lo.size}/400")
    // deterministic: the same call selects the identical id set
    val again = Prep.weightedSample(base, "id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(again == lo)
  }

  test("interleaveSources: strided slots, sources cycle, no collisions") {
    import spark.implicits._
    val df = ((0 until 6).map(i => (i.toLong, "a")) ++
      (10 until 14).map(i => (i.toLong, "b")) ++
      (20 until 22).map(i => (i.toLong, "c"))).toDF("id", "s")
    val got = Prep.interleaveSources(df, "id", "s").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 12)
    // slots are unique, and slot mod n_sources identifies the source
    assert(got.map(_._3).distinct.length == 12)
    val idx = Map("a" -> 0L, "b" -> 1L, "c" -> 2L)
    got.foreach { case (_, s, slot) => assert(slot % 3 == idx(s)) }
    // within a source, slots are the consecutive stride positions
    val aSlots = got.filter(_._2 == "a").map(_._3).sorted
    assert(aSlots.toSeq == (0 until 6).map(r => r * 3L + 0L))
  }

  test("mixStrata: exact target proportions, never oversampling a stratum") {
    import spark.implicits._
    // counts: a=100, b=30, c=15; weights 0.5/0.3/0.2
    // feasible N = min(100/.5=200, 30/.3=100, 15/.2=75) = 75
    // quotas: a=37, b=22, c=15 (binding stratum taken whole)
    val df = ((0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 130).map(i => (i.toLong, "b")) ++
      (130 until 145).map(i => (i.toLong, "c"))).toDF("id", "s")
    val got = Prep.mixStrata(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val byStratum = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("a" -> 37L, "b" -> 22L, "c" -> 15L))
    // deterministic: a re-run selects the identical id set
    val ids1 = got.orderBy("id").collect().map(_.getLong(0)).toSeq
    val ids2 = Prep.mixStrata(df, "id", "s",
        Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids1 == ids2)
    // unweighted strata are dropped entirely
    val withExtra = df.union(Seq((900L, "z")).toDF("id", "s"))
    val gotExtra = Prep.mixStrata(withExtra, "id", "s",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    assert(gotExtra.filter(col("s") === "z").count() == 0L)
  }

  test("curriculum: contiguous easy-to-hard stages; sketch tier agrees " +
      "away from cutpoints") {
    import spark.implicits._
    // 40 docs with distinct scores 1..40 → 4 stages of exactly 10
    val scored = (1L to 40L).map(i => (i, (41 - i).toDouble)).toDF("id", "score")
    val exact = Prep.curriculum(scored, "id", "score", stages = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(exact.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(1L -> 10, 2L -> 10, 3L -> 10, 4L -> 10))
    // score DESC in id → stage DESC in id: id 40 has the lowest score
    assert(exact(40L) == 1L && exact(1L) == 4L)
    // monotone: a lower score never lands in a later stage
    val byScore = scored.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (a <- 1L to 40L; b <- 1L to 40L if byScore(a) < byScore(b))
      assert(exact(a) <= exact(b))
    // sketch tier: with accuracy far above n the cutpoints are exact and
    // the row-local bucketing must reproduce the NTILE stages
    val sk = Prep.curriculumBySketch(scored, "id", "score", stages = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sk == exact, s"sketch stages diverged: ${sk.toSeq.diff(exact.toSeq)}")
  }

  test("tokenBudgetMix: per-stratum tokens exceed the budget by at most " +
      "the crossing doc, selection is hash-deterministic and " +
      "partition-independent") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val budgets = Map("en" -> 3000L, "de" -> 1500L, "es" -> 1500L,
      "fr" -> 800L, "zh" -> 800L)
    val out = Prep.tokenBudgetMix(docs, "doc_id", "lang", "text", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      val b = budgets(lang)
      assert(total < b + maxDoc,
        s"$lang: $total tokens exceeds budget $b by more than one doc")
      // every kept doc's cum_before < budget by construction
      assert(rows.forall { case (_, _, nt, cum) => cum - nt < b })
      // the LAST doc in hash order is the only one allowed to cross
      assert(rows.count { case (_, _, _, cum) => cum > b } <= 1)
    }
    val out7 = Prep.tokenBudgetMix(docs.repartition(7), "doc_id", "lang",
        "text", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out7.toSet == out.toSet, "partitioning changed the selection")
  }

  test("trainValTestSplit: exact 10/10/80 per stratum at small sizes, " +
      "NULL strata are a legitimate group (no rows dropped)") {
    import spark.implicits._
    val rows = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) null else s"s${i % 3}"))
    val df = rows.toDF("id", "lang")
    val got = Prep.trainValTestSplit(df, "id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
    assert(got.length == 200, "no row may be dropped - including NULL strata")
    // per-stratum ratios exact +-1 at any size (the global-rank contract)
    got.groupBy(_._2).foreach { case (stratum, rs) =>
      val n = rs.length
      val test = rs.count(_._3 == "test")
      assert(math.abs(test - n / 10.0) <= 1.0,
        s"stratum $stratum: $test test of $n")
    }
  }

  test("kFold: every row gets exactly one fold, strata balanced to ±salts, " +
      "deterministic re-run") {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val a = Prep.kFold(df, "id", "src", k = 5, salts = 8)
    assert(a.count() == 500, "assignment is a partition of the input")
    assert(a.select("fold").distinct().collect().map(_.getLong(0)).sorted
      .sameElements(Array(0L, 1L, 2L, 3L, 4L)), "all 5 folds populated")
    // balance: per (stratum, salt) block each fold gets rank-mod-k ±1
    // rows, so across the 8 salts fold sizes within a stratum differ by
    // at most `salts`
    val spread = a.groupBy("src", "fold").count().collect()
      .groupBy(_.getString(0)).map { case (_, rows) =>
        val ns = rows.map(_.getLong(2)); ns.max - ns.min }
    assert(spread.forall(_ <= 8), s"per-stratum fold spread over salts: $spread")
    val b = Prep.kFold(df, "id", "src", k = 5, salts = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "assignment must be deterministic")
  }

  test("shuffleOrder: block prefix sum equals the naive global window, " +
      "seeds give distinct permutations") {
    import spark.implicits._
    val df = (0L until 700L).map(identity).toDF("id")
    val got = Prep.shuffleOrder(df, "id", seed = 7)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(2)))
    // a permutation: positions are exactly 0..n-1
    assert(rows.map(_._2).sorted.toSeq == (0L until 700L).toSeq)
    // two-level prefix sum == single-task global row_number over the key
    val naive = df
      .withColumn("sk", md5(concat(col("id").cast("string"), lit(":7"))))
      .withColumn("pos", row_number().over(Window.orderBy("sk")).cast("long") - 1)
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { case (id, pos) => assert(pos === naive(id), s"id $id") }
    // a different seed is a genuinely different permutation
    val other = Prep.shuffleOrder(df, "id", seed = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows.count { case (id, pos) => other(id) == pos } < 100,
      "seeds 7 and 8 must not share the permutation")
  }

  test("augmentDropout: reproducible mask, brute-force fingerprint, " +
      "~10% drop rate, bookkeeping closes") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val got = Prep.augmentDropout(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // reproducible: a second run is bit-identical
    val again = Prep.augmentDropout(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got == again)
    // brute-force mask + fingerprint per doc
    val raw = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    raw.take(50).foreach { case (id, text) =>
      val toks = text.split(" ")
      val kept = toks.zipWithIndex.filter { case (_, i) =>
        val h = new java.math.BigInteger(md5hex(s"$id:$i").take(15), 16)
        h.mod(java.math.BigInteger.valueOf(10)).longValue != 0L
      }.map(_._1)
      val (n, nd, fp) = got(id)
      assert(n == toks.length && nd == toks.length - kept.length, s"doc $id")
      assert(fp == md5hex(kept.mkString(" ")), s"doc $id fingerprint")
    }
    // corpus-level drop rate near 10%
    val (tot, dropped) = got.values.foldLeft((0L, 0L)) {
      case ((a, b), (n, nd, _)) => (a + n, b + nd) }
    val rate = dropped.toDouble / tot
    assert(rate > 0.07 && rate < 0.13, s"drop rate $rate")
  }

  test("chunkDocs: every token covered, interior chunks overlap by " +
      "size - stride, content fingerprints recompute, short docs emit " +
      "one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),  // 100 tokens
      (2L, "only three tokens"),                         // < size
      (3L, (1 to 32).map(i => s"u$i").mkString(" ")),    // exactly size
      (4L, (1 to 33).map(i => s"v$i").mkString(" ")))    // size + 1
      .toDF("doc_id", "text")
    val got = Prep.chunkDocs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getString(3)))
    val byDoc = got.groupBy(_._1)
    // chunk counts: ceil((100-32)/24)+1 = 4; 1; 1; 2
    assert(byDoc(1L).length == 4 && byDoc(2L).length == 1 &&
      byDoc(3L).length == 1 && byDoc(4L).length == 2)
    // coverage + geometry + content on the 100-token doc
    val toks = (1 to 100).map(i => s"t$i")
    byDoc(1L).sortBy(_._2).foreach { case (_, c, n, fp) =>
      val from = (c * 24).toInt
      val expect = toks.slice(from, from + 32)
      assert(n == expect.length)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(expect.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == md, s"chunk $c fingerprint")
    }
    // last chunk reaches the final token
    val lastFrom = (byDoc(1L).map(_._2).max * 24).toInt
    assert(lastFrom + byDoc(1L).maxBy(_._2)._3 == 100)
    // single-chunk docs carry their full token count
    assert(byDoc(2L).head._3 == 3 && byDoc(3L).head._3 == 32)
  }

  test("scaleStats: exact replica on a hand group; z of the extremes " +
      "brackets zero; min-max position of the mean is inside (0,1)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vals = Seq(100L, 200L, 300L, 400L, 1000L)
    val df = vals.map(v => ("g", v)).toDF("grp", "v")
    val got = Prep.scaleStats(df, "grp", col("v")).collect().head
    val n = vals.length
    val mean = vals.sum.toDouble / n
    val std = math.sqrt((vals.map(v => v.toDouble * v).sum -
      vals.sum.toDouble * vals.sum / n) / n)
    assert(got.getLong(1) == n)
    assert(got.getLong(2) == math.floor(mean * 10000).toLong)
    assert(got.getLong(3) == math.floor(std * 10000).toLong)
    assert(got.getLong(4) ==
      math.floor((vals.max - mean) / std * 10000).toLong)
    assert(got.getLong(5) ==
      math.floor((vals.min - mean) / std * 10000).toLong)
    assert(got.getLong(6) == math.floor(
      (mean - vals.min) / (vals.max - vals.min).toDouble * 1000000).toLong)
    // invariants any scaler must satisfy
    assert(got.getLong(4) > 0 && got.getLong(5) < 0)
    assert(got.getLong(6) > 0 && got.getLong(6) < 1000000)
  }

  test("binStats: uniform 0..99 pins both cuts; max value caps into the " +
      "top width bin; a constant group takes the mx=mn guard") {
    import spark.implicits._
    val rows = (0 until 100).map(i => ("A", i.toLong, f"k$i%03d")) ++
      (0 until 20).map(i => ("C", 7L, f"k$i%03d"))
    val got = Prep.binStats(rows.toDF("g", "v", "k"), "g", col("v"),
        col("k")).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    (0 until 10).foreach { b =>
      // width: v=10b..10b+9 all map to bin b except v=99 capping into 9
      val expWidth = if (b == 9) 10L else 10L
      val (nw, nf, lo, hi) = got(("A", b))
      assert(nw == expWidth && nf == 10L, s"bin $b")
      assert(lo == 10L * b && hi == 10L * b + 9, s"bin $b range")
    }
    // constant group: every row lands in width bin 0; ntile still cuts
    // 10 tiles of 2 over the identical values
    assert(got(("C", 0)) == ((20L, 2L, 7L, 7L)))
    assert(got(("C", 9)) == ((0L, 2L, 7L, 7L)))
  }
}
