package graft.operators

import graft.SparkTestBase

class LinkageSpec extends SparkTestBase {

  test("fsLink: agreement tiers and threshold on a hand corpus; blocks " +
      "never cross") {
    import spark.implicits._
    val recs = Seq(
      (1L, "ACCT0001", 1, 500.0, "A"),  // base
      (2L, "ACCT0002", 1, 520.0, "A"),  // 1 sub, bal close, same seg → 3.9
      (3L, "ACCT0391", 1, 510.0, "A"),  // 2 subs → name disagree → 0.2, out
      (4L, "ACCT000l", 1, 5000.0, "A"), // 1 sub but bal far → 2.1, out
      (5L, "ACCT0003", 1, 490.0, "B"),  // 1 sub, bal close, other seg → 2.9
      (6L, "ACCT0001", 2, 500.0, "A")   // same name, other block: never paired
    ).toDF("id", "name", "blk", "bal", "seg")
    val got = Linkage.fsLink(recs, "id", "name", "blk", "bal", "seg")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getDouble(5))).toMap
    assert(got((1L, 2L)) == ((1L, true, 3.9)))
    assert(got((1L, 5L)) == ((1L, false, 2.9)))
    assert(got((2L, 5L)) == ((1L, false, 2.9)))
    assert(got.size == 3, s"no other pair may reach the threshold: $got")
  }

  test("fsLink equals the unblocked all-pairs scorer: parity blocking " +
      "loses no match") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val base = (0 until 80).map { i =>
      val name = (0 until 10).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
      (i.toLong, name, i % 3, rng.nextInt(2000).toDouble,
        if (rng.nextBoolean()) "X" else "Y")
    }
    val dirty = base.filter(_._1 % 2 == 0).map { case (id, nm, blk, bal, seg) =>
      val pos = rng.nextInt(nm.length)
      (id + 1000L, nm.updated(pos, if (nm(pos) == 'a') 'b' else 'a'),
        blk, bal + rng.nextInt(150), seg)
    }
    val rows = base ++ dirty
    val got = Linkage.fsLink(rows.toDF("id", "name", "blk", "bal", "seg"),
        "id", "name", "blk", "bal", "seg")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
    // brute force: every within-block pair, no name blocking. For
    // equal-length names lev ≤ 1 ⇔ hamming ≤ 1 (an insert/delete changes
    // the length), which is the only way name_lev enters the score.
    def r2(x: Double) =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      a <- rows; b <- rows
      if a._3 == b._3 && a._1 < b._1
      ham = a._2.zip(b._2).count(t => t._1 != t._2)
      score = r2((if (ham <= 1) 2.2 else -1.5) +
        (if (math.abs(a._4 - b._4) <= 100.0) 1.1 else -0.7) +
        (if (a._5 == b._5) 0.6 else -0.4))
      if score >= 2.5
    } yield (a._1, b._1, score)).toSet
    assert(expected.nonEmpty, "fixture must produce matches")
    assert(got == expected,
      s"blocked result diverged: missing=${expected -- got} extra=${got -- expected}")
  }
}
