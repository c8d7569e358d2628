package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized equivalence: the composed as-of join, the native
  * AsOfJoinExec, and an in-memory reference implementation must agree on
  * arbitrary tables — including null keys and null timestamps on both
  * sides (the SQL ASOF equi-key is null-rejecting) and duplicate
  * (key, ts) right rows (struct-greatest tie-break).
  *
  * ScalaCheck generators with fixed seeds: deterministic CI, arbitrary
  * shapes. Each dataset runs as one Spark job per form.
  */
class AsOfPropertySpec extends SparkTestBase {

  private val rowL = for {
    k <- Gen.option(Gen.choose(1L, 4L))
    t <- Gen.option(Gen.choose(0L, 20L))
  } yield (k, t)

  private val rowR = for {
    k <- Gen.option(Gen.choose(1L, 4L))
    t <- Gen.option(Gen.choose(0L, 20L))
    p <- Gen.choose(100L, 115L) // narrow: forces duplicate (key, ts) rows
    v <- Gen.choose(0, 9)
  } yield (k, t, p, v.toDouble)

  /** Ground truth: latest right row with r.ts <= l.ts per key, null keys
    * and timestamps matching nothing, ties resolved to the struct-greatest
    * (p_id, p_value) payload.
    */
  private def reference(left: Seq[(Option[Long], Option[Long], Long)],
                        right: Seq[(Option[Long], Option[Long], Long, Double)])
      : Map[Long, (Option[Long], Option[Double])] =
    left.map { case (k, t, id) =>
      val m = (k, t) match {
        case (Some(kk), Some(tt)) =>
          right.filter(r => r._1.contains(kk) && r._2.exists(_ <= tt))
            .sortBy(r => (r._2.get, r._3, r._4))
            .lastOption
        case _ => None
      }
      id -> (m.map(_._3), m.map(_._4))
    }.toMap

  test("composed and native as-of agree with the reference on random tables") {
    import spark.implicits._
    var seed = Seed(20260812L)
    for (round <- 1 to 5) {
      val lRows = Gen.listOfN(30, rowL).pureApply(Gen.Parameters.default, seed)
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      seed = seed.next
      val rRows = Gen.listOfN(25, rowR).pureApply(Gen.Parameters.default, seed)
      seed = seed.next

      val left = lRows.toDF("user_id", "ts", "event_id")
      val right = rRows.toDF("user_id", "ts", "p_id", "p_value")
      val want = reference(lRows, rRows)

      for ((label, df) <- Seq(
          "composed" -> AsOf.join(left, right, "user_id", "ts", Seq("p_id", "p_value")),
          "native" -> AsOf.joinNative(left, right, "user_id", "ts", Seq("p_id", "p_value")))) {
        val got = df.select("event_id", "p_id", "p_value").collect()
          .map { r =>
            r.getLong(0) -> (
              if (r.isNullAt(1)) None else Some(r.getLong(1)),
              if (r.isNullAt(2)) None else Some(r.getDouble(2)))
          }.toMap
        assert(got == want, s"round $round, $label form diverged from reference")
      }
    }
  }
}
