package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants of the Misra–Gries sketch — pure Scala, no
  * Spark: random skewed streams, random capacities, and random
  * SEGMENTATIONS merged in random order (the distributed partial/final
  * lifecycle is exactly "segment arbitrarily, merge in arbitrary
  * order", so the bounds must hold for every such decomposition, not
  * just the sequential feed).
  */
class MGSketchPropertySpec extends AnyFunSuite {

  // skewed vocabulary: item i drawn with weight ∝ 1/(i+1) (zipf-ish),
  // so every stream has genuine heavy hitters AND a long tail
  private val itemGen: Gen[String] =
    Gen.frequency((1 to 40).map(i => (40 / i, Gen.const(s"w$i"))): _*)

  private def checkBounds(sketch: Map[String, Long], exact: Map[String, Long],
                          k: Int, n: Long, ctx: String): Unit = {
    val bar = n.toDouble / (k + 1)
    assert(sketch.size <= k, s"$ctx: size ${sketch.size} > k=$k")
    sketch.foreach { case (g, est) =>
      val t = exact.getOrElse(g, 0L)
      assert(est <= t, s"$ctx: $g overcounted $est > $t")
    }
    exact.foreach { case (g, t) =>
      val est = sketch.getOrElse(g, 0L)
      assert(t - est <= bar, s"$ctx: $g error ${t - est} > N/(k+1)=$bar")
      if (t > bar) assert(sketch.contains(g), s"$ctx: heavy $g ($t) dropped")
    }
  }

  test("bounds hold on random streams, capacities, and merge trees") {
    var seed = Seed(1234L)
    for (round <- 1 to 25) {
      val params = Gen.Parameters.default
      val stream = Gen.listOfN(800, itemGen).pureApply(params, seed); seed = seed.next
      val k = Gen.choose(4, 48).pureApply(params, seed); seed = seed.next
      val nSeg = Gen.choose(1, 9).pureApply(params, seed); seed = seed.next
      val exact = stream.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
      // sequential feed
      val seq = new MGSketch(k)
      stream.foreach(seq.add)
      checkBounds(seq.toMap, exact, k, stream.size.toLong, s"r$round seq k=$k")
      // random segmentation, each segment its own sketch, random-order merge
      val cuts = Gen.listOfN(nSeg - 1, Gen.choose(0, stream.size))
        .pureApply(params, seed); seed = seed.next
      val bounds = (0 +: cuts.sorted :+ stream.size).distinct.sorted
      val parts = bounds.zip(bounds.tail).map { case (a, b) =>
        val sk = new MGSketch(k)
        stream.slice(a, b).foreach(sk.add)
        sk
      }
      val order = scala.util.Random.javaRandomToRandom(
        new java.util.Random(round * 7919L)).shuffle(parts)
      val merged = order.reduce((a, b) => a.mergeWith(b))
      checkBounds(merged.toMap, exact, k, stream.size.toLong,
        s"r$round merged($nSeg) k=$k")
    }
  }

  test("over-capacity is exact for any stream") {
    var seed = Seed(99L)
    for (_ <- 1 to 10) {
      val stream = Gen.listOfN(500, itemGen).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val exact = stream.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
      val sk = new MGSketch(4096)
      stream.foreach(sk.add)
      assert(sk.toMap === exact)
    }
  }
}
