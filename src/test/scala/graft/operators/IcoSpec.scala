package graft.operators

import graft.SparkTestBase

/** ICO directory codec: fixture parity against the closed form
  * (including the width-bounded transparency count over a mask whose
  * padding bits are set), refusal contract, refuse-never-crash fuzz.
  */
class IcoSpec extends SparkTestBase {

  private def fixtureBytes(seed: Long): Array[Byte] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = Seq(seed).toDF("doc_id")
    Ico.icoMedia(ids, "doc_id", "doc_id")
      .select(col("data")).collect().head.getAs[Array[Byte]](0)
  }

  test("fixture parity: both directory entries decode to the closed " +
      "form; transparency counts only the first w bits per mask row") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val media = Ico.icoMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Ico.icoStats(media).collect()
      .map(r => (r.doc_id, r.img_idx) ->
        ((r.width, r.height, r.lum_total, r.n_transparent))).toMap
    assert(got.size == 48)
    (0L until 24L).foreach { seed =>
      val dims = Seq(
        ((seed % 6 + 6).toInt, (seed % 5 + 6).toInt),
        ((seed % 3 + 4).toInt, (seed % 2 + 4).toInt))
      dims.zipWithIndex.foreach { case ((w, h), e) =>
        val rs = ((3 * w + 3) / 4) * 4
        var lum = 0L
        (0 until rs * h).foreach { i =>
          if (i % rs < 3 * w) {
            val coef = (i % rs) % 3 match {
              case 0 => 114L; case 1 => 587L; case _ => 299L
            }
            lum += coef * ((seed * 37 + i * 13 + e * 77) % 256)
          }
        }
        val transp = if (e == 0) 0L else w.toLong * h
        assert(got((seed, e)) == ((w, h, lum, transp)),
          s"seed $seed entry $e")
      }
    }
  }

  test("refusals: type, zero count, out-of-range offset, non-24-bit, " +
      "odd doubled height, dim mismatch; fuzz never throws") {
    val good = fixtureBytes(7L)
    assert(Ico.decode(good).exists(_.size == 2))
    def mut(at: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(at) = v.toByte; c
    }
    assert(Ico.decode(mut(2, 2)).isEmpty, "cursor type (2) refuses")
    assert(Ico.decode(mut(4, 0)).isEmpty, "zero entries refuses")
    // entry 0 offset low byte at 6+12=18: point past the payload
    assert(Ico.decode(mut(19, 0x7F)).isEmpty, "offset out of range refuses")
    // entry-0 DIB starts at 38: bitCount field at 38+14
    assert(Ico.decode(mut(38 + 14, 8)).isEmpty, "8-bit DIB refuses")
    // doubled height at 38+8: make it odd
    val h0 = good(38 + 8) & 0xFF
    assert(Ico.decode(mut(38 + 8, h0 + 1)).isEmpty, "odd height refuses")
    // directory width byte disagrees with the DIB
    assert(Ico.decode(mut(6, (good(6) & 0xFF) + 1)).isEmpty,
      "entry/DIB dim mismatch refuses")
    (0 until good.length by 3).foreach(n => Ico.decode(good.take(n)))
    val rnd = new scala.util.Random(45)
    (1 to 300).foreach { _ =>
      Ico.decode(Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte))
    }
  }
}
