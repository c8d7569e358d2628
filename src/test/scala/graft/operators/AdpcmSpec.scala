package graft.operators

import graft.SparkTestBase

/** IMA ADPCM codec: step-table recurrence exactness (hand-decoded
  * vectors with sign, index adaptation, and both clamps), container
  * refusal contract, refuse-never-crash fuzz, fixture parity.
  */
class AdpcmSpec extends SparkTestBase {

  private def stats(payload: Array[Byte]): Option[(Long, Long, Int)] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val media = Seq((1L, payload)).toDF("doc_id", "data")
      .select(col("doc_id"), col("data"), lit("audio/adpcm").as("mime"),
        octet_length(col("data")).cast("long").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Adpcm.adpcmStats(media).collect()
      .headOption.map(r => (r.n_samples, r.energy, r.peak))
  }

  test("decode: hand-pinned nibble walk with sign bit, index " +
      "adaptation, and both s16/index clamps") {
    // block_align 6 -> 4 nibbles; nibbles (low-first) 1, 7, 15, 9 off
    // pred=100, index=0: steps 7,7,16,34 give samples
    // 100, 101, 112, 82, 70
    val p1 = Adpcm.encodeContainer(8000, 6, 5,
      Seq((100, 0, Array[Byte](0x71, 0x9F.toByte))))
    assert(stats(p1).contains((5L, 44369L, 112)))
    // block_align 5 -> 2 nibbles 7, 15 off pred=32700, index=88:
    // diff=61436 both ways -> clamp to 32767, then down to -28669
    val p2 = Adpcm.encodeContainer(8000, 5, 3,
      Seq((32700, 88, Array[Byte](0xF7.toByte))))
    val e2 = 32700L * 32700 + 32767L * 32767 + 28669L * 28669
    assert(stats(p2).contains((3L, e2, 32767)))
    // fact truncation: same block, fact=2 -> third sample never decoded
    val p3 = Adpcm.encodeContainer(8000, 5, 2,
      Seq((32700, 88, Array[Byte](0xF7.toByte))))
    assert(stats(p3).contains((2L, 32700L * 32700 + 32767L * 32767, 32767)))
    // two blocks: the second header resets predictor AND index
    val p4 = Adpcm.encodeContainer(8000, 5, 6, Seq(
      (100, 0, Array[Byte](0x71)),
      (-200, 0, Array[Byte](0x71))))
    // per block (index 0, nibbles 1,7): p, p+1, p+12
    val e4 = (100L * 100 + 101L * 101 + 112L * 112) +
      (200L * 200 + 199L * 199 + 188L * 188)
    assert(stats(p4).contains((6L, e4, 200)))
  }

  test("refusals: stereo, wrong tag/bits, inconsistent samplesPerBlock, " +
      "fact over capacity, ragged data; fuzz never throws") {
    val good = Adpcm.encodeContainer(8000, 6, 5,
      Seq((100, 0, Array[Byte](0x71, 0x9F.toByte))))
    assert(Adpcm.decodeHeader(good).isDefined)
    def mut(at: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(at) = v.toByte; c
    }
    // fmt starts at 12: tag@20, channels@22, blockAlign@28+12=40?
    // layout: fmt id 12..15, len 16..19, tag 20, ch 22, rate 24,
    // byteRate 28, align 32, bits 34, cbSize 36, spb 38
    assert(Adpcm.decodeHeader(mut(20, 0x01)).isEmpty, "PCM tag refuses")
    assert(Adpcm.decodeHeader(mut(22, 2)).isEmpty, "stereo refuses")
    assert(Adpcm.decodeHeader(mut(34, 8)).isEmpty, "8-bit refuses")
    assert(Adpcm.decodeHeader(mut(38, 4)).isEmpty,
      "samplesPerBlock inconsistent with block_align refuses")
    // fact over the block capacity refuses (fact value at offset 48)
    assert(Adpcm.decodeHeader(mut(48, 200)).isEmpty)
    // ragged data: shrink the data chunk so len % align != 0
    val ragged = good.clone()
    ragged(56) = 5 // data len field 6 -> 5
    assert(Adpcm.decodeHeader(ragged.dropRight(1)).isEmpty)
    (0 until good.length).foreach(n => Adpcm.decodeHeader(good.take(n)))
    val rnd = new scala.util.Random(44)
    (1 to 300).foreach { _ =>
      Adpcm.decodeHeader(
        Array.fill[Byte](rnd.nextInt(120))(rnd.nextInt(256).toByte))
    }
  }

  test("fixture parity: adpcmMedia decodes through adpcmStats to the " +
      "closed-form predictor + offset sequence") {
    import org.apache.spark.sql.functions._
    val ids = spark.range(0, 24).select(col("id").as("doc_id"))
    val got = graft.operators.LlmQueriesTestHook.adpcmRows(ids)
    assert(got.size == 24)
    (0L until 24L).foreach { seed =>
      val nb = (seed % 7 + 6).toInt
      var energy = 0L; var peak = 0
      (0 until nb).foreach { b =>
        val p = (((seed * 37 + b * 101) % 4000) - 2000).toInt
        energy += p.toLong * p + 4L * (p + 2) * (p + 2) + 4L * (p + 1) * (p + 1)
        peak = math.max(peak, math.max(math.abs(p),
          math.max(math.abs(p + 1), math.abs(p + 2))))
      }
      assert(got(seed) == ((nb * 9L, energy, peak)), s"seed $seed")
    }
  }
}

/** Test-side hook running the fixture → decode pipeline off an id frame. */
object LlmQueriesTestHook {
  def adpcmRows(ids: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Int)] = {
    import org.apache.spark.sql.functions._
    val spark = ids.sparkSession
    import spark.implicits._
    val media = Adpcm.adpcmMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Adpcm.adpcmStats(media).collect()
      .map(r => r.doc_id -> ((r.n_samples, r.energy, r.peak))).toMap
  }
}
