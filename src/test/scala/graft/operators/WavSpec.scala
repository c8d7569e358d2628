package graft.operators

import graft.SparkTestBase

/** WAV (RIFF PCM16) codec: chunk-walk correctness (word-aligned skip of
  * unknown chunks), sample decode exactness, refusal of non-PCM16 forms,
  * and refuse-never-crash fuzz.
  */
class WavSpec extends SparkTestBase {

  test("fixture decodes to the closed-form samples exactly (channels, " +
      "rate, frames, energy, peak) including the odd-length LIST skip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 30).select(col("id").as("doc_id"))
    val media = Wav.wavMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Wav.wavStats(media).collect().map(r => r.doc_id -> r).toMap
    assert(got.size == 30)
    (0L until 30L).foreach { seed =>
      val channels = (1 + seed % 2).toInt
      val frames = (200 + seed % 50).toInt
      var energy = 0L
      var peak = 0
      (0 until frames * channels).foreach { i =>
        val s = (((seed * 13 + i.toLong * 29) % 65536) - 32768).toInt
        energy += s.toLong * s
        peak = math.max(peak, math.abs(s))
      }
      val r = got(seed)
      assert((r.channels, r.sample_rate, r.n_frames, r.energy, r.peak) ==
        ((channels, (8000 + 4000 * (seed % 3)).toInt, frames.toLong,
          energy, peak)), s"seed $seed")
    }
  }

  test("wavFrames: channel-0 framing over decoded samples — hand-computed " +
      "stereo case, frame-count formula, sub-frame payloads emit nothing") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // stereo, 100 frames: channel 0 samples are the EVEN interleaved
    // words; a mixed or mono-indexed walk changes every frame energy
    val samples = Array.tabulate[Short](200)(i =>
      (if (i % 2 == 0) (i / 2 + 1) else 30000).toShort)
    val stereo = Wav.encodePcm16(2, 8000, samples)
    val tiny = Wav.encodePcm16(1, 8000, Array.tabulate[Short](40)(_.toByte))
    val media = Seq((1L, stereo), (2L, tiny)).toDF("doc_id", "data")
      .select(col("doc_id"), col("data"), lit("audio/wav").as("mime"),
        octet_length(col("data")).cast("long").as("n_bytes"))
      .as[Multimodal.MediaRow]
    val got = Wav.wavFrames(media, frameLen = 64, hop = 32).collect()
    assert(got.forall(_.doc_id == 1L), "a 40-frame payload has no 64-frame")
    assert(got.length == (100 - 64) / 32 + 1) // = 2 frames
    got.foreach { fr =>
      val base = fr.frame_id.toInt * 32
      var e = 0L; var p = 0
      (0 until 64).foreach { i =>
        val s = base + i + 1 // channel-0 value by construction
        e += s.toLong * s; p = math.max(p, s)
      }
      assert((fr.energy, fr.peak) == ((e, p)),
        s"frame ${fr.frame_id}: channel-0 stride broken")
    }
  }

  test("non-PCM16 forms refuse: float format, 8-bit, missing fmt before " +
      "data, truncated data chunk") {
    val valid = Wav.wavFixture(3L)
    assert(Wav.decodeHeader(valid).isDefined)
    // audioFormat lives at offset 20 (12 RIFF/WAVE + 8 fmt header)
    val floatFmt = valid.clone(); floatFmt(20) = 3
    assert(Wav.decodeHeader(floatFmt).isEmpty, "IEEE-float must refuse")
    val eightBit = valid.clone(); eightBit(34) = 8
    assert(Wav.decodeHeader(eightBit).isEmpty, "8-bit must refuse")
    // truncation inside the data chunk → declared length overruns payload
    assert(Wav.decodeHeader(valid.take(valid.length - 3)).isEmpty)
    // data before fmt: swap the fmt chunk id to an unknown one
    val noFmt = valid.clone()
    noFmt(12) = 'j'.toByte
    assert(Wav.decodeHeader(noFmt).isEmpty)
  }

  test("decodeHeader never throws on junk, truncations, or bit flips " +
      "(refuse-never-crash)") {
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Wav.decodeHeader(junk)
      Wav.decodeHeader("RIFF".getBytes("US-ASCII") ++ junk)
    }
    val valid = Wav.wavFixture(7L)
    (0 until valid.length).foreach(cut => Wav.decodeHeader(valid.take(cut)))
    (1 to 400).foreach { _ =>
      val mut = valid.clone()
      mut(rnd.nextInt(mut.length)) =
        (mut(rnd.nextInt(mut.length)) ^ (1 << rnd.nextInt(8))).toByte
      Wav.decodeHeader(mut) // refuse or parse, never crash
    }
  }

  test("stft power equals the brute-force fixed-point DFT per doc/bin; " +
      "DC bin is the squared scaled frame sum; constant signal " +
      "concentrates in DC") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 12).select(col("id").as("doc_id"))
    val media = Wav.wavMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Wav.stftPower(media).collect()
      .map(r => (r.doc_id, r.bin) -> (r.power, r.n_frames)).toMap
    (0L until 12L).foreach { seed =>
      val ch = (1 + seed % 2).toInt
      val n = (200 + seed % 50).toInt
      val nF = (n - 16) / 8 + 1
      def samp(idx: Int): Long =
        ((seed * 13 + idx.toLong * ch * 29) % 65536) - 32768
      for (k <- 0 until 8) {
        var power = 0L
        for (f <- 0 until nF) {
          var re = 0L; var im = 0L
          for (i <- 0 until 16) {
            val s = samp(f * 8 + i)
            re += s * Wav.StftC(k)(i)
            im += s * Wav.StftS(k)(i)
          }
          power += re * re + im * im
          // DC law inside the loop: bin 0 is (256 * frame sum)^2
          if (k == 0) {
            var fs = 0L
            for (i <- 0 until 16) fs += samp(f * 8 + i)
            assert(re == 256 * fs && im == 0)
          }
        }
        assert(got((seed, k)) == ((power, nF.toLong)), s"doc $seed bin $k")
      }
    }
    // constant PCM concentrates (near-)everything in the DC bin: the
    // rounded basis rows are not EXACTLY zero-sum, so compare mass
    val const = Wav.encodePcm16(1, 8000, Array.fill[Short](128)(1000))
    val one = Seq((99L, const, "audio/wav", const.length.toLong))
      .toDF("doc_id", "data", "mime", "n_bytes").as[Multimodal.MediaRow]
    val bins = Wav.stftPower(one).collect().map(r => r.bin -> r.power).toMap
    assert(bins(0) > 100L * (1 until 8).map(bins(_)).max)
  }

  test("wavResample: a linear ramp resamples EXACTLY, a constant stays " +
      "constant, and stereo reads channel 0; replica parity on random PCM") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def mediaOf(rows: Seq[(Long, Array[Byte])]) =
      rows.map { case (id, b) => (id, b, "audio/wav", b.length.toLong) }
        .toDF("doc_id", "data", "mime", "n_bytes").as[Multimodal.MediaRow]
    // ramp x(j) = 6j: at 3:2 the outputs are exactly 4i (linear signal,
    // exact interpolation) -> energy = 16 * sum i^2 over nOut outputs
    val n = 101
    val ramp = Wav.encodePcm16(1, 8000, Array.tabulate[Short](n)(j => (6 * j).toShort))
    val const = Wav.encodePcm16(1, 8000, Array.fill[Short](50)(123))
    // stereo: channel 0 is the ramp, channel 1 is noise that must not leak
    val stereo = Wav.encodePcm16(2, 8000,
      Array.tabulate[Short](2 * n)(k => if (k % 2 == 0) (6 * (k / 2)).toShort else 9999))
    val got = Wav.wavResample(mediaOf(Seq((1L, ramp), (2L, const), (3L, stereo))))
      .collect().map(r => r.doc_id -> r).toMap
    val nOut = ((n - 1).toLong * 3) / 2 + 1
    val rampEnergy = (0L until nOut).map(i => 16L * i * i).sum
    assert(got(1L).n_out == nOut && got(1L).energy == rampEnergy
      && got(1L).peak == 4 * (nOut - 1), got(1L).toString)
    assert(got(2L).n_out == ((50 - 1) * 3) / 2 + 1
      && got(2L).energy == got(2L).n_out * 123L * 123L
      && got(2L).peak == 123, got(2L).toString)
    assert(got(3L).energy == got(1L).energy && got(3L).peak == got(1L).peak,
      "stereo channel 0 must equal the mono ramp")
    // replica parity on random PCM incl. negative samples
    val rnd = new scala.util.Random(7)
    val xs = Array.fill[Short](77)((rnd.nextInt(65536) - 32768).toShort)
    val gotR = Wav.wavResample(mediaOf(Seq((9L, Wav.encodePcm16(1, 8000, xs)))))
      .collect().head
    var energy = 0L; var peak = 0
    val no = ((xs.length - 1).toLong * 3) / 2 + 1
    (0L until no).foreach { i =>
      val num = i * 2; val idx = (num / 3).toInt; val rem = (num % 3).toInt
      val o = if (rem == 0) xs(idx).toInt
        else xs(idx) + Math.floorDiv((xs(idx + 1) - xs(idx)).toLong * rem, 3L).toInt
      energy += o.toLong * o; peak = math.max(peak, math.abs(o))
    }
    assert(gotR.energy == energy && gotR.peak == peak && gotR.n_out == no)
  }

  test("mulaw: exhaustive 16-bit round-trip obeys the G.711 contract — " +
      "zero fixed point, sign symmetry, monotone decode, bounded error") {
    // exhaustive over every signed 16-bit input: cheap and total
    var prev = Integer.MIN_VALUE
    (-32768 to 32767).foreach { x =>
      val c = Wav.mulawEncode(x)
      assert((c & ~0xFF) == 0, s"codeword out of byte range for $x")
      val y = Wav.mulawDecode(c)
      // segment step is 8<<seg in the 16-bit domain; clipping adds the
      // tail above 8158<<2 = 32632 -> error there stays under 512+140
      val seg = {
        val v = math.min(math.abs(x) >> 2, 8158) + 33
        var s = 0; while ((v >> (s + 6)) != 0) s += 1; s
      }
      assert(math.abs(y - x) <= (8 << seg) + 132 + (math.abs(x) - 32632).max(0),
        s"x=$x y=$y seg=$seg")
      // decode∘encode is monotone non-decreasing in x
      assert(y >= prev, s"monotonicity broke at $x: $y < $prev")
      prev = y
      if (x >= 0 && x != -32768)
        assert(Wav.mulawDecode(Wav.mulawEncode(-x)) == -y,
          s"sign symmetry broke at $x")
    }
    assert(Wav.mulawDecode(Wav.mulawEncode(0)) == 0, "zero must be a fixed point")

    // fixture parity: wavMulaw over channel-0 closed-form samples
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.range(0, 20).select(col("id").as("doc_id"))
    val media = Wav.wavMedia(ids, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val got = Wav.wavMulaw(media).collect().map(r => r.doc_id -> r).toMap
    assert(got.size == 20)
    (0L until 20L).foreach { seed =>
      val ch = (1 + seed % 2).toInt
      val nf = (200 + seed % 50).toInt
      var energy = 0L; var peak = 0; var maxErr = 0
      (0 until nf).foreach { t =>
        val x = (((seed * 13 + (t * ch).toLong * 29) % 65536) - 32768).toInt
        val y = Wav.mulawDecode(Wav.mulawEncode(x))
        energy += y.toLong * y
        peak = math.max(peak, math.abs(y))
        maxErr = math.max(maxErr, math.abs(y - x))
      }
      val r = got(seed)
      assert((r.n_samples, r.energy, r.peak, r.max_err) ==
        ((nf.toLong, energy, peak, maxErr)), s"seed $seed")
    }
  }
}
