package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WAV (RIFF PCM) codec — the AUDIO container leg of the real-decode
  * pipeline (images: PPM/BMP raw, PNG/JPEG compressed; this is the format
  * an audio lake actually ingests). Public-spec RIFF parsing: `RIFF`
  * header + `WAVE` form type, chunk walk with word-aligned sizes,
  * `fmt ` (PCM format 1, 16-bit samples only — compressed/float formats
  * REFUSE, never fabricate), unknown chunks (LIST/INFO/fact/cue) skipped,
  * `data` holding little-endian interleaved PCM16 frames.
  *
  * Scale: decode is partition-wise ([[wavStats]]) — per-payload header
  * parse + one linear pass over the sample words, nothing shuffles;
  * per-doc audio features (energy, peak) aggregate in the same pass.
  */
object Wav {

  /** Parsed geometry + the sample region. `nFrames` = samples per
    * channel; data holds `nFrames · channels` interleaved 16-bit words.
    */
  final case class WavInfo(channels: Int, sampleRate: Int, nFrames: Int,
                           dataOffset: Int)

  private def le16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)
  private def le32(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8) |
      ((d(p + 2) & 0xFF) << 16) | ((d(p + 3) & 0xFF) << 24)

  /** Header + chunk walk; None on anything malformed or non-PCM16. */
  def decodeHeader(data: Array[Byte]): Option[WavInfo] = {
    if (data.length < 44) return None
    if (data(0) != 'R' || data(1) != 'I' || data(2) != 'F' || data(3) != 'F')
      return None
    if (data(8) != 'W' || data(9) != 'A' || data(10) != 'V' || data(11) != 'E')
      return None
    var p = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var fmtSeen = false
    while (p + 8 <= data.length) {
      val id = new String(data, p, 4, "US-ASCII")
      val len = le32(data, p + 4)
      if (len < 0 || p + 8 + len.toLong > data.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(data, p + 8)
          channels = le16(data, p + 10)
          rate = le32(data, p + 12)
          bits = le16(data, p + 22)
          // PCM 16-bit only — ADPCM/float/extensible refuse
          if (audioFormat != 1 || bits != 16 || channels < 1 ||
              channels > 8 || rate <= 0) return None
          fmtSeen = true
        case "data" =>
          if (!fmtSeen) return None
          val words = len / 2
          if (words % channels != 0) return None
          return Some(WavInfo(channels, rate, words / channels, p + 8))
        case _ => // LIST/fact/cue/bext… skipped
      }
      p += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** Sample at interleaved word index i (signed 16-bit LE). */
  @inline private def sample(data: Array[Byte], info: WavInfo, i: Int): Int = {
    val p = info.dataOffset + 2 * i
    ((data(p) & 0xFF) | (data(p + 1) << 8)).toShort.toInt
  }

  case class WavStatsRow(doc_id: Long, channels: Int, sample_rate: Int,
                         n_frames: Long, energy: Long, peak: Int)

  /** Partition-wise decode + one-pass per-doc audio features: sum of
    * squared samples (Long-exact: 32767² · words ≤ 2^63 below ~8.5e9
    * words/doc) and peak magnitude. Undecodable payloads emit no row.
    */
  def wavStats(media: Dataset[Multimodal.MediaRow]): Dataset[WavStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          val words = info.nFrames * info.channels
          var energy = 0L
          var peak = 0
          var i = 0
          while (i < words) {
            val s = sample(r.data, info, i)
            energy += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          WavStatsRow(r.doc_id, info.channels, info.sampleRate,
            info.nFrames.toLong, energy, peak)
        }
      }
    }
  }

  case class WavResampleRow(doc_id: Long, n_in: Long, n_out: Long,
                            energy: Long, peak: Int)

  /** Rational `up:dn` LINEAR resampler over decoded channel-0 PCM (the
    * 8 kHz → 12 kHz shape every mixed-rate audio corpus needs before
    * batch feature extraction). Output sample i sits at input position
    * `i·dn/up`; with `idx = (i·dn) div up` and `rem = (i·dn) mod up`,
    *
    *   out(i) = x(idx) + floorDiv((x(idx+1) − x(idx)) · rem, up)
    *
    * — all-integer, so the emitted energy/peak are exact and an external
    * oracle replays the interpolation bit-for-bit (floorDiv ≡ FLOOR of
    * the exact double quotient at these magnitudes). When rem = 0 the
    * neighbor is never read, so the final output (which lands exactly ON
    * the last input sample) needs no padding. Row-local like
    * [[wavFrames]]: one decode + one pass, nothing shuffles; a linear
    * signal resamples exactly (spec-pinned), a band-limited
    * reconstruction tier would swap the kernel, not the plumbing.
    */
  def wavResample(media: Dataset[Multimodal.MediaRow], up: Int = 3,
                  dn: Int = 2): Dataset[WavResampleRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          val n = info.nFrames
          val ch = info.channels
          val nOut = if (n == 0) 0L else ((n - 1).toLong * up) / dn + 1
          var energy = 0L
          var peak = 0
          var i = 0L
          while (i < nOut) {
            val num = i * dn
            val idx = (num / up).toInt
            val rem = (num % up).toInt
            val x0 = sample(r.data, info, idx * ch)
            val out =
              if (rem == 0) x0
              else {
                val x1 = sample(r.data, info, (idx + 1) * ch)
                x0 + Math.floorDiv((x1 - x0).toLong * rem, up.toLong).toInt
              }
            energy += out.toLong * out
            val a = math.abs(out)
            if (a > peak) peak = a
            i += 1
          }
          WavResampleRow(r.doc_id, n.toLong, nOut, energy, peak)
        }
      }
    }
  }

  case class WavFrameRow(doc_id: Long, frame_id: Long, energy: Long,
                         peak: Int)

  /** Overlapping fixed-window framing over the DECODED channel-0 samples
    * (the honest audio path — [[Multimodal.frameEnergy]] frames raw
    * payload bytes; this frames real PCM): frame f covers sample indices
    * `[f·hop, f·hop + frameLen)` of channel 0, emitting Long-exact energy
    * (Σ s²) and peak magnitude per frame — the STFT-style framing layout
    * every spectral audio feature starts from. Row-local: one decode +
    * one pass per payload, frames emitted inline, nothing shuffles.
    */
  def wavFrames(media: Dataset[Multimodal.MediaRow], frameLen: Int = 64,
                hop: Int = 32): Dataset[WavFrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).iterator.flatMap { info =>
          val n = info.nFrames
          val ch = info.channels
          val frames = if (n < frameLen) 0 else (n - frameLen) / hop + 1
          (0 until frames).iterator.map { f =>
            var energy = 0L
            var peak = 0
            var i = 0
            while (i < frameLen) {
              val s = sample(r.data, info, (f * hop + i) * ch) // channel 0
              energy += s.toLong * s
              val a = math.abs(s)
              if (a > peak) peak = a
              i += 1
            }
            WavFrameRow(r.doc_id, f.toLong, energy, peak)
          }
        }
      }
    }
  }

  case class StftRow(doc_id: Long, bin: Int, power: Long, n_frames: Long)

  /** Fixed-point DFT basis for [[stftPower]]: `C(k)(i) =
    * round(cos(2πki/16)·256)`, `S(k)(i) = round(sin(2πki/16)·256)`,
    * k ∈ 0..7, i ∈ 0..15 — the [[Multimodal.DctT]] discipline
    * (StrictMath pins the table bit-for-bit on any JVM;
    * [[stftTableSql]] hands the SAME integers to an external oracle, so
    * the whole transform is integer-exact end to end).
    */
  private[graft] val StftC: Array[Array[Long]] =
    Array.tabulate(8, 16)((k, i) =>
      math.round(StrictMath.cos(2.0 * StrictMath.PI * k * i / 16.0) * 256))
  private[graft] val StftS: Array[Array[Long]] =
    Array.tabulate(8, 16)((k, i) =>
      math.round(StrictMath.sin(2.0 * StrictMath.PI * k * i / 16.0) * 256))

  /** The basis as a SQL VALUES list `(k, i, c, s)` for the oracle. */
  def stftTableSql: String =
    (for (k <- 0 until 8; i <- 0 until 16)
      yield s"($k, $i, ${StftC(k)(i)}, ${StftS(k)(i)})").mkString(", ")

  /** mm_stft_power — the SPECTRAL audio feature over the decoded PCM:
    * per overlapping 16-sample frame (hop 8, the [[wavFrames]] layout)
    * an 8-bin DFT power spectrum `|Σ sᵢ·e^{-2πjki/16}|²` in fixed-point
    * integer arithmetic — re/im are exact Longs (|s| ≤ 2¹⁵, |basis| ≤
    * 2⁸, 16 taps ⇒ |re| ≤ 2²⁷), power = re² + im² exact, and the
    * per-doc per-bin totals (the spectral energy profile every audio
    * classifier starts from) accumulate INSIDE the decode pass — each
    * payload is one row, so the whole spectrogram aggregates row-local
    * with no shuffle at any corpus size.
    */
  def stftPower(media: Dataset[Multimodal.MediaRow], frameLen: Int = 16,
                hop: Int = 8, bins: Int = 8): Dataset[StftRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).iterator.flatMap { info =>
          val n = info.nFrames
          val ch = info.channels
          val nF = if (n < frameLen) 0 else (n - frameLen) / hop + 1
          val power = new Array[Long](bins)
          var f = 0
          while (f < nF) {
            var k = 0
            while (k < bins) {
              var re = 0L
              var im = 0L
              var i = 0
              while (i < frameLen) {
                val s = sample(r.data, info, (f * hop + i) * ch) // channel 0
                re += s * StftC(k)(i)
                im += s * StftS(k)(i)
                i += 1
              }
              power(k) += re * re + im * im
              k += 1
            }
            f += 1
          }
          (0 until bins).iterator.map(k =>
            StftRow(r.doc_id, k, power(k), nF.toLong))
        }
      }
    }
  }

  case class WavMulawRow(doc_id: Long, n_samples: Long, energy: Long,
                         peak: Int, max_err: Int)

  /** G.711 μ-law encode of one signed 16-bit sample → the 8-bit
    * complemented codeword (ITU-T G.711 Table 2a, the telephony
    * companding every 8 kHz voice corpus arrives in). Written from the
    * public recommendation: 14-bit magnitude (`|x| >> 2`, clipped to
    * 8158 so `v = mag + 33 ≤ 8191` stays inside segment 7), segment =
    * position of the leading bit of `v` above bit 5, 4-bit mantissa,
    * all bits complemented on the wire (negative inputs keep the sign
    * bit clear pre-complement, so it emerges SET for negatives).
    */
  private[graft] def mulawEncode(x: Int): Int = {
    val mask = if (x < 0) 0x7F else 0xFF
    val v = math.min(math.abs(x) >> 2, 8158) + 33
    var seg = 0
    while ((v >> (seg + 6)) != 0) seg += 1 // v in [33, 8191] → seg in [0, 7]
    (((seg << 4) | ((v >> (seg + 1)) & 0xF)) ^ mask) & 0xFF
  }

  /** G.711 μ-law decode back to the 16-bit domain: un-complement, then
    * `±(((m·8 + 132) << seg) − 132)` — the exact expansion formula, so
    * 0 → 0 and the quantization step at segment s is `8 · 2^s`.
    */
  private[graft] def mulawDecode(code: Int): Int = {
    val u = ~code & 0xFF
    val t = ((((u & 0xF) << 3) + 0x84) << ((u & 0x70) >> 4)) - 0x84
    if ((u & 0x80) != 0) -t else t
  }

  /** mm_audio_mulaw — the LOSSY telephony codec leg: channel-0 PCM16 →
    * G.711 μ-law byte → expanded PCM16, emitting per-doc energy/peak of
    * the reconstruction plus the max companding error. Everything is
    * integer (segment/mantissa arithmetic on both sides), so an external
    * oracle replays encode∘decode bit-for-bit from the closed-form
    * fixture samples. Row-local like [[wavResample]]: one decode + one
    * pass, nothing shuffles at any corpus size.
    */
  def wavMulaw(media: Dataset[Multimodal.MediaRow]): Dataset[WavMulawRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          val n = info.nFrames
          val ch = info.channels
          var energy = 0L
          var peak = 0
          var maxErr = 0
          var t = 0
          while (t < n) {
            val x = sample(r.data, info, t * ch) // channel 0
            val y = mulawDecode(mulawEncode(x))
            energy += y.toLong * y
            val a = math.abs(y)
            if (a > peak) peak = a
            val e = math.abs(y - x)
            if (e > maxErr) maxErr = e
            t += 1
          }
          WavMulawRow(r.doc_id, n.toLong, energy, peak, maxErr)
        }
      }
    }
  }

  case class WavDownmixRow(doc_id: Long, channels: Int, n_frames: Long,
                           energy: Long, peak: Int)

  /** STEREO→MONO downmix — the mono-ization every ASR/audio-embedding
    * pipeline runs first: per frame the channel average in FLOOR
    * semantics, `m = ⌊(L + R) / 2⌋` (floor, not truncate — engines
    * disagree on truncation for negative sums, floor they share), mono
    * input passes through unchanged. Emits the downmixed energy/peak —
    * exact integers an external oracle replays from the closed-form
    * interleaved samples. Row-local: one decode + one pass, nothing
    * shuffles.
    */
  def wavDownmix(media: Dataset[Multimodal.MediaRow]): Dataset[WavDownmixRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          val n = info.nFrames
          val ch = info.channels
          var energy = 0L
          var peak = 0
          var t = 0
          while (t < n) {
            val m =
              if (ch == 1) sample(r.data, info, t)
              else {
                var sum = 0
                var c = 0
                while (c < ch) { sum += sample(r.data, info, t * ch + c); c += 1 }
                Math.floorDiv(sum, ch)
              }
            energy += m.toLong * m
            val a = math.abs(m)
            if (a > peak) peak = a
            t += 1
          }
          WavDownmixRow(r.doc_id, ch, n.toLong, energy, peak)
        }
      }
    }
  }

  case class WavTrimRow(doc_id: Long, n_in: Long, trim_start: Long,
                        trim_len: Long, energy: Long, peak: Int)

  /** SILENCE TRIMMING — the lead-in/lead-out strip every ASR corpus
    * runs first: the trimmed span is [first, last] over samples with
    * |s| > threshold (default 0 = exact digital silence; an energy
    * threshold swaps the comparison, not the scan). An all-silent
    * payload reports an empty span (trim_start = −1, len 0). Emits the
    * span plus energy/peak of the kept samples — exact integers the
    * oracle replays by scanning the same closed-form padded signal.
    * Row-local: one decode + one pass, nothing shuffles.
    */
  def wavTrim(media: Dataset[Multimodal.MediaRow],
              threshold: Int = 0): Dataset[WavTrimRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          val n = info.nFrames
          val ch = info.channels
          var first = -1L; var last = -1L
          var energy = 0L; var peak = 0
          var t = 0
          while (t < n) {
            val s = sample(r.data, info, t * ch) // channel 0
            if (math.abs(s) > threshold) {
              if (first < 0) first = t
              last = t
            }
            t += 1
          }
          if (first >= 0) {
            var u = first
            while (u <= last) {
              val s = sample(r.data, info, u.toInt * ch)
              energy += s.toLong * s
              val a = math.abs(s)
              if (a > peak) peak = a
              u += 1
            }
          }
          WavTrimRow(r.doc_id, n.toLong, first,
            if (first < 0) 0L else last - first + 1, energy, peak)
        }
      }
    }
  }

  /** Mono fixtures with PLANTED silence pads: `lead = seed%20+4` zero
    * frames, the [[wavFixture]] core sample stream (`x(i) =
    * ((seed·13 + i·29) mod 65536) − 32768`, n = 200 + seed%50), then
    * `tail = seed%15+4` zeros — the oracle scans the same closed-form
    * padded signal, so it stays exact even if a core edge sample
    * happens to be zero.
    */
  def wavMediaPadded(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    Spread.ifNarrow(ids.select(
        col(idCol).cast("long").as("doc_id"),
        col(seedCol).cast("long").as("seed")))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) =>
        val lead = (seed % 20 + 4).toInt
        val tail = (seed % 15 + 4).toInt
        val n = (200 + seed % 50).toInt
        val core = Array.tabulate[Short](n)(i =>
          (((seed * 13 + i.toLong * 29) % 65536) - 32768).toShort)
        val samples = Array.fill[Short](lead)(0) ++ core ++
          Array.fill[Short](tail)(0)
        (id, encodePcm16(1, 8000, samples))
      })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("audio/wav").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }

  /** Encode PCM16: RIFF/WAVE + fmt + an ignorable LIST chunk (so decoders
    * must actually skip unknown chunks) + data.
    */
  def encodePcm16(channels: Int, sampleRate: Int,
                  samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0)
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    val info = "GRAFT".getBytes("US-ASCII") // odd length → pad byte path
    val dataLen = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + info.length + (info.length & 1)) +
      (8 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); le32(riffLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1); le16(channels); le32(sampleRate)
    le32(sampleRate * channels * 2); le16(channels * 2); le16(16)
    out.write("LIST".getBytes("US-ASCII")); le32(info.length)
    out.write(info); if ((info.length & 1) == 1) out.write(0)
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(s => le16(s & 0xFFFF))
    out.toByteArray
  }

  /** Deterministic fixture: channels = 1 + seed mod 2, rate = 8000 +
    * 4000·(seed mod 3), frames = 200 + seed mod 50, interleaved sample
    * word i = `((seed·13 + i·29) mod 65536) − 32768` — closed-form for
    * an external oracle.
    */
  def wavFixture(seed: Long): Array[Byte] = {
    val channels = (1 + seed % 2).toInt
    val rate = (8000 + 4000 * (seed % 3)).toInt
    val frames = (200 + seed % 50).toInt
    val samples = Array.tabulate[Short](frames * channels)(i =>
      (((seed * 13 + i.toLong * 29) % 65536) - 32768).toShort)
    encodePcm16(channels, rate, samples)
  }

  /** Deterministic WAV payload column (the [[Jpeg.jpegMedia]] shape). */
  def wavMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    Spread.ifNarrow(ids.select(
        col(idCol).cast("long").as("doc_id"),
        col(seedCol).cast("long").as("seed")))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) => (id, wavFixture(seed)) })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("audio/wav").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}
