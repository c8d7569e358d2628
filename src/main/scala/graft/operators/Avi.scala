package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AVI (RIFF) MJPEG video container — the VIDEO leg of the real-decode
  * pipeline: a frame table from actual container parsing + per-frame
  * JPEG decodes, the format pairing [[Wav]]'s RIFF chunk machinery with
  * [[Jpeg]]'s entropy decoder. Written from the public AVI RIFF form
  * description (the `hdrl`/`movi` LIST layout) on zero media libraries.
  *
  * Decoder scope (refuse, never fabricate): `RIFF…AVI ` form; `hdrl`
  * LIST with `avih` (56-byte MainAVIHeader: µs/frame, total frames,
  * width, height) and a `strl` LIST whose `strh` declares fccType
  * `vids` with handler `MJPG` (anything else — cvid, h264, DIB —
  * REFUSES); `movi` LIST walked chunk by chunk: `##dc`/`##db` video
  * chunks carry one complete baseline JPEG per frame, `##wb` audio
  * chunks and unknown chunks skip WORD-ALIGNED, nested `rec ` LISTs
  * recurse. The optional `idx1` index is ignored (the movi walk is the
  * ground truth). Every frame payload then rides the EXISTING
  * [[Jpeg.decode]] — one codec, two containers.
  *
  * Scale: decode is partition-wise ([[videoFrames]]) — per-payload
  * container walk + per-frame JPEG decode, nothing shuffles before the
  * final sort; a corpus of clips fans out one task per partition.
  */
object Avi {

  /** Parsed container: geometry from `avih`, frame payloads in movi
    * order (each one complete JPEG).
    */
  final case class AviVideo(width: Int, height: Int, usPerFrame: Int,
                            frames: Vector[Array[Byte]])

  private def le32(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8) |
      ((d(p + 2) & 0xFF) << 16) | ((d(p + 3) & 0xFF) << 24)

  private def fourcc(d: Array[Byte], p: Int): String =
    new String(d, p, 4, "US-ASCII")

  /** Container walk; None on anything malformed or non-MJPEG. */
  def decodeFrames(data: Array[Byte]): Option[AviVideo] = {
    if (data.length < 24) return None
    if (fourcc(data, 0) != "RIFF" || fourcc(data, 8) != "AVI ") return None
    val riffLen = le32(data, 4)
    if (riffLen < 4 || 8 + riffLen.toLong > data.length) return None
    var width = -1
    var height = -1
    var usPerFrame = -1
    var mjpg = false
    val frames = Vector.newBuilder[Array[Byte]]

    /** Walk the chunks of [from, until); returns false on malformation. */
    def walk(from: Int, until: Int, inMovi: Boolean): Boolean = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(data, p)
        val len = le32(data, p + 4)
        if (len < 0 || p + 8 + len.toLong > until) return false
        id match {
          case "LIST" =>
            if (len < 4) return false
            val listType = fourcc(data, p + 8)
            val ok = walk(p + 12, p + 8 + len,
              inMovi || listType == "movi" || listType == "rec ")
            if (!ok) return false
          case "avih" =>
            if (len < 56) return false
            usPerFrame = le32(data, p + 8)
            width = le32(data, p + 8 + 32)
            height = le32(data, p + 8 + 36)
            if (usPerFrame <= 0 || width <= 0 || height <= 0 ||
                width > (1 << 20) || height > (1 << 20)) return false
          case "strh" =>
            if (len < 56) return false
            val fccType = fourcc(data, p + 8)
            val handler = fourcc(data, p + 12)
            // the ONLY video codec this leg decodes is MJPEG — any
            // other handler refuses rather than fabricating frames
            if (fccType == "vids") {
              if (handler != "MJPG") return false
              mjpg = true
            }
          case vid if inMovi && vid.length == 4 &&
              vid(0).isDigit && vid(1).isDigit &&
              (vid.endsWith("dc") || vid.endsWith("db")) =>
            frames += java.util.Arrays.copyOfRange(data, p + 8, p + 8 + len)
          case _ => // strf/strn/JUNK/idx1/audio ##wb… skipped
        }
        p += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      true
    }

    if (!walk(12, 8 + riffLen, inMovi = false)) return None
    val fs = frames.result()
    if (!mjpg || width < 0 || usPerFrame < 0 || fs.isEmpty) return None
    Some(AviVideo(width, height, usPerFrame, fs))
  }

  /** Luminance total of one decoded frame in the house milli-units
    * (1000·v for grayscale, BT.601 integer weights for RGB) — the
    * [[Multimodal.decodePixels]] accumulation applied to a video frame.
    */
  private def frameLum(info: Multimodal.ImageInfo, buf: Array[Byte]): Long = {
    var lum = 0L
    var y = 0
    while (y < info.height) {
      val srcRow = if (info.bottomUp) info.height - 1 - y else y
      var p = info.pixelOffset + srcRow * info.rowStride
      var x = 0
      while (x < info.width) {
        if (info.channels == 1) lum += 1000L * (buf(p) & 0xFF)
        else {
          val r = buf(p + (if (info.bgr) 2 else 0)) & 0xFF
          val g = buf(p + 1) & 0xFF
          val b = buf(p + (if (info.bgr) 0 else 2)) & 0xFF
          lum += 299L * r + 587L * g + 114L * b
        }
        p += info.channels
        x += 1
      }
      y += 1
    }
    lum
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame_ms: Int,
                            width: Int, height: Int, lum_total: Long)

  /** Partition-wise container + per-frame JPEG decode → frame table.
    * Undecodable clips emit a single refusal marker row (frame −1); a
    * clip whose container parses but whose k-th frame JPEG refuses
    * emits the same marker (a half-decoded clip must not pass as
    * shorter footage).
    */
  def videoFrames(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        val rows = decodeFrames(bytes).flatMap { v =>
          val decoded = v.frames.map(Jpeg.decode)
          if (decoded.exists(_.isEmpty)) None
          else Some(decoded.zipWithIndex.map { case (Some((info, buf)), i) =>
            FrameRow(id, i, v.usPerFrame / 1000, info.width, info.height,
              frameLum(info, buf))
          })
        }
        rows.getOrElse(Vector(FrameRow(id, -1, 0, 0, 0, 0L)))
      })
      .toDF()
  }

  /** Parsed audio track: PCM16 samples in movi order. */
  final case class AviAudio(channels: Int, sampleRate: Int,
                            samples: Array[Int])

  private def le16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)

  /** AUDIO-track walk — the `##wb` chunks [[decodeFrames]] deliberately
    * skips: find the `strl` whose `strh` declares fccType `auds`, read
    * its `strf` (WAVEFORMATEX: wFormatTag, nChannels, nSamplesPerSec,
    * wBitsPerSample), and concatenate that stream's `NNwb` payloads in
    * movi order. Stream number NN is the strh ordinal, the AVI stream
    * numbering rule. Refusal contract: only uncompressed PCM
    * (wFormatTag 1) at 16 bits, 1–2 channels — MP3-in-AVI (0x55),
    * ADPCM (2), float (3) refuse rather than fabricating samples; an
    * odd payload byte count (torn sample) refuses too. Samples decode
    * with the [[Wav]] LE16 two's-complement math — one codec
    * convention across both RIFF containers.
    */
  def decodeAudio(data: Array[Byte]): Option[AviAudio] = {
    if (data.length < 24) return None
    if (fourcc(data, 0) != "RIFF" || fourcc(data, 8) != "AVI ") return None
    val riffLen = le32(data, 4)
    if (riffLen < 4 || 8 + riffLen.toLong > data.length) return None
    var streamCounter = -1
    var audioIdx = -1
    var lastWasAuds = false
    var fmtTag = -1; var channels = -1; var rate = -1; var bits = -1
    val audio = new ByteArrayOutputStream()

    def walk(from: Int, until: Int, inMovi: Boolean): Boolean = {
      var p = from
      while (p + 8 <= until) {
        val id = fourcc(data, p)
        val len = le32(data, p + 4)
        if (len < 0 || p + 8 + len.toLong > until) return false
        id match {
          case "LIST" =>
            if (len < 4) return false
            val listType = fourcc(data, p + 8)
            if (!walk(p + 12, p + 8 + len,
              inMovi || listType == "movi" || listType == "rec ")) return false
          case "strh" =>
            if (len < 56) return false
            streamCounter += 1
            val fccType = fourcc(data, p + 8)
            lastWasAuds = fccType == "auds"
            if (lastWasAuds) {
              if (audioIdx >= 0) return false // one audio track per leg
              audioIdx = streamCounter
            }
          case "strf" if lastWasAuds =>
            if (len < 16) return false
            fmtTag = le16(data, p + 8)
            channels = le16(data, p + 10)
            rate = le32(data, p + 12)
            bits = le16(data, p + 22)
            lastWasAuds = false
          case wb if inMovi && audioIdx >= 0 && wb.length == 4 &&
              wb.endsWith("wb") && wb(0).isDigit && wb(1).isDigit &&
              (wb(0) - '0') * 10 + (wb(1) - '0') == audioIdx =>
            audio.write(data, p + 8, len)
          case _ => // video chunks, JUNK, idx1, other streams: skip
        }
        p += 8 + len + (len & 1)
      }
      true
    }

    if (!walk(12, 8 + riffLen, inMovi = false)) return None
    if (audioIdx < 0) return None            // no audio track declared
    if (fmtTag != 1) return None             // PCM only — never fabricate
    if (bits != 16) return None
    if (channels < 1 || channels > 2) return None
    if (rate <= 0) return None
    val raw = audio.toByteArray
    if (raw.length == 0 || (raw.length & 1) == 1) return None
    val samples = new Array[Int](raw.length / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    Some(AviAudio(channels, rate, samples))
  }

  final case class VideoAudioRow(doc_id: Long, n_frames: Int, video_ms: Int,
                                 sample_rate: Int, channels: Int,
                                 n_samples: Long, audio_ms: Long,
                                 energy: Long, peak: Int)

  /** BOTH tracks of each clip in one row — per-clip audio features
    * ([[Wav.wavStats]] math: Σs² energy + peak magnitude) joined with
    * the video geometry the frame walk yields, plus both durations (the
    * A/V-sync sanity surface). Undecodable clips — either track — emit
    * the refusal marker (n_frames −1): a clip with a broken audio
    * stream must not pass as silent footage. Partition-wise, zero
    * shuffles before the final sort.
    */
  def videoAudio(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        (for {
          v <- decodeFrames(bytes)
          a <- decodeAudio(bytes)
        } yield {
          var energy = 0L
          var peak = 0
          var i = 0
          while (i < a.samples.length) {
            val x = a.samples(i)
            energy += x.toLong * x
            val m = math.abs(x)
            if (m > peak) peak = m
            i += 1
          }
          VideoAudioRow(id, v.frames.length,
            v.frames.length * (v.usPerFrame / 1000),
            a.sampleRate, a.channels, a.samples.length.toLong,
            a.samples.length.toLong * 1000L / (a.sampleRate.toLong * a.channels),
            energy, peak)
        }).getOrElse(VideoAudioRow(id, -1, 0, 0, 0, 0L, 0L, 0L, 0))
      })
      .toDF()
  }

  // ---- fixture encoder (the mm_gif_frames precedent) ---------------------

  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"), 0, 4)

  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }

  private def chunk(out: ByteArrayOutputStream, id: String,
                    body: Array[Byte]): Unit = {
    cc(out, id); le32(out, body.length)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // word alignment pad
  }

  /** A 4-frame MJPEG clip whose decode is closed-form: per-block-constant
    * grayscale JPEG frames (w = seed%13+17, h = seed%11+17, block value
    * `((seed·7 + blockIdx·29) mod 96) + f + 128·[f ≥ 2]` — bounded below
    * 256 so frame deltas never wrap), 25 fps. Frames 0→1 and 2→3 drift
    * by exactly +1 per pixel; frame 2 jumps +129 per pixel — the
    * guaranteed scene cut.
    *
    * Stream 01 is a REAL interleaved PCM16 mono 8 kHz audio track:
    * n = seed%50+40 samples, sample k = ((seed·31 + k·17) mod 4001) −
    * 2000, split across TWO `01wb` chunks (32 samples, then the rest —
    * the concatenation pin). The container also carries an odd-length
    * JUNK chunk (word-alignment pin), a `03wb` chunk for a stream no
    * strh declares (the unknown-stream skip pin) and an `idx1` index
    * the walks ignore.
    */
  def aviFixture(seed: Long): Array[Byte] = {
    val w = (seed % 13 + 17).toInt
    val h = (seed % 11 + 17).toInt
    val bw = (w + 7) / 8
    val jpegs = (0 until 4).map { f =>
      Jpeg.encodeGray(w, h, (bx, by) =>
        (((seed * 7 + (by.toLong * bw + bx) * 29) % 96) + f +
          (if (f >= 2) 128 else 0)).toInt)
    }

    val avih = new ByteArrayOutputStream()
    le32(avih, 40000) // µs per frame (25 fps)
    le32(avih, 0); le32(avih, 0); le32(avih, 0)
    le32(avih, jpegs.length) // total frames
    le32(avih, 0); le32(avih, 2) // initial frames, streams (vids+auds)
    le32(avih, jpegs.map(_.length).max)
    le32(avih, w); le32(avih, h)
    (0 until 4).foreach(_ => le32(avih, 0)) // reserved

    val strh = new ByteArrayOutputStream()
    cc(strh, "vids"); cc(strh, "MJPG")
    le32(strh, 0); le32(strh, 0) // flags, priority+language
    le32(strh, 0) // initial frames
    le32(strh, 1); le32(strh, 25) // scale, rate
    le32(strh, 0); le32(strh, jpegs.length) // start, length
    le32(strh, jpegs.map(_.length).max)
    le32(strh, -1); le32(strh, 0) // quality, sample size
    le32(strh, 0); le32(strh, (h << 16) | w) // rcFrame

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    le32(strf, 40); le32(strf, w); le32(strf, h)
    strf.write(1); strf.write(0); strf.write(24); strf.write(0)
    cc(strf, "MJPG")
    le32(strf, w * h * 3)
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)

    val strl = new ByteArrayOutputStream()
    cc(strl, "strl")
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)

    // stream 01: PCM16 mono 8 kHz audio — strh(auds) + WAVEFORMATEX strf
    val nSamples = (seed % 50 + 40).toInt
    def pcmSample(k: Int): Int = ((seed * 31 + k * 17) % 4001).toInt - 2000
    val strhA = new ByteArrayOutputStream()
    cc(strhA, "auds"); le32(strhA, 0) // handler 0 for PCM
    le32(strhA, 0); le32(strhA, 0)
    le32(strhA, 0)
    le32(strhA, 1); le32(strhA, 8000) // scale, rate
    le32(strhA, 0); le32(strhA, nSamples)
    le32(strhA, nSamples * 2)
    le32(strhA, -1); le32(strhA, 2) // quality, sample size
    le32(strhA, 0); le32(strhA, 0)
    val strfA = new ByteArrayOutputStream() // WAVEFORMATEX
    strfA.write(1); strfA.write(0)          // wFormatTag = 1 (PCM)
    strfA.write(1); strfA.write(0)          // nChannels = 1
    le32(strfA, 8000)                       // nSamplesPerSec
    le32(strfA, 16000)                      // nAvgBytesPerSec
    strfA.write(2); strfA.write(0)          // nBlockAlign
    strfA.write(16); strfA.write(0)         // wBitsPerSample
    val strlA = new ByteArrayOutputStream()
    cc(strlA, "strl")
    chunk(strlA, "strh", strhA.toByteArray)
    chunk(strlA, "strf", strfA.toByteArray)

    val hdrl = new ByteArrayOutputStream()
    cc(hdrl, "hdrl")
    chunk(hdrl, "avih", avih.toByteArray)
    chunk(hdrl, "LIST", strl.toByteArray)
    chunk(hdrl, "LIST", strlA.toByteArray)

    def pcmBytes(fromS: Int, untilS: Int): Array[Byte] = {
      val b = new Array[Byte]((untilS - fromS) * 2)
      var k = fromS
      while (k < untilS) {
        val v = pcmSample(k)
        b(2 * (k - fromS)) = (v & 0xFF).toByte
        b(2 * (k - fromS) + 1) = ((v >> 8) & 0xFF).toByte
        k += 1
      }
      b
    }

    val movi = new ByteArrayOutputStream()
    cc(movi, "movi")
    // an odd-length JUNK chunk BEFORE the frames: a walker that forgets
    // word alignment desyncs immediately
    chunk(movi, "JUNK", Array.tabulate(7)(i => (seed + i).toByte))
    jpegs.zipWithIndex.foreach { case (j, i) =>
      chunk(movi, "00dc", j)
      // the real audio track interleaves mid-stream in TWO chunks (the
      // concatenation pin); a 03wb chunk for an undeclared stream pins
      // the unknown-stream skip in BOTH walks
      if (i == 0) chunk(movi, "01wb", pcmBytes(0, math.min(32, nSamples)))
      if (i == 1) chunk(movi, "03wb", Array.tabulate(11)(k => (k * 3).toByte))
      if (i == 2 && nSamples > 32)
        chunk(movi, "01wb", pcmBytes(32, nSamples))
    }

    val idx = new ByteArrayOutputStream() // idx1: ignored by the decoder
    jpegs.foreach { j => cc(idx, "00dc"); le32(idx, 16); le32(idx, 0)
      le32(idx, j.length) }

    val riff = new ByteArrayOutputStream()
    cc(riff, "AVI ")
    chunk(riff, "LIST", hdrl.toByteArray)
    chunk(riff, "LIST", movi.toByteArray)
    chunk(riff, "idx1", idx.toByteArray)

    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, riff.size())
    riff.writeTo(out)
    out.toByteArray
  }

  /** Fixture corpus: one clip per document id. */
  def aviMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val base = Spread.ifNarrow(ids.select(
      col(idCol).cast("long").as("doc_id"),
      col(seedCol).cast("long").as("seed")))
    base.as[(Long, Long)]
      .mapPartitions(it => it.map { case (id, seed) => (id, aviFixture(seed)) })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("video/x-msvideo").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}
