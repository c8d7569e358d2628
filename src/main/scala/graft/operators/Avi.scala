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
    * guaranteed scene cut. The container carries an odd-length JUNK
    * chunk (word-alignment pin), a fake audio `01wb` chunk and an `idx1`
    * index, all of which a correct walk skips.
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
    le32(avih, 0); le32(avih, 1) // initial frames, streams
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

    val hdrl = new ByteArrayOutputStream()
    cc(hdrl, "hdrl")
    chunk(hdrl, "avih", avih.toByteArray)
    chunk(hdrl, "LIST", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    cc(movi, "movi")
    // an odd-length JUNK chunk BEFORE the frames: a walker that forgets
    // word alignment desyncs immediately
    chunk(movi, "JUNK", Array.tabulate(7)(i => (seed + i).toByte))
    jpegs.zipWithIndex.foreach { case (j, i) =>
      chunk(movi, "00dc", j)
      if (i == 1) // a fake interleaved audio chunk a correct walk skips
        chunk(movi, "01wb", Array.tabulate(11)(k => (k * 3).toByte))
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
