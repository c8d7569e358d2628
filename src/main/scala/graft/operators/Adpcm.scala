package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IMA ADPCM codec — the ADAPTIVE-DIFFERENTIAL audio leg beside the
  * PCM ([[Wav]]), companding ([[Wav.wavMulaw]]) and free-lossless
  * ([[Flac]]) legs: 4-bit nibbles over an 89-entry step-size table with
  * per-nibble index adaptation, the WAV format-0x0011 payload a voice /
  * game-audio corpus commonly arrives in. Written from the public IMA
  * "Recommended Practices for Enhancing Digital Audio Compatibility"
  * algorithm: per block a 4-byte header (initial predictor s16le, step
  * index u8, reserved u8) whose predictor IS sample 0, then data nibbles
  * low-first, each expanding as
  *
  *   step = table[index];  diff = step>>3
  *     (+ step>>2 if bit0, + step>>1 if bit1, + step if bit2)
  *   pred ± diff (bit3 = sign), clamped to s16;  index += adj[nibble],
  *   clamped to [0, 88]
  *
  * Container contract (fail-loudly refusals, never fabricate): RIFF/WAVE
  * with fmt tag 0x0011, 4-bit, MONO only, fmt's wSamplesPerBlock
  * consistent with block_align ((align−4)·2+1), a `fact` chunk whose
  * sample count does not exceed the block capacity (short final blocks
  * truncate to it), data length a multiple of block_align.
  *
  * Scale: decode is partition-wise ([[adpcmStats]]) — one linear nibble
  * walk per payload with the per-doc audio features accumulated in the
  * same pass, nothing shuffles at any corpus size.
  */
object Adpcm {

  private[graft] val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val IndexAdj: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def le16(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8)
  private def le32(d: Array[Byte], p: Int): Int =
    (d(p) & 0xFF) | ((d(p + 1) & 0xFF) << 8) |
      ((d(p + 2) & 0xFF) << 16) | ((d(p + 3) & 0xFF) << 24)

  /** Parsed container geometry: block layout + the data region. */
  final case class AdpcmInfo(sampleRate: Int, blockAlign: Int,
                             samplesPerBlock: Int, nSamples: Long,
                             dataOffset: Int, dataLen: Int)

  /** RIFF walk accepting ONLY mono 4-bit format-0x0011 streams with a
    * consistent fact chunk; anything else refuses.
    */
  def decodeHeader(data: Array[Byte]): Option[AdpcmInfo] = {
    if (data.length < 12) return None
    if (data(0) != 'R' || data(1) != 'I' || data(2) != 'F' || data(3) != 'F')
      return None
    if (data(8) != 'W' || data(9) != 'A' || data(10) != 'V' || data(11) != 'E')
      return None
    var p = 12
    var rate = 0; var align = 0; var spb = 0
    var fmtSeen = false
    var factSamples = -1L
    while (p + 8 <= data.length) {
      val id = new String(data, p, 4, "US-ASCII")
      val len = le32(data, p + 4)
      if (len < 0 || p + 8 + len.toLong > data.length) return None
      id match {
        case "fmt " =>
          if (len < 20) return None // 0x0011 needs cbSize + samplesPerBlock
          val tag = le16(data, p + 8)
          val channels = le16(data, p + 10)
          rate = le32(data, p + 12)
          align = le16(data, p + 20)
          val bits = le16(data, p + 22)
          spb = le16(data, p + 26)
          if (tag != 0x0011 || channels != 1 || bits != 4 || rate <= 0)
            return None
          if (align < 4 || spb != (align - 4) * 2 + 1) return None
          fmtSeen = true
        case "fact" =>
          if (len < 4) return None
          factSamples = le32(data, p + 8).toLong & 0xFFFFFFFFL
        case "data" =>
          if (!fmtSeen || factSamples < 0) return None
          if (len % align != 0) return None
          val capacity = (len / align).toLong * spb
          if (factSamples > capacity) return None
          return Some(AdpcmInfo(rate, align, spb, factSamples, p + 8, len))
        case _ => // LIST/cue/bext… skipped
      }
      p += 8 + len + (len & 1)
    }
    None
  }

  case class AdpcmRow(doc_id: Long, n_samples: Long, energy: Long, peak: Int)

  /** Partition-wise block decode + one-pass per-doc features over the
    * reconstructed PCM (energy = Σ s², peak magnitude). Undecodable
    * payloads emit no row.
    */
  def adpcmStats(media: Dataset[Multimodal.MediaRow]): Dataset[AdpcmRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeHeader(r.data).map { info =>
          var energy = 0L
          var peak = 0
          var emitted = 0L
          var block = 0
          val nBlocks = info.dataLen / info.blockAlign
          while (block < nBlocks && emitted < info.nSamples) {
            val base = info.dataOffset + block * info.blockAlign
            var pred = ((r.data(base) & 0xFF) |
              (r.data(base + 1) << 8)).toShort.toInt
            var index = math.min(math.max(r.data(base + 2) & 0xFF, 0), 88)
            def take(s: Int): Unit = {
              energy += s.toLong * s
              val a = math.abs(s)
              if (a > peak) peak = a
              emitted += 1
            }
            take(pred) // the header predictor IS sample 0
            var j = 0
            val nibbles = (info.blockAlign - 4) * 2
            while (j < nibbles && emitted < info.nSamples) {
              val byte = r.data(base + 4 + (j >> 1)) & 0xFF
              val n = if ((j & 1) == 0) byte & 0xF else (byte >> 4) & 0xF
              val step = StepTable(index)
              var diff = step >> 3
              if ((n & 1) != 0) diff += step >> 2
              if ((n & 2) != 0) diff += step >> 1
              if ((n & 4) != 0) diff += step
              pred = if ((n & 8) != 0) pred - diff else pred + diff
              if (pred > 32767) pred = 32767
              if (pred < -32768) pred = -32768
              index += IndexAdj(n)
              if (index < 0) index = 0
              if (index > 88) index = 88
              take(pred)
              j += 1
            }
            block += 1
          }
          AdpcmRow(r.doc_id, emitted, energy, peak)
        }
      }
    }
  }

  /** Encode an IMA-ADPCM WAV container from per-block (predictor, index,
    * nibble-bytes) triples — the fixture surface (a full rate-distortion
    * encoder would pick nibbles; the container shape is the contract).
    */
  def encodeContainer(sampleRate: Int, blockAlign: Int, nSamples: Long,
                      blocks: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    val dataLen = blocks.length * blockAlign
    val riffLen = 4 + (8 + 20) + (8 + 4) + (8 + dataLen)
    out.write("RIFF".getBytes("US-ASCII")); w32(riffLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x0011); w16(1); w32(sampleRate)
    w32(sampleRate * blockAlign / spb) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(spb)
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(nSamples.toInt)
    out.write("data".getBytes("US-ASCII")); w32(dataLen)
    blocks.foreach { case (pred, index, nb) =>
      require(nb.length == blockAlign - 4)
      w16(pred & 0xFFFF); out.write(index); out.write(0)
      out.write(nb)
    }
    out.toByteArray
  }

  /** Deterministic fixtures with a CLOSED-FORM decode: every block uses
    * initial step index 8 and the same 8-nibble pattern 0,8,0,8,…
    * (bytes 0x80×4, block_align 8 → 9 samples/block), so the step walk
    * is identical across blocks — steps 16,14,13,12,11,10,9,8 give
    * per-position deltas +2,−1,+1,−1,+1,−1,+1,−1 — and block b with
    * predictor p_b = ((seed·37 + b·101) mod 4000) − 2000 decodes to
    *
    *   p_b, then p_b + 2 (odd positions) / p_b + 1 (even), j = 1..8
    *
    * exactly (|p| ≤ 2002 keeps every sample far from the s16 clamps).
    * A decoder that mis-tables the steps, mis-orders the nibble halves,
    * skips the index adaptation, or drops the header sample changes the
    * energy. Blocks per doc = seed mod 7 + 6.
    */
  def adpcmMedia(ids: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    Spread.ifNarrow(ids.select(
        col(idCol).cast("long").as("doc_id"),
        col(seedCol).cast("long").as("seed")))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, seed) =>
        val nBlocks = (seed % 7 + 6).toInt
        val blocks = (0 until nBlocks).map { b =>
          val p = (((seed * 37 + b * 101) % 4000) - 2000).toInt
          (p, 8, Array.fill[Byte](4)(0x80.toByte))
        }
        (id, encodeContainer(8000, 8, nBlocks * 9L, blocks))
      })
      .toDF("doc_id", "data")
      .select(col("doc_id"), col("data"),
        struct(lit("audio/adpcm").as("mime"),
          octet_length(col("data")).cast("long").as("n_bytes")).as("meta"))
  }
}
