package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column pattern: media as opaque `binary` payloads beside
  * typed metadata, processed partition-wise.
  *
  * Schema contract (the piece that must be right at 100 TB):
  *   `data BINARY, meta STRUCT<mime: STRING, n_bytes: BIGINT>` — payloads
  *   stay byte-opaque through shuffles/storage; all pruning happens on the
  *   metadata struct so a metadata-only query never deserializes payloads
  *   (columnar parquet splits the struct fields from the blob pages).
  *
  * Decode is partition-wise over an iterator ([[decodeImages]]): one
  * decoder context per partition, rows streamed — the Scala analog of a
  * batched pandas-style UDF. The actual image decode is STUBBED
  * deterministically (no media libraries in this environment, marked
  * below); the Spark-side plumbing — schema, encoder, partitioning, batch
  * iteration — is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, data: Array[Byte], mime: String, n_bytes: Long)
  case class DecodedRow(doc_id: Long, mime: String, n_bytes: Long,
                        width: Int, height: Int, channels: Int)

  /** Attach a binary payload column + metadata struct to a text corpus —
    * the ingest shape (payload here is the UTF-8 bytes standing in for
    * real media; the schema is the contract).
    */
  def attachBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("data"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Partition-wise decode: iterator-in/iterator-out so one decoder context
    * amortizes over the partition (the mapInPandas batch shape, typed).
    *
    * STUB: `decodeOne` fabricates deterministic dimensions from the byte
    * length in place of a real image codec (none available here). Swap its
    * body for an actual decoder; the signature and the distributed shape
    * are the real contract.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one decoder context per partition would be initialized here
      rows.map { r =>
        val (w, h, c) = decodeOne(r.data)
        DecodedRow(r.doc_id, r.mime, r.n_bytes, w, h, c)
      }
    }
  }

  /** Deterministic fake decode: dimensions derived from payload size. */
  private def decodeOne(data: Array[Byte]): (Int, Int, Int) = {
    val n = data.length
    (n % 640 + 1, n % 480 + 1, 3)
  }

  /** Deterministic frame sampling over a byte payload: every `stride`-th
    * byte starting at `offset` — the shape of video frame-sampling
    * (seek + stride) without a codec. Each sample is a 1-byte BINARY
    * (substring works byte-wise on binary).
    */
  def sampleBytes(media: DataFrame, stride: Int, offset: Int = 0): DataFrame =
    media.withColumn("sampled",
      expr(s"filter(transform(sequence(1, octet_length(data)), i -> CASE WHEN (i - 1 - $offset) % $stride = 0 AND i > $offset THEN substring(data, i, 1) END), x -> x IS NOT NULL)"))

  /** Audio-style framing: overlapping fixed-length byte windows
    * (`frameLen` bytes every `hop` bytes — the STFT framing layout) with
    * a per-frame energy (byte sum) and peak, standing in for the
    * spectral stats a real audio featurizer computes per frame. Tail
    * bytes that don't fill a frame are dropped (standard framing).
    *
    * Shape: the per-byte value array materializes ONCE per payload
    * (before the Generate), frames explode as Generate OUTPUT arrays —
    * so the per-frame stats read an attribute, never re-evaluate the
    * hex decode (the project-collapse O(n²) trap [[featurize]]
    * documents). Row-local throughout; no shuffle until the caller
    * aggregates.
    */
  def frameEnergy(media: DataFrame, frameLen: Int, hop: Int): DataFrame =
    media
      .filter(octet_length(col("data")) >= frameLen)
      .withColumn("bvals",
        expr("transform(regexp_extract_all(hex(data), '..', 0), h -> CAST(conv(h, 16, 10) AS BIGINT))"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(
           |  sequence(0, CAST(floor((size(bvals) - $frameLen) / $hop) AS INT)),
           |  i -> slice(bvals, i * $hop + 1, $frameLen))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        (col("pos") * hop).cast("long").as("f_start"),
        expr("aggregate(col, CAST(0 AS BIGINT), (a, x) -> a + x)").as("energy"),
        array_max(col("col")).as("peak"))

  /** Scene-change detection over the framed payload (the video-pipeline
    * shot-boundary step, on the [[frameEnergy]] stub features): a frame
    * starts a new scene when its energy jumps more than `threshold`
    * against the previous frame. One per-doc ordered window (lag) over
    * the frame rows — frames of one payload co-locate after the framing
    * explode, so the window shuffles on doc_id once and scenes never
    * leave their executor.
    */
  def sceneChanges(frames: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("prev_e", lag("energy", 1).over(w))
      .withColumn("is_scene_start",
        (col("prev_e").isNull ||
          abs(col("energy") - col("prev_e")) > threshold).cast("int"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum("is_scene_start").as("n_scenes"),
        max(abs(col("energy") - coalesce(col("prev_e"), col("energy"))))
          .as("max_jump"))
  }

  /** Deterministic per-payload feature vector: `dims` byte-sum features,
    * f_j = Σ byte_i over positions with i % dims == j (1-based i, j from
    * 0) — the feature-extract slot of the pipeline (swap for a real model
    * embedding; the column shape `ARRAY<BIGINT>` with fixed arity and the
    * single-scan plumbing is the contract). Stays in codegen: byte access
    * via substring-on-binary + ascii, no UDF.
    */
  def featurize(media: DataFrame, dims: Int = 4): DataFrame = {
    // byte values via the hex codec — string ops only, so the math is
    // reproducible on any engine (raw byte→int of a lone non-ASCII byte
    // is codec-dependent; hex is not). ONE self-contained expression AND
    // one traversal: the aggregate walks the hex byte-pairs once, carrying
    // (position, f0..f{dims-1}) in the accumulator struct and adding each
    // byte to its stride's field — a CASE on position % dims keeps it to
    // one conv() and one struct per byte. (The round-3 form ran `dims`
    // full transform+filter+aggregate passes, each allocating per-element
    // structs and filtered arrays — the 26 s GC hot spot of the r3 bench.)
    // Deliberately NOT factored into helper columns — Catalyst's
    // project-collapse would inline a helper into the per-element lambda
    // and re-evaluate hex(data) per byte (O(n²)).
    val zero = (0 until dims).map(j => s"'f$j', CAST(0 AS BIGINT)").mkString(", ")
    val branches = (0 until dims).map { j =>
      val fields = (0 until dims).map { d =>
        if (d == j) s"'f$d', acc.f$d + CAST(conv(h, 16, 10) AS BIGINT)"
        else s"'f$d', acc.f$d"
      }.mkString(", ")
      s"WHEN $j THEN named_struct('i', acc.i + 1, $fields)"
    }.mkString(" ")
    media.withColumn("features",
      expr(s"""aggregate(
        |  regexp_extract_all(hex(data), '..', 0),
        |  named_struct('i', CAST(0 AS BIGINT), $zero),
        |  (acc, h) -> CASE CAST(acc.i % $dims AS INT)
        |    $branches
        |  END,
        |  acc -> array(${(0 until dims).map(j => s"acc.f$j").mkString(", ")}))""".stripMargin))
  }

  /** Deterministic resize STUB: the (width, height) from the decode step
    * scaled to fit a target box with aspect ratio preserved — the integer
    * math every real resize does before touching pixels (the pixel pass
    * itself would live in [[decodeImages]]' partition loop next to the
    * codec; no image library in this environment). Pure column math, one
    * scan, no shuffle.
    */
  def resizeDims(decoded: DataFrame, targetW: Int = 224, targetH: Int = 224): DataFrame =
    decoded
      // scale = min(tw/w, th/h) computed in exact integer cross-products:
      // tw*h vs th*w avoids float scale values entirely; resized dims are
      // floor(w*t/max) style integer ops — engine-portable bit-for-bit
      .withColumn("rw",
        when(col("width") * targetH <= col("height") * targetW,
          greatest(lit(1), expr(s"CAST(floor(width * $targetH / height) AS INT)")))
          .otherwise(lit(targetW)))
      .withColumn("rh",
        when(col("width") * targetH <= col("height") * targetW,
          lit(targetH))
          .otherwise(greatest(lit(1), expr(s"CAST(floor(height * $targetW / width) AS INT)"))))

  /** Blockwise fingerprint of a binary payload — the piecewise-hash
    * (ssdeep/CTPH) shape: the payload is cut into 60 equal blocks (block
    * length `ceil(n_bytes / 60)`), each block's byte-sum yields ONE
    * checksum bit (bit 2 of the sum — content-sensitive, yet untouched
    * blocks keep their bit), assembled into a 60-bit signature whose
    * hamming distance counts DIFFERING BLOCKS. A payload edited in k
    * blocks lands within hamming k of the original; unrelated payloads
    * disagree on ~half of their informative bits. A real perceptual hash
    * (pHash's DCT coefficients, aHash's mean threshold over pixels) fills
    * the same per-block-feature slot once a media decoder exists — the
    * bit-assembly, banding, and verify stages are decoder-agnostic.
    * (A mean-thresholded rule was measured first and rejected: over
    * short same-vocabulary text payloads the block sums cluster so
    * tightly around the mean that unrelated docs collided at hamming 0.)
    *
    * Portability: all byte math goes through the hex codec (the
    * [[featurize]] rule), so any engine reproduces the exact signature.
    *
    * Plan shape: the hex string and the 60-feature array each materialize
    * ONCE (two eager barriers). Both are referenced from inside
    * higher-order lambdas downstream, and CollapseProject would otherwise
    * inline the producing expression into every element evaluation —
    * hex(data) would re-run 60× per row, the chunk-sum transform 61× (the
    * featurize O(n²) trap, and the IVF-PQ re-inlining defect class).
    */
  def phashSignatures(media: DataFrame, idCol: String): DataFrame = {
    val hx = Spread.ifNarrow(media).select(col(idCol),
        hex(col("data")).as("hx"),
        ceil(octet_length(col("data")) / 60.0).cast("long").as("cl"))
      .localCheckpoint(true)
    val fs = hx.select(col(idCol), expr(
      """transform(sequence(0, 59), j ->
        |  aggregate(
        |    regexp_extract_all(
        |      substring(hx, CAST(j * cl * 2 + 1 AS INT), CAST(cl * 2 AS INT)),
        |      '..', 0),
        |    CAST(0 AS BIGINT),
        |    (acc, x) -> acc + CAST(conv(x, 16, 10) AS BIGINT)))""".stripMargin)
        .as("fs"))
      .localCheckpoint(true)
    fs.select(col(idCol), expr(
      """aggregate(sequence(0, 59), CAST(0 AS BIGINT), (acc, j) ->
        |  acc + shiftleft(
        |    shiftright(element_at(fs, CAST(j + 1 AS INT)), 2) & CAST(1 AS BIGINT),
        |    CAST(j AS INT)))""".stripMargin).as("ph"))
  }

  /** Perceptual near-duplicate pairs: LSH banding over [[phashSignatures]]
    * — the 60-bit hash splits into 4 bands of 15 bits; any pair agreeing
    * on a full band becomes a candidate, and candidates are verified by
    * exact hamming distance (`bit_count(xor)`) against `maxHamming`.
    * Pigeonhole guarantee: `maxHamming` ≤ 3 flipped bits can corrupt at
    * most 3 of the 4 bands, so every true pair shares at least one intact
    * band — banding loses NOTHING at the emitted threshold (the
    * [[Dedup]] simhash-band argument, applied to payload bytes).
    *
    * Scale shape: the only join is the band-bucket equi-join on
    * (band, 15-bit value) — 2^15 values per band keeps buckets sparse;
    * all-pairs never materializes. Signature cost is one payload scan.
    */
  def phashNearDups(media: DataFrame, idCol: String,
                    maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x15-bit banding is exhaustive only to hamming 3")
    val sig = phashSignatures(media, idCol) // checkpointed upstream
    val bands = sig.select(col(idCol), col("ph"),
      explode(expr(
        """transform(sequence(0, 3), b -> struct(
          |  b AS band,
          |  shiftright(ph, CAST(b * 15 AS INT)) & 32767 AS bv))""".stripMargin))
        .as("bb"))
      .select(col(idCol), col("ph"), col("bb.band").as("band"),
        col("bb.bv").as("bv"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        col("x.ph").as("pha"), col("y.ph").as("phb"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("pha").bitwiseXOR(col("phb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Content-defined chunking (the rolling-hash breakpoint scheme behind
    * rsync / LBFS / FastCDC / restic): byte position p ends a chunk iff
    * the rolling hash of the trailing 4-byte context is ≡ 0 mod
    * `divisor` — boundaries depend ONLY on local content, so inserting
    * or deleting bytes re-aligns every chunk past the edit within one
    * window (fixed-size chunking loses ALL alignment after any shift;
    * this is the whole point of CDC). Expected chunk length ≈ divisor.
    *
    * Returns one row per (payload, chunk): ordinal, content hash, byte
    * length — the input to chunk-level dedup across a lake.
    *
    * Plan shape: the hex string materializes once ([[phashSignatures]]'
    * re-inlining guard), the per-byte cut flags are ONE row-local
    * transform, chunk ids are a prefix sum over the doc-partitioned
    * sort, and chunk reassembly is an ordered aggregate per (doc,
    * chunk) — one shuffle on the payload id total.
    */
  def cdcChunks(media: DataFrame, idCol: String, divisor: Int = 16): DataFrame = {
    // The cut rule is a Rabin–Karp base-31 polynomial over the trailing
    // 4-byte window — the classic rolling-hash CDC scheme. The whole
    // operator is ROW-LOCAL: cut positions, chunk spans, and chunk
    // hashes all compute inside the payload's own row, and the explode
    // emits one row PER CHUNK (~n/divisor), never per byte. The first
    // spelling exploded per byte and rebuilt chunks with a window
    // prefix-sum + ordered aggregate — shuffling |corpus bytes| rows
    // (measured: sf0.1 single-query wall 18.2 s → 13.9 s from this
    // restructure alone) — this form needs no shuffle at all. Three
    // materialization barriers (hx → byte array → cut array): each is
    // referenced from inside the next stage's per-element lambda, where
    // CollapseProject would otherwise re-inline its producing expression
    // per element (O(n²)).
    // Spread guard: the per-payload HOF work below is interpreted and
    // costs ~ms per payload — a corpus arriving as one small file (one
    // scan partition) would run it all on ONE thread (measured: the
    // whole operator flat at ~7.5 s from 1× to 8× corpus because the n
    // unioned selects gave exactly n partitions; [[Spread.ifNarrow]]).
    val src = Spread.ifNarrow(media)
    val hx = src.select(col(idCol), hex(col("data")).as("hx"))
      .localCheckpoint(true)
    // one decoded-byte array per payload: decoding ONCE and indexing in
    // the cut lambda beats re-decoding the 4-byte window per candidate
    // position (measured 13.9 s vs 22.2 s at sf0.1 — HOF lambdas are
    // interpreted, so expression-tree size per element dominates)
    val bv = hx.select(col(idCol), col("hx"), expr(
      """transform(sequence(1, CAST(length(hx) / 2 AS INT)),
        |  p -> CAST(conv(substring(hx, (p - 1) * 2 + 1, 2), 16, 10) AS BIGINT))"""
        .stripMargin).as("bv"))
      .localCheckpoint(true)
    // cut positions (byte p ENDS a chunk), then chunk start/end spans:
    // starts = 1 :: cuts+1, ends = cuts :: n — a trailing cut at n would
    // open an empty chunk, filtered by start <= end. Payloads shorter than
    // the 4-byte rolling window carry no cut candidates at all: without
    // the IF, sequence(4, n) with n < 4 DESCENDS (4,3,...,n) and the
    // p = 3 probe hits element_at(bv, 0) — a hard error under 1-based
    // array indexing. Short payloads must instead yield one whole-payload
    // chunk, i.e. an empty cut set.
    val cuts = bv.select(col(idCol), col("hx"), expr(
      s"""IF(CAST(length(hx) / 2 AS INT) < 4,
         |  CAST(array() AS ARRAY<INT>),
         |  filter(sequence(4, CAST(length(hx) / 2 AS INT)), p ->
         |    pmod(element_at(bv, p - 3) * 29791 + element_at(bv, p - 2) * 961
         |         + element_at(bv, p - 1) * 31 + element_at(bv, p), $divisor) = 0))"""
        .stripMargin).as("cuts"))
      .localCheckpoint(true)
    cuts.select(col(idCol), explode(expr(
      """filter(
        |  transform(sequence(1, size(cuts) + 1), i -> named_struct(
        |    'cid', CAST(i - 1 AS BIGINT),
        |    'start', IF(i = 1, 1, element_at(cuts, i - 1) + 1),
        |    'end', IF(i = size(cuts) + 1, CAST(length(hx) / 2 AS INT),
        |              element_at(cuts, i)))),
        |  c -> c.start <= c.end)""".stripMargin)).as("c"),
        col("hx"))
      .select(col(idCol), col("c.cid").as("cid"),
        md5(expr("substring(hx, (c.start - 1) * 2 + 1, (c.end - c.start + 1) * 2)"))
          .as("chunk_hash"),
        expr("CAST(c.end - c.start + 1 AS BIGINT)").as("chunk_len"))
  }

  /** End-to-end metadata extraction (the mm query surface): attach →
    * metadata projection + portable content fingerprint. Payload bytes are
    * NOT read by this plan — only the metadata struct and the original
    * text column are touched.
    */
  def binaryMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    attachBinary(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(
        col("doc_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        md5(col("text")).as("fp"))
      .orderBy("doc_id")
}
