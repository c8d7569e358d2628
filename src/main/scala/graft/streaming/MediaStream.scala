package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** Streaming face of the multimodal tier (SURVEY §2.C, pattern 13):
  * perceptual near-dup filtering AS MEDIA LANDS — the crawl-ingest shape
  * of [[graft.operators.Multimodal.deltaDctNearDups]]. Incoming payloads
  * decode partition-wise to DCT-pHash signatures inside the micro-batch
  * (the decoder is a stateless `mapPartitions`, so it composes onto a
  * streaming Dataset unchanged), band-join against the PRECOMPUTED lake
  * signature frame, verify candidates by exact hamming, and only images
  * with NO lake match within the threshold pass through.
  *
  * Everything is stateless: two stream-static joins (band equi-join +
  * left-anti of the batch against its matched ids) re-planned per
  * micro-batch, no watermark, no streaming state store — at
  * 100 TB/day of media the lake side enters as 8-byte signatures
  * exploded to 4 band rows each, never payload bytes, and a
  * definitely-new image costs one decode plus a sparse band lookup.
  * Append mode; `Trigger.AvailableNow` gives the reference's
  * run-to-completion-per-schedule semantics.
  */
object MediaStream {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("data", BinaryType),
    StructField("mime", StringType), StructField("n_bytes", LongType)))

  /** 4×16-bit band explode of a `(doc_id, ph)` frame — the
    * [[Multimodal]] banding, spelled here over either a static or a
    * streaming frame.
    */
  private def bands(sig: DataFrame, idCol: String): DataFrame =
    sig.select(col(idCol), col("ph"),
      explode(expr(
        """transform(sequence(0, 3), b -> struct(
          |  b AS band,
          |  shiftrightunsigned(ph, CAST(b * 16 AS INT)) & 65535 AS bv))"""
          .stripMargin)).as("bb"))
      .select(col(idCol), col("ph"), col("bb.band").as("band"),
        col("bb.bv").as("bv"))

  /** The filtered stream: media rows from `srcDir` (parquet, appended
    * over time) whose decoded pHash is NOT within `maxHamming` of any
    * signature in `lakeSig`. Undecodable or sub-8×8 payloads are
    * dropped with the decoder's refusal contract (no signature — no
    * pass-through; a lake built from decodable images can say nothing
    * about an undecodable payload, and fabricating a verdict is what
    * the contract forbids).
    *
    * The per-image verdict needs a per-doc aggregate over its 4 band
    * rows — stateful as a streaming plan — so decode AND verdict run
    * inside `foreachBatch` as BATCH logic (the
    * [[EventsStream.incrementalPublish]] convention): the micro-batch
    * decodes to signatures, the band join + exact-hamming verify
    * produce the matched-id set, and a semi-join of the batch's
    * ORIGINAL rows against the surviving ids writes the full media
    * columns (payload/mime/n_bytes) — all
    * re-planned per micro-batch against the static lake, and no
    * streaming state store is ever touched. At-least-once (a replayed
    * batch re-appends; dedup on doc_id downstream or a batch-id guard
    * like incrementalPublish's restores exactly-once — the filter
    * verdict itself is deterministic, so replays carry no wrong rows).
    */
  def lakePhashDedupedMedia(spark: SparkSession, srcDir: String,
                            lakeSig: DataFrame, checkpointDir: String,
                            outDir: String,
                            maxHamming: Int = 3): StreamingQuery = {
    require(maxHamming <= 3, "4x16-bit banding is exhaustive only to hamming 3")
    val lakeBands = bands(lakeSig.select(col("doc_id").as("lake_id"),
      col("ph")), "lake_id")
    val stream = spark.readStream.schema(mediaSchema).parquet(srcDir)
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bs = batch.sparkSession
        import bs.implicits._
        // decode the micro-batch to signatures (undecodable payloads get
        // none — the refusal contract), then verdict by full-band
        // agreement verified with exact hamming — the pigeonhole
        // guarantee is per pair, unchanged under streaming
        val sig = Multimodal.decodePixels(batch.as[Multimodal.MediaRow])
          .toDF().select(col("doc_id"), col("ph"))
        val matched = bands(sig, "doc_id").as("x")
          .join(lakeBands.as("y"),
            col("x.band") === col("y.band") && col("x.bv") === col("y.bv"))
          .filter(bit_count(col("x.ph").bitwiseXOR(col("y.ph"))) <= maxHamming)
          .select(col("x.doc_id").as("doc_id")).distinct()
        // surviving ids = decoded AND not matched; join the verdict back
        // onto the batch's ORIGINAL rows so the output carries the full
        // media columns (payload/mime/n_bytes), not just the signature
        val surviving = sig.select("doc_id")
          .join(matched, Seq("doc_id"), "left_anti")
        batch.join(surviving, Seq("doc_id"), "left_semi")
          .write.mode("append").parquet(outDir)
      }
      .start()
  }
}
