package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Jpeg, Multimodal}

class MediaStreamSpec extends SparkTestBase {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("stream-vs-lake perceptual dedup equals the batch band+verify " +
      "filter on the drained input; refused payloads never pass") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
    val ids = (1L to 40L).toDF("doc_id")
    // lake = originals; incoming stream = perturbed copies of 1..25
    // (near-dups — must be dropped) + fresh images 101..115 with a
    // disjoint seed range (must pass) + one undecodable payload
    val lake = rows(Multimodal.ppmMedia(ids, "doc_id", "doc_id"))
    val dupes = Multimodal.ppmMedia(
      ids.filter(col("doc_id") <= 25)
        .select((col("doc_id") + 1000).as("doc_id"), col("doc_id").as("seed")),
      "doc_id", "seed", deltaSql = "IF(i < 6, 8, 0)")
    val fresh = Multimodal.ppmMedia(
      (101L to 115L).toDF("doc_id").select(col("doc_id"),
        (col("doc_id") * 37 + 5).as("seed")),
      "doc_id", "seed")
    val junk = Seq((999L, "not an image at all".getBytes("UTF-8"),
      "application/octet-stream", 19L))
      .toDF("doc_id", "data", "mime", "n_bytes")
    val incoming = rows(dupes).unionByName(rows(fresh)).unionByName(junk)

    val lakeSig = Multimodal.decodePixels(
        lake.as[Multimodal.MediaRow]).toDF()
      .select(col("doc_id"), col("ph")).localCheckpoint(true)

    val srcDir = tmp("ms_src")
    incoming.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val out = tmp("ms_out")
    MediaStream.lakePhashDedupedMedia(spark, srcDir, lakeSig,
        tmp("ms_ckpt"), out)
      .awaitTermination()

    val outDf = spark.read.parquet(out)
    assert(outDf.columns.sorted.toSeq ==
      Seq("data", "doc_id", "mime", "n_bytes"),
      "survivors must carry the full media columns, not just signatures")
    val got = outDf.select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // batch truth: decode the drained input, keep signatures with no
    // lake signature within hamming 3 (banding is exhaustive at <= 3,
    // so brute-force hamming IS the operator's verdict)
    val inSig = Multimodal.decodePixels(
        incoming.as[Multimodal.MediaRow]).toDF()
      .select(col("doc_id"), col("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val lakePh = lakeSig.collect().map(_.getLong(1))
    val want = inSig.collect {
      case (id, ph) if !lakePh.exists(lp =>
        java.lang.Long.bitCount(lp ^ ph) <= 3) => id
    }.sorted.toSeq
    assert(got == want,
      s"drained stream (${got.size}) must equal batch filter (${want.size})")
    assert(!got.contains(999L), "undecodable payloads must be refused")
    assert((101L to 115L).forall(got.contains),
      "fresh images must pass the filter")
    assert(got.intersect((1001L to 1025L).toSeq).isEmpty ||
      want.intersect((1001L to 1025L).toSeq) == got.intersect((1001L to 1025L).toSeq))
  }

  test("JPEG media composes through pattern 13 unchanged: compressed " +
      "payloads decode per micro-batch, re-uploads drop at hamming 0, " +
      "fresh images pass") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
    val ids = (1L to 30L).toDF("doc_id")
    val lake = rows(Jpeg.jpegMedia(ids, "doc_id", "doc_id", color = true))
    // re-uploads: the SAME fixture seeds under new ids — byte-identical
    // JPEG payloads decode to identical pixels, pHash hamming 0
    val dupes = rows(Jpeg.jpegMedia(
      ids.filter(col("doc_id") <= 20)
        .select((col("doc_id") + 2000).as("doc_id"), col("doc_id").as("seed")),
      "doc_id", "seed", color = true))
    val fresh = rows(Jpeg.jpegMedia(
      (201L to 210L).toDF("doc_id").select(col("doc_id"),
        (col("doc_id") * 91 + 7).as("seed")),
      "doc_id", "seed", color = true))
    val junk = Seq((999L, Array.fill[Byte](64)(0x55), "image/jpeg", 64L))
      .toDF("doc_id", "data", "mime", "n_bytes")
    val incoming = dupes.unionByName(fresh).unionByName(junk)

    val lakeSig = Multimodal.decodePixels(lake.as[Multimodal.MediaRow]).toDF()
      .select(col("doc_id"), col("ph")).localCheckpoint(true)
    val srcDir = tmp("msj_src")
    incoming.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val out = tmp("msj_out")
    MediaStream.lakePhashDedupedMedia(spark, srcDir, lakeSig,
      tmp("msj_ckpt"), out).awaitTermination()
    val got = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // batch truth over the drained input (banding exhaustive at <= 3)
    val inSig = Multimodal.decodePixels(incoming.as[Multimodal.MediaRow])
      .toDF().select(col("doc_id"), col("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val lakePh = lakeSig.collect().map(_.getLong(1))
    val want = inSig.collect {
      case (id, ph) if !lakePh.exists(lp =>
        java.lang.Long.bitCount(lp ^ ph) <= 3) => id
    }.sorted.toSeq
    assert(got == want, "streamed verdict must equal the batch filter")
    assert(got.intersect((2001L to 2020L).toSeq).isEmpty,
      "byte-identical JPEG re-uploads must drop at hamming 0")
    assert(!got.contains(999L), "a non-JPEG payload under image/jpeg must refuse")
    assert((201L to 210L).count(got.contains) >= 8,
      "fresh JPEG images must overwhelmingly pass")
  }

  test("checkpointed restart emits nothing new (no reprocessing of " +
      "already-committed source files)") {
    import spark.implicits._
    val ids = (1L to 10L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
    val media = rows(Multimodal.ppmMedia(ids, "doc_id", "doc_id"))
    val lakeSig = Seq((0L, 0L)).toDF("doc_id", "ph") // empty-ish lake
    val srcDir = tmp("ms2_src"); val out = tmp("ms2_out")
    val ckpt = tmp("ms2_ckpt")
    media.coalesce(1).write.mode("overwrite").parquet(srcDir)
    MediaStream.lakePhashDedupedMedia(spark, srcDir, lakeSig, ckpt, out)
      .awaitTermination()
    val n1 = spark.read.parquet(out).count()
    MediaStream.lakePhashDedupedMedia(spark, srcDir, lakeSig, ckpt, out)
      .awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n1 == n2, "restart from checkpoint must not re-emit")
    assert(n1 == 10L)
  }
}
