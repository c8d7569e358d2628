package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.PipelineQueries

/** Avro container-leg invariants: the roundtrip aggregate equals the
  * same aggregate computed straight off the parquet table (lossless
  * container encode/decode), and corrupted containers refuse loudly
  * instead of yielding wrong rows.
  */
class AvroIOSpec extends SparkTestBase {

  test("a53 roundtrip aggregate equals the direct-parquet aggregate") {
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT))")
          .as("content_xor"))
      .orderBy("lang", "source")
      .collect().map(_.toSeq).toSeq
    val viaAvro = PipelineQueries.a53AvroRoundtrip(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(viaAvro == direct)
  }

  test("non-Avro bytes refuse on the magic check; a flipped body byte fails loudly") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}""")
    val bos = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.deflateCodec(6))
    w.create(schema, bos)
    (1L to 200L).foreach { i =>
      val rec = new GenericData.Record(schema); rec.put("x", i); w.append(rec)
    }
    w.close()
    val good = bos.toByteArray
    def readAll(bytes: Array[Byte]): Seq[Long] = {
      val rd = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes),
        new GenericDatumReader[GenericRecord]())
      import scala.jdk.CollectionConverters._
      rd.iterator.asScala.map(_.get("x").asInstanceOf[Long]).toList
    }
    assert(readAll(good) == (1L to 200L).toList)
    // magic check: arbitrary bytes are refused before any decode work
    intercept[Throwable] {
      new DataFileReader[GenericRecord](
        new SeekableByteArrayInput("not avro at all".getBytes),
        new GenericDatumReader[GenericRecord]())
    }
    // a corrupted deflate body must throw, never silently return wrong rows
    val seen = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var refused = 0
    (64 until good.length by 97).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x5a).toByte
      try {
        val got = readAll(bad)
        if (got != (1L to 200L).toList) seen += got
      } catch { case _: Throwable => refused += 1 }
    }
    assert(seen.isEmpty,
      s"corrupted container produced wrong rows without an error: $seen")
    assert(refused > 0, "no flip was detected at all")
  }
}
