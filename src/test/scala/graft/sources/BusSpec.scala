package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.sources.bus.{BusClient, BusServer}

/** GraftBus message-bus source: wire protocol, parallel partitioned
  * streaming reads, per-trigger admission control, exactly-once restart
  * from checkpointed offsets, and an end-to-end watermarked aggregation —
  * the Kafka-shaped production on-ramp for §2.C.
  */
class BusSpec extends SparkTestBase {

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private val Fmt = "graft.sources.bus.BusSourceProvider"

  private def read(port: Int, extra: (String, String)*) = {
    val base = spark.readStream.format(Fmt)
      .option("host", "127.0.0.1").option("port", port.toString)
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  test("wire protocol round-trips: append assigns dense offsets per " +
      "partition, fetch streams exact ranges, endOffsets tracks growth") {
    val server = new BusServer(3)
    val port = server.start()
    val c = new BusClient("127.0.0.1", port)
    try {
      assert(c.endOffsets().toSeq == Seq(0L, 0L, 0L))
      assert(c.append(0, 1000L, "k0", "v0") == 0L)
      assert(c.append(0, 2000L, "k1", "v1") == 1L)
      assert(c.append(2, 3000L, "k2", "naïve ünïcode ✓") == 0L)
      assert(c.endOffsets().toSeq == Seq(2L, 0L, 1L))
      val got = c.fetch(0, 0, 2)
      assert(got.map(r => (r.offset, r.ts, r.key, r.value)).toSeq ==
        Seq((0L, 1000L, "k0", "v0"), (1L, 2000L, "k1", "v1")))
      // bounded fetch honors max and resumes
      assert(c.fetch(0, 0, 2, max = 1).map(_.offset).toSeq == Seq(0L))
      assert(c.fetch(0, 1, 2, max = 1).map(_.offset).toSeq == Seq(1L))
      assert(c.fetch(2, 0, 1).head.value == "naïve ünïcode ✓")
      // fetch beyond the end returns what exists, never blocks or errors
      assert(c.fetch(1, 0, 99).isEmpty)
    } finally { c.close(); server.close() }
  }

  test("streaming read drains all partitions in parallel and reproduces " +
      "every produced record exactly (offsets, event time, key, value)") {
    val server = new BusServer(4)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      val n = 500
      (0 until n).foreach { i =>
        c.append(i % 4, 1700000000000000L + i * 1000000L, s"k$i", s"v$i")
      }
      c.close()
      val out = tmp("bus_read_out")
      read(port).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmp("bus_read_ckpt"))
        .format("parquet").option("path", out)
        .start().awaitTermination()
      val got = spark.read.parquet(out)
      assert(got.count() == n)
      // every record intact: key i carries value i on partition i%4 with
      // a dense per-partition offset
      assert(got.filter(expr(
        "CAST(substring(key, 2) AS INT) % 4 != partition OR " +
        "value != concat('v', substring(key, 2))")).count() == 0)
      val offs = got.groupBy("partition")
        .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(offs.forall { case (_, cnt, lo, hi) => lo == 0 && hi == cnt - 1 },
        s"offsets must be dense per partition: ${offs.toSeq}")
      // event time surfaced as a real timestamp column
      assert(got.agg(min("ts")).head().getTimestamp(0).getTime == 1700000000000L)
    } finally server.close()
  }

  test("maxRecordsPerTrigger bounds each micro-batch; AvailableNow still " +
      "drains the full backlog across multiple batches") {
    val server = new BusServer(2)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      (0 until 300).foreach(i => c.append(i % 2, i.toLong * 1000000L, s"$i", "x"))
      c.close()
      val out = tmp("bus_cap_out")
      val ckpt = tmp("bus_cap_ckpt")
      read(port, "maxRecordsPerTrigger" -> "40").writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start().awaitTermination()
      assert(spark.read.parquet(out).count() == 300)
      // 150 records/partition at 40/trigger → at least 4 planned batches
      val batches = new java.io.File(s"$ckpt/offsets").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      assert(batches >= 4, s"cap ignored: only $batches batches")
    } finally server.close()
  }

  test("restart from the checkpoint is exactly-once: a resumed query reads " +
      "ONLY offsets past its last commit (no duplicates, no loss)") {
    val server = new BusServer(2)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      (0 until 100).foreach(i => c.append(i % 2, i.toLong * 1000000L, s"$i", "a"))
      val out = tmp("bus_eo_out")
      val ckpt = tmp("bus_eo_ckpt")
      def drain(): Unit = read(port).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start().awaitTermination()
      drain()
      assert(spark.read.parquet(out).count() == 100)
      // nothing new → a restarted query must emit zero additional rows
      drain()
      assert(spark.read.parquet(out).count() == 100, "replay duplicated rows")
      // more records arrive; the resumed query reads exactly the delta
      (100 until 180).foreach(i => c.append(i % 2, i.toLong * 1000000L, s"$i", "b"))
      c.close()
      drain()
      val got = spark.read.parquet(out)
      assert(got.count() == 180)
      assert(got.groupBy("partition", "offset").count()
        .filter(col("count") > 1).count() == 0, "duplicate (partition, offset)")
      assert(got.filter(col("value") === "b").count() == 80)
    } finally server.close()
  }

  test("end-to-end: watermarked tumbling-window aggregation over the bus " +
      "equals the batch recomputation (the §2.C patterns compose unchanged)") {
    val server = new BusServer(4)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      val base = 1700000000000000L
      (0 until 400).foreach { i =>
        // 20 windows of 1 minute, keys cycle over 5 users
        c.append(i % 4, base + i.toLong * 3000000L, s"u${i % 5}", s"$i")
      }
      c.close()
      val out = tmp("bus_agg_out")
      read(port)
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 minute").as("w"), col("key"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("long")).as("sv"))
        .select(col("w.start").as("ws"), col("key"), col("n"), col("sv"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmp("bus_agg_ckpt"))
        .outputMode("append")
        .format("parquet").option("path", out)
        .start().awaitTermination()
      val got = spark.read.parquet(out)
      val batch = spark.range(0, 400).select(
          (col("id") % 4).cast("int").as("partition"),
          expr(s"timestamp_micros($base + id * 3000000)").as("ts"),
          concat(lit("u"), col("id") % 5).as("key"), col("id").as("v"))
        .groupBy(window(col("ts"), "1 minute").as("w"), col("key"))
        .agg(count(lit(1)).as("bn"), sum("v").as("bsv"))
        .select(col("w.start").as("ws"), col("key"), col("bn"), col("bsv"))
      // append mode emits only watermark-closed windows; every emitted
      // window must match the batch aggregate exactly
      val j = got.join(batch, Seq("ws", "key"))
      assert(j.count() == got.count())
      assert(j.filter(col("n") =!= col("bn") || col("sv") =!= col("bsv"))
        .count() == 0)
      assert(got.count() > 0, "no closed windows emitted")
    } finally server.close()
  }

  test("bus -> warehouse sync survives a mid-stream restart exactly-once: " +
      "produce-while-down merges on resume, replays are no-ops") {
    val server = new BusServer(2)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      (0 until 120).foreach(i =>
        c.append(i % 2, i.toLong * 1000000L, s"k${i % 5}", (i % 7).toString))
      val fin = tmp("bus_ws_fin") + "/t"
      val ckpt = tmp("bus_ws_ckpt")
      def sync(): Unit = graft.sources.bus.BusSync.busIncrementalPublish(
        spark, "127.0.0.1", port, ckpt, fin, maxRecordsPerTrigger = 16)
        .awaitTermination()
      sync() // phase 1: several capped merge->publish cycles
      // downtime arrivals, then resume from the same checkpoint
      (120 until 200).foreach(i =>
        c.append(i % 2, i.toLong * 1000000L, s"k${i % 5}", (i % 7).toString))
      c.close()
      sync() // the restart
      sync() // nothing new: must be a pure no-op
      val got = graft.pipeline.Sync.readPublished(spark, fin).get
        .select("key", "n", "total").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val want = (0 until 200).map(i => (s"k${i % 5}", (i % 7).toLong))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (k, vs) => (k, vs.size.toLong, vs.map(_._2).sum) }
      assert(got == want,
        "published totals must equal the one-shot aggregate over all arrivals")
    } finally server.close()
  }

  test("an empty first batch never poisons the sync checkpoint: sync on an " +
      "empty bus, then produce and resume") {
    val server = new BusServer(2)
    val port = server.start()
    try {
      val fin = tmp("bus_empty_fin") + "/t"
      val ckpt = tmp("bus_empty_ckpt")
      def sync(): Unit = graft.sources.bus.BusSync.busIncrementalPublish(
        spark, "127.0.0.1", port, ckpt, fin).awaitTermination()
      sync() // nothing produced yet — may publish a zero-row snapshot
      val c = new BusClient("127.0.0.1", port)
      (0 until 50).foreach(i => c.append(i % 2, i.toLong, s"k${i % 3}", "2"))
      c.close()
      sync() // must merge, not crash on the empty snapshot's null watermark
      val got = graft.pipeline.Sync.readPublished(spark, fin).get
        .select("key", "n", "total").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val want = (0 until 50).groupBy(i => s"k${i % 3}").toSeq.sortBy(_._1)
        .map { case (k, is) => (k, is.size.toLong, 2L * is.size) }
      assert(got == want, s"post-empty-batch merge wrong: $got")
    } finally server.close()
  }

  test("distributed produce: executors publish via foreachPartition, the " +
      "stream reads it all back (the ingest round-trip both ways)") {
    val server = new BusServer(4)
    val port = server.start()
    try {
      spark.range(0, 1000).repartition(8).as[Long](spark.implicits.newLongEncoder)
        .foreachPartition { (it: Iterator[Long]) =>
          val cl = new BusClient("127.0.0.1", port)
          try it.foreach { id =>
            cl.append((id % 4).toInt, id * 1000L, s"$id", s"payload-$id")
          } finally cl.close()
        }
      val out = tmp("bus_dist_out")
      read(port).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmp("bus_dist_ckpt"))
        .format("parquet").option("path", out)
        .start().awaitTermination()
      val got = spark.read.parquet(out)
      assert(got.count() == 1000)
      assert(got.select("key").distinct().count() == 1000)
    } finally server.close()
  }
}
