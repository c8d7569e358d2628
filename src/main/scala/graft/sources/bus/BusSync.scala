package graft.sources.bus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Bus → warehouse incremental sync: the reference's daily full-copy
  * (JDBC export → stage → merge → publish) re-expressed as MESSAGE-BUS
  * ingest — each micro-batch's per-key delta merges into the published
  * snapshot through the crash-consistent versioned publish
  * ([[graft.pipeline.Sync.publishOverwrite]]), idempotent under
  * foreachBatch's at-least-once replay via the stored `last_batch` guard.
  * Together: offset-replayable source + idempotent merge + atomic publish
  * = exactly-once WAREHOUSE STATE end-to-end from a TCP log bus.
  *
  * Values aggregate as LONG (the bus carries integer payloads here), so
  * distributed sums are order-exact and the published table is
  * hash-oracle-able — the same determinism discipline as the batch
  * surface.
  *
  * Scale: per batch one map-side-combined aggregate of the delta
  * (bounded by maxRecordsPerTrigger), one key-partitioned full-outer
  * merge against the published table, one publish; the bus admission
  * control caps catch-up batches after downtime, so a backlog drains in
  * bounded-memory steps instead of one giant batch.
  */
object BusSync {

  def busIncrementalPublish(spark: SparkSession, host: String, port: Int,
                            checkpointDir: String, finalPath: String,
                            maxRecordsPerTrigger: Long = 4096): StreamingQuery =
    spark.readStream.format("graft.sources.bus.BusSourceProvider")
      .option("host", host).option("port", port.toString)
      .option("maxRecordsPerTrigger", maxRecordsPerTrigger.toString)
      .load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // delta per micro-batch; the idempotence guard + additive merge +
        // atomic publish are the shared Sync.idempotentDeltaPublish core
        val delta = batch.groupBy("key")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("long")).as("total"))
        graft.pipeline.Sync.idempotentDeltaPublish(
          delta, batchId, finalPath, "key")
      }
      .start()
}
