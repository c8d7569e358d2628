package graft.sources.bus

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming connector for [[BusServer]] — a REAL DataSource-v2
  * `MicroBatchStream` with per-partition offsets, the Kafka source shape:
  *
  *   - `latestOffset` asks the bus for its end offsets (one driver-side
  *     wire call per trigger — admission control is O(partitions), never
  *     data-sized);
  *   - `planInputPartitions(start, end)` emits ONE Spark input partition
  *     per bus partition carrying its `[from, until)` range — N bus
  *     partitions read in parallel by N tasks, each over its own TCP
  *     session, records streamed in bounded fetch chunks (O(chunk) task
  *     memory at any backlog size);
  *   - offsets serialize into the checkpoint (`v1:o0,o1,…`), so a
  *     restarted query resumes EXACTLY past what its last commit covered
  *     — replayable offset reads are what lift the source from
  *     at-most/at-least-once (socket text) to exactly-once with the
  *     parquet sink's idempotent batch commit.
  *
  * Usage: `spark.readStream.format("graft.sources.bus.BusSourceProvider")
  * .option("host", h).option("port", p).load()` → schema
  * `(partition INT, offset LONG, ts TIMESTAMP, key STRING, value STRING)`
  * (`ts` carries producer-assigned event time in epoch micros, the column
  * watermarks attach to downstream).
  *
  * `maxRecordsPerTrigger` (per bus partition) bounds each micro-batch —
  * the backlog-catchup knob; Trigger.AvailableNow composes through
  * Spark's own wrapper, draining the end-offset snapshot in bounded
  * batches then stopping.
  */
final class BusSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSourceProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BusTable(
      properties.getOrDefault("host", "127.0.0.1"),
      Option(properties.get("port")).map(_.toInt)
        .getOrElse(throw new IllegalArgumentException("graft-bus: port is required")),
      Option(properties.get("maxRecordsPerTrigger")).map(_.toLong),
      properties.getOrDefault("protocol", "graft") +
        (if ("true".equalsIgnoreCase(properties.getOrDefault("tls", "false")))
           "+tls" else ""))
}

object BusSourceProvider {
  /** `protocol` option → a [[graft.sources.LogReadClient]]: the native
    * GraftBus framing or the Apache Kafka wire protocol — the same
    * connector (offsets, admission control, exactly-once restart) over
    * either on-ramp.
    */
  private[bus] def mkClient(protocol: String, host: String,
                            port: Int): graft.sources.LogReadClient =
    protocol match {
      case "kafka" => new graft.sources.kafkawire.KafkaWireClient(host, port)
      case "kafka+tls" =>
        // `tls=true` option: the same Kafka wire protocol inside a
        // from-byte-0 TLS session against the broker's SSL listener
        new graft.sources.kafkawire.KafkaWireClient(host, port, tls = true)
      case "graft" => new BusClient(host, port)
      case other =>
        throw new IllegalArgumentException(s"graft-bus: unknown protocol $other")
    }

  val Schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("key", StringType),
    StructField("value", StringType)))
}

private[bus] final class BusTable(host: String, port: Int,
                                  maxPerTrigger: Option[Long],
                                  protocol: String) extends Table with SupportsRead {
  override def name(): String = s"graft-bus://$host:$port"
  override def schema(): StructType = BusSourceProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = BusSourceProvider.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new BusMicroBatchStream(host, port, maxPerTrigger, protocol)
    }
}

/** Per-partition next-offsets vector; `v1:` prefix versions the format. */
private[bus] final case class BusOffset(offsets: Array[Long]) extends Offset {
  override def json(): String = "v1:" + offsets.mkString(",")
}

private[bus] object BusOffset {
  def parse(json: String): BusOffset = {
    require(json.startsWith("v1:"), s"bad bus offset: $json")
    BusOffset(json.stripPrefix("v1:").split(',').map(_.trim.toLong))
  }
}

private[bus] final case class BusRange(host: String, port: Int, partition: Int,
                                       from: Long, until: Long,
                                       protocol: String) extends InputPartition

private[bus] final class BusMicroBatchStream(host: String, port: Int,
                                             maxPerTrigger: Option[Long],
                                             protocol: String)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {
  // one admission-control session for the stream's lifetime (driver-side)
  private lazy val admin = BusSourceProvider.mkClient(protocol, host, port)
  // end-offset snapshot taken when Trigger.AvailableNow starts: the run
  // drains exactly up to it (in capped batches) and stops, records
  // appended after the snapshot belong to the next run
  @volatile private var availableNowEnd: Option[Array[Long]] = None

  override def initialOffset(): Offset = {
    val n = admin.endOffsets().length
    BusOffset(Array.fill(n)(0L))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(admin.endOffsets())

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(c => ReadLimit.maxRows(c)).getOrElse(ReadLimit.allAvailable())

  /** Admission control: the next batch's end — the live (or AvailableNow
    * snapshot) ends, capped per bus partition when a maxRows limit is in
    * force (the documented per-partition reading of the cap, the
    * backlog-catchup knob).
    */
  /** An exactly-once source must never silently ignore partitions: if
    * the bus restarted with a different partition count than the
    * checkpointed (or snapshot) offset vector, zip() would truncate to
    * the shorter side and planInputPartitions would skip the rest —
    * data loss dressed as progress. Fail loudly instead.
    */
  private def requireSameLength(what: String, a: Array[Long],
                                b: Array[Long]): Unit =
    require(a.length == b.length,
      s"bus partition-count mismatch ($what): ${a.length} vs ${b.length} — " +
        "the bus was restarted with a different partition count than this " +
        "stream's checkpoint; a new checkpoint location is required")

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val s = startOffset.asInstanceOf[BusOffset].offsets
    val live = admin.endOffsets()
    requireSameLength("checkpointed start vs live bus", s, live)
    val ends = availableNowEnd match {
      case Some(snap) =>
        requireSameLength("AvailableNow snapshot vs live bus", snap, live)
        snap.zip(live).map { case (a, b) => math.min(a, b) }
      case None => live
    }
    val capped = limit match {
      case m: ReadMaxRows =>
        ends.zip(s).map { case (hi, lo) => math.min(hi, lo + m.maxRows()) }
      case _ => ends
    }
    BusOffset(capped)
  }

  override def reportLatestOffset(): Offset = BusOffset(admin.endOffsets())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is the entry point")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].offsets
    val e = end.asInstanceOf[BusOffset].offsets
    requireSameLength("batch start vs end", s, e)
    s.indices.filter(p => e(p) > s(p))
      .map(p => BusRange(host, port, p, s(p), e(p), protocol): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new BusPartitionReader(partition.asInstanceOf[BusRange])

  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)
  override def commit(end: Offset): Unit = () // the bus is a log; no acks
  override def stop(): Unit = admin.close()
}

/** One task's ordered scan of `[from, until)` on one bus partition over
  * its own wire session, fetched in bounded chunks.
  */
private[bus] final class BusPartitionReader(range: BusRange)
    extends PartitionReader[InternalRow] {
  private val client =
    BusSourceProvider.mkClient(range.protocol, range.host, range.port)
  private var buf: Array[BusRecord] = Array.empty
  private var idx = 0
  private var nextOffset = range.from

  override def next(): Boolean = {
    if (idx < buf.length) return true
    if (nextOffset >= range.until) return false
    buf = client.fetch(range.partition, nextOffset, range.until, 4096)
    idx = 0
    if (buf.isEmpty)
      // the planner promised [from, until); an empty fetch below `until`
      // means the bus lost committed data (e.g., restarted empty on the
      // same port). FAIL the task so Spark retries/surfaces it — silently
      // completing would commit offsets that were never read (data loss
      // on an exactly-once source)
      throw new java.io.IOException(
        s"graft-bus partition ${range.partition}: no data at offset " +
          s"$nextOffset but batch end is ${range.until} — log truncated?")
    nextOffset = buf.last.offset + 1
    true
  }

  override def get(): InternalRow = {
    val r = buf(idx); idx += 1
    InternalRow(range.partition, r.offset, r.ts,
      UTF8String.fromString(r.key), UTF8String.fromString(r.value))
  }

  override def close(): Unit = client.close()
}
