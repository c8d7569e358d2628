package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming surface (SURVEY.md §2.C).
  *
  * The reference's streaming story is macro-batch: a daily cron
  * (reference dags/copy_cloudsql_to_bigquery_v2.py:26) re-snapshotting full
  * tables, with "use time/id in the sync select" (reference README.md:8) as
  * the incremental escape hatch. The Spark-native form is a real
  * incremental pipeline: file source → watermark → windowed/stateful ops →
  * idempotent sink, with `Trigger.AvailableNow` giving exactly the
  * reference's run-to-completion-per-schedule semantics.
  *
  * All builders take the parquet `events` table dir as the source and
  * return running [[StreamingQuery]]s writing parquet; checkpointing makes
  * re-runs exactly-once (the engine-native version of the reference's
  * overwrite-idempotency, dags/copy_cloudsql_to_bigquery_v2.py:108).
  */
object EventsStream {

  /** events schema as stored, parameterized on the physical `ts` type the
    * generator wrote (ns-as-long legacy or tz-naive µs — same dual
    * convention as [[graft.Tables.load]]).
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source incremental read of the events dir. File streams need an
    * explicit schema; its `ts` physical type is sniffed from the footers
    * with one driver-side batch metadata read (bounded, like the catalog
    * queries), then normalized to instant-semantics TimestampType exactly
    * as [[graft.Tables.load]] does — watermarks and windows downstream see
    * one type regardless of the stored representation.
    */
  def source(spark: SparkSession, srcDir: String): DataFrame = {
    if (srcDir.startsWith("bus://")) return busEventsSource(spark, srcDir)
    val stored = spark.read.parquet(srcDir).schema
      .find(_.name == "ts").map(_.dataType).getOrElse(LongType)
    val s = spark.readStream.schema(rawSchema(stored))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    stored match {
      case LongType => s.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _        => s.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Events over the MESSAGE BUS instead of files: `srcDir` of the form
    * `bus://host:port[?maxPerTrigger=N]` resolves to the GraftBus DSv2
    * micro-batch source; each record's `value` carries one event as JSON
    * ([[publishEventsToBus]]' encoding, ts in instant micros), parsed
    * back to the exact [[source]] column shape. Because the two sources
    * produce the SAME schema, EVERY registered streaming pattern runs
    * over the bus unchanged — the production on-ramp (reference analog:
    * the daily cron pulling the operational store,
    * `dags/copy_cloudsql_to_bigquery_v2.py:26`) composed with the
    * watermarked stateful patterns.
    */
  private def busEventsSource(spark: SparkSession, uri: String): DataFrame = {
    val rest = uri.stripPrefix("bus://")
    val (hp, q) = rest.span(_ != '?')
    val Array(host, port) = hp.split(':')
    val maxPerTrigger = q.stripPrefix("?").split('&')
      .collectFirst { case s if s.startsWith("maxPerTrigger=") =>
        s.stripPrefix("maxPerTrigger=") }
    val base = spark.readStream.format("graft.sources.bus.BusSourceProvider")
      .option("host", host).option("port", port)
    maxPerTrigger.foreach(n => base.option("maxRecordsPerTrigger", n))
    val payload = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    base.load()
      .select(from_json(col("value"), payload).as("e"))
      .select(col("e.event_id"), expr("timestamp_micros(e.ts_us)").as("ts"),
        col("e.user_id"), col("e.event_type"), col("e.value"),
        col("e.props"))
  }

  /** Publish an events frame to a GraftBus as JSON records — the
    * distributed-producer leg (one wire session per task, the a37
    * shape): partition by `user_id mod partitions` so a key's records
    * stay in one ordered log, record ts = the event's instant micros.
    */
  def publishEventsToBus(df: DataFrame, host: String, port: Int,
                         partitions: Int): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val tsUs = df.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000")
      case _ => expr("unix_micros(CAST(ts AS TIMESTAMP))")
    }
    df.select(
        pmod(col("user_id"), lit(partitions.toLong)).cast("int").as("p"),
        tsUs.as("ts_us"), col("event_id"),
        to_json(struct(col("event_id"), tsUs.as("ts_us"), col("user_id"),
          col("event_type"), col("value"), col("props"))).as("v"))
      .as[(Int, Long, Long, String)]
      .foreachPartition { (it: Iterator[(Int, Long, Long, String)]) =>
        val cl = new graft.sources.bus.BusClient(host, port)
        try it.foreach { case (p, ts, eid, v) =>
          cl.append(p, ts, eid.toString, v)
        } finally cl.close()
      }
  }

  /** Tumbling 1-hour windows per user with a 1-hour watermark: the
    * streaming form of batch Q20. Append mode — windows emit once closed
    * by the watermark (late rows beyond it are dropped).
    */
  def hourlyCounts(spark: SparkSession, srcDir: String,
                   checkpointDir: String, outDir: String): StreamingQuery =
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
      .select(col("user_id"), col("w.start").as("w"), col("c"), col("v"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Sliding windows (1 h window, 30 min slide): each event lands in two
    * overlapping windows — the smoothing variant of [[hourlyCounts]].
    */
  def slidingCounts(spark: SparkSession, srcDir: String,
                    checkpointDir: String, outDir: String): StreamingQuery =
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("c"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Stateful dedup on event_id bounded by the watermark — duplicate
    * events arriving within the 1-hour horizon are dropped; state is
    * evicted past it (the unbounded-state trap at 100 TB/day).
    */
  def dedupedEvents(spark: SparkSession, srcDir: String,
                    checkpointDir: String, outDir: String): StreamingQuery =
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Stream-stream interval join: each click joined to the same user's
    * purchases within the preceding hour. BOTH sides carry watermarks and
    * the join condition bounds the event-time distance — that pair is what
    * lets Spark evict buffered rows (state stays O(watermark window), the
    * difference between a runnable and an OOM-by-state join at 100 TB/day).
    * Inner join → append mode emits as soon as both sides pass the
    * watermark.
    */
  def clickPurchaseJoin(spark: SparkSession, srcDir: String,
                        checkpointDir: String, outDir: String): StreamingQuery = {
    val clicks = source(spark, srcDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, srcDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "purchase_id", "amount")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** LEFT OUTER stream-stream join — the attribution-with-misses form of
    * [[clickPurchaseJoin]]: clicks with no purchase in the window still
    * emit, with null purchase columns, once the watermark proves no
    * matching purchase can ever arrive (the join buffers the click until
    * event time passes `click_ts`, then evicts and emits the null row).
    * THE subtlety outer streaming joins add over inner ones: unmatched
    * rows are emitted BY WATERMARK PROGRESS, not by data arrival — a
    * stalled watermark means unmatched rows never surface, and clicks
    * newer than the final watermark stay buffered at stream end (the
    * spec asserts exactly this boundary).
    */
  def clickPurchaseOuterJoin(spark: SparkSession, srcDir: String,
                             checkpointDir: String, outDir: String): StreamingQuery = {
    val clicks = source(spark, srcDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, srcDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
        "leftOuter")
      .select("click_id", "user_id", "click_ts", "purchase_id", "amount")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Pattern 15 — FULL OUTER stream-stream join: the reconciliation
    * shape (every click AND every purchase must surface, matched or
    * not — the audit view a funnel's left-outer form cannot give).
    * Same keys/time-bound/watermarks as [[clickPurchaseOuterJoin]];
    * unmatched rows on EITHER side null-emit when the global watermark
    * (min over both inputs) passes them.
    */
  def clickPurchaseFullOuterJoin(spark: SparkSession, srcDir: String,
                                 checkpointDir: String, outDir: String): StreamingQuery = {
    val clicks = source(spark, srcDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, srcDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
        "fullOuter")
      .select("click_id", "user_id", "click_ts", "purchase_id",
        "p_user_id", "purchase_ts", "amount")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Pattern 16 — LEFT SEMI stream-stream join: the existence-filter
    * shape ("clicks that converted", without duplicating the click row
    * per purchase — the projection a funnel-entry selector wants).
    * Same keys/time-bound/watermarks as [[clickPurchaseJoin]]; each
    * click emits AT MOST ONCE however many purchases match, and emits
    * NOTHING when none do — the dedup-by-construction the inner join
    * cannot give. Click columns only; the right side never projects.
    */
  def clickPurchaseSemiJoin(spark: SparkSession, srcDir: String,
                            checkpointDir: String, outDir: String): StreamingQuery = {
    val clicks = source(spark, srcDir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, srcDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
        "leftSemi")
      .select("click_id", "user_id", "click_ts")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Stream-static enrichment: the event stream joined to a BATCH
    * dimension table (customer). No watermark needed on the static side —
    * Spark re-plans the batch side per micro-batch, so a dim refresh is
    * picked up at the next trigger; the stream side carries no state for
    * this join at all (it's a broadcast-able lookup, the 100 TB/day
    * enrichment shape).
    */
  def enrichedCounts(spark: SparkSession, srcDir: String, dimDir: String,
                     checkpointDir: String, outDir: String): StreamingQuery = {
    val dim = graft.Tables.load(spark, dimDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .join(broadcast(dim), Seq("user_id"), "inner")
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("window.start").as("ws"), col("segment"), col("n"), col("v"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Custom keyed state via flatMapGroupsWithState: per-user cumulative
    * event count + running value total, emitted once per micro-batch — the
    * fully-general stateful surface (§2.C) beyond what windows/dedup
    * express. State is per-key constant size. NoTimeout here because
    * `Trigger.AvailableNow` must run to completion (pending processing-time
    * timers keep a query alive past the available data); a continuously
    * deployed variant sets `GroupStateTimeout.EventTimeTimeout` + a
    * watermark so idle users are evicted and state never grows unbounded
    * at 100 TB/day.
    */
  def userTotals(spark: SparkSession, srcDir: String,
                 checkpointDir: String, outDir: String): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = source(spark, srcDir)
      .select(col("user_id"), col("value")).as[(Long, Double)]
    val updated = typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { r => n += 1; v += r._2 }
          state.update((n, v))
          Iterator((user, n, v))
      }
      .toDF("user_id", "n_events", "total_value")
    updated.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Pattern 14 — streaming CUSUM change-point alerts (the live sibling
    * of the batch dq_cusum): per event type, Page's recursion
    * `S ← max(0, S + value − k)` carried as keyed state across
    * micro-batches via flatMapGroupsWithState, alarm while S > h.
    * Within a batch the group's rows apply in (ts, event_id) order (the
    * deterministic-order contract: the recursion is order-dependent, so
    * the processing order IS the semantics — batch boundaries define
    * the interleave, pinned exactly-once by the forced-restart spec).
    * Emits one row per (type, batch): cumulative n, current S, events
    * seen in alarm state, alarm flag. STORED state per key is three
    * numbers — constant size — but the in-batch sort materializes each
    * key's micro-batch group in task memory (`rows.toSeq.sortBy`), so
    * transient memory is bounded by batch size, not by state: cap input
    * with `maxFilesPerTrigger`/`maxRecordsPerTrigger` when a key's
    * per-batch volume can spike (the NoTimeout note on [[userTotals]]
    * also applies).
    */
  def cusumAlerts(spark: SparkSession, srcDir: String,
                  checkpointDir: String, outDir: String,
                  k: Double = 55.0, h: Double = 400.0): StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = source(spark, srcDir)
      .select(col("event_type"), col("ts").cast("long").as("tsl"),
        col("event_id"), col("value"))
      .as[(String, Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Double, Long, Long), (String, Long, Double, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[(String, Long, Long, Double)],
         state: GroupState[(Double, Long, Long)]) =>
          var (s0, n0, al0) = state.getOption.getOrElse((0.0, 0L, 0L))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            s0 = math.max(0.0, s0 + r._4 - k)
            n0 += 1
            if (s0 > h) al0 += 1
          }
          state.update((s0, n0, al0))
          Iterator((tpe, n0, s0, al0, s0 > h))
      }
      .toDF("event_type", "n_events", "cusum", "n_alarm_events", "alarm")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming → warehouse bridge: the SURVEY §1 "incremental variant →
    * Structured Streaming" path made concrete. Each micro-batch's per-user
    * delta is MERGED into the published warehouse table through the same
    * stage-then-swap publish the batch pipeline uses
    * ([[graft.pipeline.Sync.publishOverwrite]]) — the streaming analog of
    * the reference's daily full-copy, except only deltas flow.
    *
    * foreachBatch is at-least-once, so the publish is made IDEMPOTENT the
    * standard way: the table carries the last merged batch id; a replayed
    * batch (id ≤ stored) is skipped. Together with the atomic
    * stage-then-swap this gives exactly-once table state end-to-end —
    * the property a daily 100 TB merge cannot live without.
    *
    * Scale: per batch, one map-side-combined aggregate of the delta
    * (batch-sized), one full-outer merge against the published table
    * (key-partitioned), one publish. The published table is re-written
    * per batch here (snapshot semantics, like the reference); a real
    * 100 TB deployment points the same code at a format with merge
    * support — the foreachBatch/idempotence/publish shape is unchanged.
    */
  def incrementalPublish(spark: SparkSession, srcDir: String,
                         checkpointDir: String, finalPath: String): StreamingQuery =
    source(spark, srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // delta per micro-batch; the idempotence guard + additive merge +
        // atomic publish are the shared Sync.idempotentDeltaPublish core
        val delta = batch.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
        graft.pipeline.Sync.idempotentDeltaPublish(
          delta, batchId, finalPath, "user_id")
      }
      .start()

  /** Tumbling-window publish — the §2.C batch-equivalence row
    * (`stream_tumbling_publish`): per (user, hour) counts/sums computed
    * INCREMENTALLY per micro-batch and additively merged into the
    * published table through the idempotent stage-then-swap path — so
    * the drained published state must equal batch Q20's answer exactly,
    * and the row shares Q20's DuckDB oracle. No watermark and no
    * streaming state: tumbling buckets are batch-local aggregable (a
    * row's bucket never depends on other rows), so the merge is the
    * whole state story — the same shape [[incrementalPublish]] uses,
    * keyed on the composite (user_id, window-start).
    */
  def tumblingPublish(spark: SparkSession, srcDir: String,
                      checkpointDir: String,
                      finalPath: String): StreamingQuery =
    source(spark, srcDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("w"))
          .agg(count(lit(1)).as("c"), sum("value").as("v"))
        graft.pipeline.Sync.idempotentDeltaPublish(
          delta, batchId, finalPath, Seq("user_id", "w"))
      }
      .start()

  /** Gap-sessionization as a stream — the STATEFUL face of the q27
    * batch sessionizer: the built-in `session_window` aggregation under
    * a watermark. Each user's events merge into [first, last+gap)
    * windows inside the state store — including sessions that SPAN
    * micro-batches (the capability foreachBatch's stateless per-batch
    * aggregate cannot express) — and a session is emitted exactly once,
    * in append mode, when the watermark passes its end. Sessions still
    * open when the source drains never emit: that is the streaming
    * contract (an open session has no final row), and the batch oracle
    * applies the same closure predicate `session_end <= max_ts - delay`.
    *
    * Semantics pinned to the microsecond: `session_window` merges an
    * event iff it lands strictly inside the current window
    * (`ts - last < gap`), so the oracle's break condition is
    * `epoch_us diff >= gap_us` — NOT q27's floored-second spelling.
    *
    * At 100 TB the state is bounded by the watermark (closed sessions
    * leave the store), keyed state shuffles once on user_id, and the
    * source must be event-time-ordered across batches (the registry
    * wrapper stages time-ranged files; a kafka source with bounded
    * disorder inside the delay behaves identically).
    */
  def sessionPublish(spark: SparkSession, srcDir: String,
                     checkpointDir: String, outDir: String): StreamingQuery = {
    // State-partition sizing (guide §2.2, fewer/larger partitions): a
    // stateful query's shuffle-partition count is pinned into the
    // checkpoint at batch 0 and every micro-batch pays per-partition
    // state-store commit cost (delta + snapshot files) — so it must be
    // sized to STATE VOLUME, deliberately, not inherited from the batch
    // engine's core-count default. Here the state is one entry per open
    // session (KB-scale), so the local default is 8. Controlled 3×
    // matrix at sf0.1 (OPTIMIZATION_r15.md): the warm drain floors at
    // ~4.2–5.3 s at BOTH 2 and 8 partitions — per-micro-batch
    // planning/commit cost dominates locally — so this setting is about
    // the SCALE shape (per-partition commit fan-out), not a local win.
    // A deployment with large session state raises
    // SPARK_GRAFT_STREAM_STATE_PARTS; resume-from-checkpoint always
    // reuses the pinned value, whatever the env says (Spark contract).
    // The override lives in an isolated child session so the batch
    // engine's conf is untouched (no global mutation to restore).
    val parts = sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTS", "8")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", parts)
    source(ss, srcDir)
      .withWatermark("ts", "1 second")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("v"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("n_events"), col("v"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Stream-vs-lake dedup — the crawl-ingest shape: rows whose content
    * fingerprint already exists in the static lake are dropped AS THE
    * STREAM LANDS. [[graft.operators.Dedup.incrementalNew]] composes onto
    * the streaming frame unchanged because it is stateless: the lake's
    * Bloom sketch builds once at stream start (bounded, driver-side — the
    * q31 technique) and rides every micro-batch as a row-local
    * pre-filter; sketch false positives get the exact verdict from the
    * stream-static left-anti join, which Spark re-plans per micro-batch.
    * Append mode, no streaming state at all — at 100 TB/day the only
    * per-row cost for a definitely-new row is one hash against an
    * MB-sized sketch. Spec-pinned equal to the batch anti-join on the
    * drained input.
    */
  def lakeDedupedEvents(spark: SparkSession, srcDir: String, lake: DataFrame,
                        checkpointDir: String, outDir: String): StreamingQuery = {
    val content = concat_ws("|", col("event_type"), col("props"))
    val stream = source(spark, srcDir)
      .select(col("event_id"), content.as("content"))
    graft.operators.Dedup.incrementalNew(stream,
        lake.select(content.as("content")), "event_id", "content")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Trending items per hour — the streaming face of the Misra–Gries
    * heavy-hitters sketch ([[graft.functions.HeavyHittersAgg]]): per
    * tumbling window, the top-`k` (event_type:prop) items by sketch
    * estimate, emitted once the watermark closes the window.
    *
    * Why a sketch in the stream: a per-window `groupBy(item)` keeps
    * state proportional to the distinct-item domain — unbounded on a
    * real event firehose. The MG aggregate caps per-window state at a
    * hard `cap` counters inside the streaming state store (the same
    * partial/final buffer lifecycle as any built-in agg), and the
    * deterministic (est desc, item asc) rank picks the report rows.
    * With `cap` ≥ the window's distinct items the estimates are exact —
    * the spec-checked configuration, equal to the batch top-k; the
    * lossy regime inherits the MGSketch bounds (HeavyHittersSpec).
    */
  def trendingTopK(spark: SparkSession, srcDir: String,
                   checkpointDir: String, outDir: String,
                   cap: Int = 1024, k: Int = 5): StreamingQuery = {
    val hh = udaf(graft.functions.HeavyHittersAgg(cap))
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .withColumn("item",
        concat(col("event_type"), lit(":"), get_json_object(col("props"), "$.k")))
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(hh(col("item")).as("sk"))
      // top-k is ROW-LOCAL: one row per window carries the whole ≤cap
      // map, so rank = sort the entries in place — no second shuffle,
      // and no (unsupported-in-streaming) rank window needed
      .select(col("w.start").as("w"), posexplode(slice(array_sort(
        map_entries(col("sk")),
        (a, b) => when(a("value") > b("value"), -1)
          .when(a("value") < b("value"), 1)
          .when(a("key") < b("key"), -1)
          .when(a("key") > b("key"), 1).otherwise(0)), 1, k)))
      .select(col("w"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("item"), col("col.value").as("est"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Session windows (10-minute gap) per user — the §2.C extension the
    * reference has no analog for; state closes via watermark.
    */
  def sessionCounts(spark: SparkSession, srcDir: String,
                    checkpointDir: String, outDir: String): StreamingQuery =
    source(spark, srcDir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("c"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
}
