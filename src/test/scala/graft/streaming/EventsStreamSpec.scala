package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class EventsStreamSpec extends SparkTestBase {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** File-stream sources need a directory; stage the single-file events
    * table into one (the incremental-ingest layout: one file per arrival).
    */
  private lazy val eventsDir: String = {
    val d = Files.createTempDirectory("es_src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events-000.parquet"))
    d.toString
  }

  test("hourly windowed counts with watermark match the batch aggregation (closed windows)") {
    val out = tmp("es_out")
    val q = EventsStream.hourlyCounts(spark, eventsDir,
      tmp("es_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("w"))
      .agg(count(lit(1)).as("c"), round(sum("value"), 2).as("v"))
    // append mode only emits windows closed by the final watermark
    // (max ts - 1 h); every emitted window must agree with batch.
    assert(streamed.count() > 0, "closed windows must be emitted")
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.user_id") === col("b.user_id") && col("s.w") === col("b.w"))
    assert(joined.count() == streamed.count(), "every streamed window exists in batch")
    assert(joined.filter(col("s.c") =!= col("b.c") || col("s.v") =!= col("b.v"))
      .count() == 0, "window aggregates must match batch")
  }

  test("hourlyCounts EQUALS batch q20 on the watermark-closed domain " +
      "(streaming-batch equivalence, both directions)") {
    // The oracle-grade streaming check: after Trigger.AvailableNow drains,
    // the streamed output must be EXACTLY the batch q20 result restricted
    // to windows the final watermark closed — not merely a consistent
    // subset. Completeness matters: a stream that emitted one correct
    // window would pass the subset test above but fail this one.
    val out = tmp("es_eq_out")
    EventsStream.hourlyCounts(spark, eventsDir, tmp("es_eq_ckpt"), out)
      .awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("user_id", "w", "c", "v")
    val ev = Tables.load(spark, sfDir, "events")
    // final watermark = max event time - 1 h, truncated to millis (Spark
    // tracks watermarks in milliseconds); a window [w, w+1h) is emitted
    // once the watermark passes its end
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val wmMillis = maxTs.getTime - 3600 * 1000L
    val batchClosed = graft.operators.Queries.q20(spark, sfDir)
      .filter((col("w") + expr("INTERVAL 1 HOUR")).cast("long") * 1000L <= wmMillis)
      .select("user_id", "w", "c", "v")
    val nClosed = batchClosed.count()
    assert(nClosed > 0, "fixture must close at least one window")
    assert(streamed.count() == nClosed,
      s"streamed ${streamed.count()} windows vs $nClosed closed batch windows")
    assert(streamed.exceptAll(batchClosed).isEmpty &&
      batchClosed.exceptAll(streamed).isEmpty,
      "streamed output must equal the batch aggregate on closed windows")
  }

  test("stream-static enrichment join matches the batch join (closed windows)") {
    val out = tmp("es_enr_out")
    val q = EventsStream.enrichedCounts(spark, eventsDir, sfDir,
      tmp("es_enr_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    assert(streamed.count() > 0, "closed windows must be emitted")
    val dim = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val batch = Tables.load(spark, sfDir, "events")
      .join(dim, "user_id")
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.ws") === col("b.ws") && col("s.segment") === col("b.segment"))
    assert(joined.count() == streamed.count(), "every streamed window exists in batch")
    assert(joined.filter(col("s.n") =!= col("b.n") || col("s.v") =!= col("b.v"))
      .count() == 0, "enriched window aggregates must match batch")
  }

  test("stream-stream interval join matches the batch interval join") {
    val out = tmp("es_ssj_out")
    val q = EventsStream.clickPurchaseJoin(spark, eventsDir,
      tmp("es_ssj_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "purchase_id", "amount")
    // inner stream-stream join with both sides watermarked: every emitted
    // pair must exist in batch, and pairs whose BOTH sides are clear of
    // the final watermark must all have been emitted
    assert(streamed.count() > 0, "join must emit pairs")
    assert(streamed.exceptAll(batch).isEmpty, "no pair absent from batch")
    assert(batch.exceptAll(streamed).isEmpty,
      "single-batch AvailableNow run must emit every pair")
  }

  test("left-outer stream-stream join: matches equal inner, unmatched " +
      "clicks null-emit exactly up to the final watermark") {
    val out = tmp("es_soj_out")
    val q = EventsStream.clickPurchaseOuterJoin(spark, eventsDir,
      tmp("es_soj_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
    val inner = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "purchase_id", "amount")
    val matched = streamed.filter(col("purchase_id").isNotNull)
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty,
      "matched rows must equal the batch inner join")
    // null rows: only for clicks with NO batch match...
    val nulls = streamed.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val matchedIds = inner.select("click_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((nulls & matchedIds).isEmpty, "a matched click must never null-emit")
    // ...and EVERY unmatched click the final watermark has cleanly
    // passed must have null-emitted (emission is driven by watermark
    // progress). The GLOBAL watermark is the MIN over both inputs'
    // (max event time − 1 h) — the purchase stream's clock gates click
    // eviction too; plus one extra hour of margin because watermark
    // updates apply to the FOLLOWING micro-batch.
    val maxClick = clicks.agg(max("click_ts")).head().getTimestamp(0).getTime
    val maxPurch = purchases.agg(max("purchase_ts")).head().getTimestamp(0).getTime
    val wm = math.min(maxClick, maxPurch) - 3600 * 1000L
    val unmatchedOldRows = clicks
      .join(inner.select("click_id").distinct(), Seq("click_id"), "left_anti")
      .filter(col("click_ts") < to_timestamp(lit((wm - 3600 * 1000L) / 1000L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val unmatchedOld = unmatchedOldRows.map(_._1).toSet
    assert(unmatchedOld.subsetOf(nulls),
      s"watermark-cleared unmatched clicks missing: " +
        unmatchedOldRows.filterNot(r => nulls(r._1)).mkString(", ") +
        s" (watermark ${new java.sql.Timestamp(wm)})")
    assert(nulls.nonEmpty, "the corpus must exercise the null path")
  }

  test("full-outer stream-stream join: matched equals inner, BOTH sides " +
      "null-emit their watermark-cleared unmatched rows") {
    val out = tmp("es_foj_out")
    val q = EventsStream.clickPurchaseFullOuterJoin(spark, eventsDir,
      tmp("es_foj_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        round(col("value"), 2).as("amount"))
    val inner = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select("click_id", "user_id", "click_ts", "purchase_id",
        "p_user_id", "purchase_ts", "amount")
    val matched = streamed
      .filter(col("purchase_id").isNotNull && col("click_id").isNotNull)
    assert(matched.exceptAll(inner).isEmpty && inner.exceptAll(matched).isEmpty,
      "matched rows must equal the batch inner join")
    val nullP = streamed.filter(col("purchase_id").isNull)
      .select("click_id").collect().map(_.getLong(0)).toSet
    val nullC = streamed.filter(col("click_id").isNull)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    val matchedClicks = inner.select("click_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val matchedPurch = inner.select("purchase_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((nullP & matchedClicks).isEmpty, "matched click null-emitted")
    assert((nullC & matchedPurch).isEmpty, "matched purchase null-emitted")
    // both-side eviction is gated by the GLOBAL watermark (min over both
    // inputs' max event time − 1 h), with one extra hour of margin
    // because watermark updates apply to the FOLLOWING micro-batch
    val maxClick = clicks.agg(max("click_ts")).head().getTimestamp(0).getTime
    val maxPurch = purchases.agg(max("purchase_ts")).head().getTimestamp(0).getTime
    val wm = math.min(maxClick, maxPurch) - 3600 * 1000L
    val cut = to_timestamp(lit((wm - 3600 * 1000L) / 1000L))
    val unmatchedOldClicks = clicks
      .join(inner.select("click_id").distinct(), Seq("click_id"), "left_anti")
      .filter(col("click_ts") < cut)
      .collect().map(_.getLong(0)).toSet
    val unmatchedOldPurch = purchases
      .join(inner.select("purchase_id").distinct(), Seq("purchase_id"), "left_anti")
      .filter(col("purchase_ts") < cut)
      .collect().map(_.getLong(0)).toSet
    assert(unmatchedOldClicks.subsetOf(nullP),
      s"cleared unmatched clicks missing: ${(unmatchedOldClicks -- nullP).take(5)}")
    assert(unmatchedOldPurch.subsetOf(nullC),
      s"cleared unmatched purchases missing: ${(unmatchedOldPurch -- nullC).take(5)}")
    assert(nullP.nonEmpty && nullC.nonEmpty,
      "the corpus must exercise both null paths")
  }

  test("left-semi stream-stream join: exactly the matched clicks, each " +
      "at most once, equal to the batch semi join") {
    val out = tmp("es_ssj_out")
    val q = EventsStream.clickPurchaseSemiJoin(spark, eventsDir,
      tmp("es_ssj_ckpt"), out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val ev = Tables.load(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    val semi = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"),
        "leftSemi")
    assert(streamed.count() > 0, "the corpus must exercise the semi path")
    assert(streamed.exceptAll(semi).isEmpty && semi.exceptAll(streamed).isEmpty,
      "streamed semi join must equal the batch semi join")
    assert(streamed.groupBy("click_id").count()
      .filter(col("count") > 1).count() == 0,
      "multi-purchase clicks must still emit exactly once")
  }

  test("stateful dedup within watermark keeps event_ids unique") {
    val out = tmp("es_dd_out")
    val q = EventsStream.dedupedEvents(spark, eventsDir,
      tmp("es_dd_ckpt"), out)
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() > 0)
    assert(got.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("checkpointed restart is exactly-once: re-run emits nothing new") {
    val out = tmp("es_eo_out")
    val ckpt = tmp("es_eo_ckpt")
    EventsStream.hourlyCounts(spark, eventsDir, ckpt, out).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // same checkpoint, same source, no new files → a restarted query must
    // recognize committed offsets and emit zero additional rows
    EventsStream.hourlyCounts(spark, eventsDir, ckpt, out).awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n2 == n1, s"restart duplicated output: $n1 -> $n2")
  }

  /** Write a DataFrame as ONE plain parquet file inside a file-stream
    * source dir (file sources list plain files; a nested write dir with
    * its _SUCCESS marker is not the arrival layout).
    */
  private def writeAsFile(df: org.apache.spark.sql.DataFrame,
                          destDir: String, name: String): Unit = {
    val t = Files.createTempDirectory("es_half").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$t/d")
    val part = new java.io.File(s"$t/d").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath,
      java.nio.file.Paths.get(destDir).resolve(name))
  }

  test("forced restart mid-stream is exactly-once for EVERY stateful " +
      "pattern: dedup-within-watermark, stream-stream outer join, " +
      "trending top-k (split run == unbroken run on the closed domain)") {
    import org.apache.spark.sql.DataFrame
    // time-split the corpus at its median so the restart boundary sits
    // between two watermark-ordered arrivals (no late-drop asymmetry)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val isLong =
      raw.schema("ts").dataType == org.apache.spark.sql.types.LongType
    val mid = raw.orderBy("ts").select("ts")
      .collect().apply((raw.count() / 2).toInt).get(0)
    val early = raw.filter(col("ts") <= lit(mid))
    val late = raw.filter(col("ts") > lit(mid))
    // cross-restart duplicates: early rows re-arrive in phase 2, so the
    // dedup pattern can only stay exactly-once if its state store
    // survives the restart (the unbroken run sees the same files, so
    // equality proves state continuity, not accident). Only rows ABOVE
    // the phase-1 watermark W1 = earlyMax − 1 h qualify: Spark's
    // late-event fence is the PREVIOUS batch's watermark, and the
    // restart inserts a no-data batch that advances it — a duplicate
    // below W1 is admitted by the unbroken run but late-dropped by the
    // restarted one (legal divergence on late data, not a state defect).
    val earlyMaxMicros: Long =
      if (isLong) early.agg(max("ts")).head().getLong(0) / 1000L
      else {
        val t = early.agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      }
    val w1Micros = earlyMaxMicros - 3600L * 1000000L
    val dupTail = (
      if (isLong) early.filter(col("ts") > lit((w1Micros + 1000000L) * 1000L))
      else early.filter(col("ts").cast("timestamp") >
        expr(s"timestamp_micros(${w1Micros + 1000000L}L)"))
    ).limit(50)
    assert(dupTail.count() > 0, "corpus too sparse to exercise duplicates")
    val late2 = late.unionAll(dupTail)
    // common SENTINEL final batch: one far-future click + purchase. Both
    // runs then execute their LAST DATA BATCH with the same watermark
    // (maxLateTs − 1 h), so every pattern flushes identically below that
    // fence. What a run flushes ABOVE it depends on the trailing no-data
    // batch, which Spark does NOT replay after an AvailableNow restart —
    // that boundary is excluded from the comparison, exactly like the
    // existing left-outer spec pins "clicks newer than the final
    // watermark stay buffered".
    def shift(df: DataFrame): DataFrame =
      if (isLong) df.withColumn("ts", col("ts") + lit(400L * 3600L * 1000000000L))
      else df.withColumn("ts", expr("ts + INTERVAL 400 HOURS"))
    val top = late.orderBy(col("ts").desc).limit(1)
    val sentinel = shift(top)
      .withColumn("event_id", lit(-1L)).withColumn("user_id", lit(999999L))
      .withColumn("event_type", lit("click"))
      .unionAll(shift(top)
        .withColumn("event_id", lit(-2L)).withColumn("user_id", lit(999998L))
        .withColumn("event_type", lit("purchase")))
    // the fence in instant micros: maxLateTs − 1 h − 1 s safety margin
    val lateMaxMicros: Long =
      if (isLong) late.agg(max("ts")).head().getLong(0) / 1000L
      else {
        val t = late.agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
        t.getTime * 1000L + (t.getNanos / 1000) % 1000
      }
    val fence = lateMaxMicros - 3600L * 1000000L - 1000000L
    val fenceTs = s"timestamp_micros(${fence}L)"

    val patterns = Seq[(String,
        (String, String, String) => org.apache.spark.sql.streaming.StreamingQuery,
        DataFrame => DataFrame)](
      // dedup emits on arrival (state only FILTERS) — compare everything
      ("dedup", EventsStream.dedupedEvents(spark, _, _, _), identity),
      // outer-join nulls emit by watermark progress — fence click_ts
      ("outer_join", EventsStream.clickPurchaseOuterJoin(spark, _, _, _),
        df => df.filter(col("purchase_id").isNotNull ||
          col("click_ts") < expr(fenceTs))),
      // windows emit when the watermark passes w_end — fence w + 1 h
      ("trending_topk", EventsStream.trendingTopK(spark, _, _, _),
        df => df.filter(expr(s"w + INTERVAL 1 HOUR < $fenceTs"))))
    patterns.foreach { case (tag, run, closed) =>
      // unbroken reference: all three files visible from the start (the
      // maxFilesPerTrigger=1 source still batches them identically)
      val srcU = tmp(s"es_fr_${tag}_srcU")
      writeAsFile(early, srcU, "a-early.parquet")
      writeAsFile(late2, srcU, "b-late.parquet")
      writeAsFile(sentinel, srcU, "c-sentinel.parquet")
      val outU = tmp(s"es_fr_${tag}_outU")
      run(srcU, tmp(s"es_fr_${tag}_ckptU"), outU).awaitTermination()
      val expected = closed(spark.read.parquet(outU))

      // split run: drain phase 1, STOP (query terminates), then the late
      // files arrive and a new query resumes from the same checkpoint
      val srcS = tmp(s"es_fr_${tag}_srcS")
      writeAsFile(early, srcS, "a-early.parquet")
      val ckptS = tmp(s"es_fr_${tag}_ckptS")
      val outS = tmp(s"es_fr_${tag}_outS")
      run(srcS, ckptS, outS).awaitTermination()
      writeAsFile(late2, srcS, "b-late.parquet")
      writeAsFile(sentinel, srcS, "c-sentinel.parquet")
      run(srcS, ckptS, outS).awaitTermination() // the forced restart
      val got = closed(spark.read.parquet(outS))

      assert(got.count() == expected.count(),
        s"$tag: restart changed the closed-domain row count " +
          s"(${got.count()} vs unbroken ${expected.count()}); " +
          s"missing=${expected.exceptAll(got).limit(5).collect().toSeq}; " +
          s"extra=${got.exceptAll(expected).limit(5).collect().toSeq}")
      assert(got.exceptAll(expected).isEmpty &&
        expected.exceptAll(got).isEmpty,
        s"$tag: restarted output differs from the unbroken run")
    }
  }

  test("forced restart resumes flatMapGroupsWithState: per-user totals " +
      "CONTINUE across the restart instead of resetting") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val mid = raw.orderBy("ts").select("ts")
      .collect().apply((raw.count() / 2).toInt).get(0)
    val srcS = tmp("es_fr_ut_src")
    writeAsFile(raw.filter(col("ts") <= lit(mid)), srcS, "a-early.parquet")
    val ckpt = tmp("es_fr_ut_ckpt")
    val out = tmp("es_fr_ut_out")
    EventsStream.userTotals(spark, srcS, ckpt, out).awaitTermination()
    writeAsFile(raw.filter(col("ts") > lit(mid)), srcS, "b-late.parquet")
    EventsStream.userTotals(spark, srcS, ckpt, out).awaitTermination()
    // a state reset would restart phase-2 users from zero; the final
    // emitted totals must equal the batch aggregate over BOTH halves
    val finalPerUser = spark.read.parquet(out).groupBy("user_id")
      .agg(max("n_events").as("n"), max("total_value").as("v"))
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("bn"), sum("value").as("bv"))
    val j = finalPerUser.join(batch, "user_id")
    assert(j.count() == batch.count())
    assert(j.filter(col("n") =!= col("bn") ||
      abs(col("v") - col("bv")) > 1e-6).count() == 0,
      "totals after restart must equal the unbroken batch aggregate")
  }

  test("flatMapGroupsWithState accumulates per-user totals matching batch") {
    val out = tmp("es_st_out")
    val q = EventsStream.userTotals(spark, eventsDir, tmp("es_st_ckpt"), out)
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() > 0)
    // final emitted row per user equals the batch aggregate
    val finalPerUser = got.groupBy("user_id")
      .agg(max("n_events").as("n"), max("total_value").as("v"))
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("bn"), sum("value").as("bv"))
    val j = finalPerUser.join(batch, "user_id")
    assert(j.count() == batch.count())
    assert(j.filter(col("n") =!= col("bn") ||
      abs(col("v") - col("bv")) > 1e-6).count() == 0)
  }

  test("RocksDB state store: stateful per-user totals are IDENTICAL to " +
      "the in-memory provider's (the provider is storage, not semantics)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, graft.Engine.RocksDbProvider)
    try {
      val out = tmp("es_rdb_out")
      val q = EventsStream.userTotals(spark, eventsDir, tmp("es_rdb_ckpt"), out)
      q.awaitTermination()
      val got = spark.read.parquet(out)
      assert(got.count() > 0)
      val finalPerUser = got.groupBy("user_id")
        .agg(max("n_events").as("n"), max("total_value").as("v"))
      val batch = Tables.load(spark, sfDir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("bn"), sum("value").as("bv"))
      val j = finalPerUser.join(batch, "user_id")
      assert(j.count() == batch.count())
      assert(j.filter(col("n") =!= col("bn") ||
        abs(col("v") - col("bv")) > 1e-6).count() == 0)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("RocksDB state store: the Misra-Gries UDAF's aggregation buffer " +
      "round-trips through RocksDB state (trending top-k unchanged)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    // baseline under the default provider
    val outMem = tmp("es_ttm_out")
    EventsStream.trendingTopK(spark, eventsDir, tmp("es_ttm_ckpt"), outMem)
      .awaitTermination()
    val mem = spark.read.parquet(outMem).select("w", "rank", "item", "est")
      .collect().map(_.toString).sorted
    assert(mem.nonEmpty)
    spark.conf.set(key, graft.Engine.RocksDbProvider)
    try {
      val out = tmp("es_ttr_out")
      EventsStream.trendingTopK(spark, eventsDir, tmp("es_ttr_ckpt"), out)
        .awaitTermination()
      val rdb = spark.read.parquet(out).select("w", "rank", "item", "est")
        .collect().map(_.toString).sorted
      assert(rdb.toSeq == mem.toSeq,
        "UDAF sketch state must serialize identically through RocksDB")
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sliding windows emit overlapping strata consistent with tumbling") {
    val out = tmp("es_sl_out")
    EventsStream.slidingCounts(spark, eventsDir, tmp("es_sl_ckpt"), out)
      .awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() > 0)
    // every window is exactly 1 h wide, starts on a 30-min boundary
    val bad = got.filter(
      unix_timestamp(col("w_end")) - unix_timestamp(col("w_start")) =!= 3600 ||
        unix_timestamp(col("w_start")) % 1800 =!= 0)
    assert(bad.count() == 0)
    // on-the-hour sliding windows must agree with the tumbling query's
    // counts for the same closed hours (computed batch-side)
    val batchHours = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("bc"))
    val onHour = got.filter(unix_timestamp(col("w_start")) % 3600 === 0)
    val j = onHour.join(batchHours, "w_start")
    assert(j.count() == onHour.count())
    assert(j.filter(col("c") =!= col("bc")).count() == 0)
  }

  test("incremental foreachBatch publish: multi-batch merge equals batch " +
       "recomputation, and replays are idempotent") {
    // two source files → two micro-batches (maxFilesPerTrigger=1): the
    // second batch must MERGE into the published table, not replace it
    val src = Files.createTempDirectory("es_ip_src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      src.resolve("events-000.parquet"))
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      src.resolve("events-001.parquet"))
    val ckpt = tmp("es_ip_ckpt")
    val fin = tmp("es_ip_fin") + "/user_totals"
    EventsStream.incrementalPublish(spark, src.toString, ckpt, fin)
      .awaitTermination()
    val got = graft.pipeline.Sync.readPublished(spark, fin).get
    // ground truth: the same events counted twice (two identical files)
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id")
      .agg((count(lit(1)) * 2).as("bn"), (sum("value") * 2).as("bv"))
    val j = got.join(batch, "user_id")
    assert(j.count() == got.count() && got.count() == batch.count())
    assert(j.filter(col("n_events") =!= col("bn") ||
      abs(col("total_value") - col("bv")) > 1e-6).count() == 0,
      "published totals must equal the batch recomputation over both files")
    // idempotence: re-running against the SAME checkpoint finds no new
    // data and must leave the published table byte-identical
    val before = got.orderBy("user_id").collect().toSeq
    EventsStream.incrementalPublish(spark, src.toString, ckpt, fin)
      .awaitTermination()
    val after = graft.pipeline.Sync.readPublished(spark, fin).get
      .orderBy("user_id").collect().toSeq
    assert(after == before, "replay with no new data must be a no-op")
  }

  test("stream-vs-lake dedup equals the batch anti-join on the drained input") {
    val content = concat_ws("|", col("event_type"), col("props"))
    val all = Tables.load(spark, sfDir, "events")
    // lake = the content of every third event; those rows must be dropped
    // from the stream (content-keyed, so OTHER ids with equal content drop
    // too — exactly what the batch anti-join says)
    val lake = all.filter(col("event_id") % 3 === 0)
    val out = tmp("es_ld_out")
    EventsStream.lakeDedupedEvents(spark, eventsDir, lake,
        tmp("es_ld_ckpt"), out)
      .awaitTermination()
    val got = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val want = graft.operators.Dedup.incrementalNew(
        all.select(col("event_id"), content.as("content")),
        lake.select(content.as("content")), "event_id", "content")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"drained stream (${got.size}) must equal batch (${want.size})")
    // and the plain anti-join agrees (incrementalNew is provably identical)
    val plain = all.select(col("event_id"), content.as("content"))
      .join(lake.select(content.as("content")), Seq("content"), "left_anti")
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == plain)
  }

  test("trending top-k EQUALS the batch exact top-k on closed windows " +
      "(over-capacity sketch regime)") {
    val out = tmp("es_tt_out")
    EventsStream.trendingTopK(spark, eventsDir, tmp("es_tt_ckpt"), out)
      .awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("w", "rank", "item", "est")
    assert(streamed.count() > 0, "closed windows must emit trending rows")
    // batch truth: exact per-window item counts, same deterministic
    // (count desc, item asc) rank, restricted to watermark-closed windows
    val ev = Tables.load(spark, sfDir, "events")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val wmMillis = maxTs.getTime - 3600 * 1000L
    import org.apache.spark.sql.expressions.Window
    val rnk = Window.partitionBy("w").orderBy(col("est").desc, col("item"))
    val batch = ev
      .withColumn("item", concat(col("event_type"), lit(":"),
        get_json_object(col("props"), "$.k")))
      .groupBy(date_trunc("hour", col("ts")).as("w"), col("item"))
      .agg(count(lit(1)).as("est"))
      .withColumn("rank", row_number().over(rnk).cast("long"))
      .filter(col("rank") <= 5)
      .filter((col("w") + expr("INTERVAL 1 HOUR")).cast("long") * 1000L <= wmMillis)
      .select("w", "rank", "item", "est")
    assert(streamed.count() == batch.count(),
      s"streamed ${streamed.count()} rows vs batch ${batch.count()}")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed trending rows must equal the batch exact top-k")
  }

  test("session windows close via watermark and never overlap per user") {
    val out = tmp("es_sw_out")
    val q = EventsStream.sessionCounts(spark, eventsDir,
      tmp("es_sw_ckpt"), out)
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() > 0)
    // sessions for one user must be disjoint: start of next >= end of prev
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("w_start")
    val overlaps = got
      .withColumn("prev_end", lag("w_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("w_start") < col("prev_end"))
    assert(overlaps.count() == 0)
  }

  test("sessionPublish over time-ranged batches EQUALS the batch gap-" +
      "sessionizer at microsecond semantics on the watermark-closed set") {
    import org.apache.spark.sql.expressions.Window
    // the registry wrapper's staging, in miniature: four time-ranged
    // files drained as four ordered micro-batches, so sessions spanning
    // a range boundary exercise cross-batch state merge
    val src = tmp("es_sp_src")
    val ev = Tables.load(spark, sfDir, "events")
    val ranged = ev.withColumn("qr",
      ntile(4).over(Window.orderBy("ts", "event_id")))
    val fs = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (r <- 1 to 4) {
      val stage = tmp(s"es_sp_stage$r")
      ranged.filter(col("qr") === r).drop("qr")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$stage/part-*"))(0).getPath
      fs.rename(part,
        new org.apache.hadoop.fs.Path(f"$src/part-$r%02d.parquet"))
    }
    val out = tmp("es_sp_out")
    EventsStream.sessionPublish(spark, src, tmp("es_sp_ck"), out)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("user_id"), col("w_start"), col("w_end"),
        col("n_events").cast("long").as("n_events"),
        round(col("v"), 2).as("v"))
      .orderBy("user_id", "w_start").collect().map(_.toSeq)
    // batch truth: session_window's exact microsecond break (diff >=
    // gap), closure = session_end <= max_ts - delay
    val byUser = Window.partitionBy("user_id")
      .orderBy("tus", "event_id")
    val sess = ev
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("prev", lag("tus", 1).over(byUser))
      .withColumn("brk", when(col("prev").isNull ||
        col("tus") - col("prev") >= 1800000000L, 1L).otherwise(0L))
      .withColumn("seq", sum("brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "seq")
      .agg(min("ts").as("w_start"),
        (max("tus") + 1800000000L).as("end_us"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("v"))
    val maxTs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val want = sess.filter(col("end_us") <= maxTs - 1000000L)
      .select(col("user_id"), col("w_start"),
        timestamp_micros(col("end_us")).as("w_end"),
        col("n_events"), col("v"))
      .orderBy("user_id", "w_start").collect().map(_.toSeq)
    assert(want.nonEmpty && got.length == want.length,
      s"closed-session counts differ: got ${got.length}, want ${want.length}")
    assert(got.toSeq == want.toSeq)
  }

  test("streaming CUSUM alerts: single-run final state equals the batch " +
      "recursion in (ts, event_id) order; forced restart continues the " +
      "recursion instead of resetting") {
    // batch recursion over the full ordered history, per event type
    def batchCusum(k: Double, h: Double): Map[String, (Long, Double, Long)] = {
      val rows = Tables.load(spark, sfDir, "events")
        .select(col("event_type"), col("ts").cast("long"), col("event_id"),
          col("value"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      rows.groupBy(_._1).map { case (t, rs) =>
        var s = 0.0; var al = 0L
        rs.sortBy(r => (r._2, r._3)).foreach { r =>
          s = math.max(0.0, s + r._4 - k); if (s > h) al += 1
        }
        t -> (rs.length.toLong, s, al)
      }
    }
    val expect = batchCusum(55.0, 400.0)
    // unbroken run
    val out1 = tmp("es_cu_out")
    EventsStream.cusumAlerts(spark, eventsDir, tmp("es_cu_ck"), out1)
      .awaitTermination()
    val one = spark.read.parquet(out1).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    expect.foreach { case (t, (n, s, al)) =>
      val (gn, gs, gal) = one(t)
      assert(gn == n && math.abs(gs - s) < 1e-9 && gal == al, s"type $t")
    }
    // forced restart at the ts midpoint: recursion must CONTINUE
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val mid = raw.orderBy("ts").select("ts")
      .collect().apply((raw.count() / 2).toInt).get(0)
    val srcS = tmp("es_cu_fr_src")
    writeAsFile(raw.filter(col("ts") <= lit(mid)), srcS, "a-early.parquet")
    val ckpt = tmp("es_cu_fr_ck")
    val out2 = tmp("es_cu_fr_out")
    EventsStream.cusumAlerts(spark, srcS, ckpt, out2).awaitTermination()
    writeAsFile(raw.filter(col("ts") > lit(mid)), srcS, "b-late.parquet")
    EventsStream.cusumAlerts(spark, srcS, ckpt, out2).awaitTermination()
    val fin = spark.read.parquet(out2).groupBy("event_type")
      .agg(max("n_events").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // final cumulative state equals the unbroken batch recursion (the two
    // halves are ts-contiguous, so the interleave IS the global order)
    val finRows = spark.read.parquet(out2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    expect.foreach { case (t, (n, s, al)) =>
      assert(fin(t) == n, s"restart lost/duplicated events for $t")
      val last = finRows.filter(x => x._1 == t && x._2 == n).head
      assert(math.abs(last._3 - s) < 1e-9 && last._4 == al,
        s"restart must continue the recursion for $t")
    }
  }
}
