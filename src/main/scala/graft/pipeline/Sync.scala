package graft.pipeline

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.TypeMapper

/** One export source for a sync run — the slot the reference fills with
  * Cloud SQL (reference dags/cloudsql_to_bigquery.py:100-127 server-side,
  * dags/copy_cloudsql_to_bigquery_v2.py:82-95 cursor). The query is
  * arbitrary source-dialect SELECT, shipped verbatim (A1/A3).
  */
trait SqlSource {
  def read(spark: SparkSession, exportQuery: String): DataFrame
}

/** Source = the registered temp views of a test-table dir (parquet stands
  * in for the relational source; the export query still executes as real
  * SQL over it, preserving the verbatim-SELECT contract).
  */
final case class ViewSource(dir: String) extends SqlSource {
  def read(spark: SparkSession, exportQuery: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(exportQuery)
  }
}

/** Source = a live JDBC database; the query executes inside it (A1). */
final case class JdbcSqlSource(url: String, props: Map[String, String] = Map.empty)
    extends SqlSource {
  def read(spark: SparkSession, exportQuery: String): DataFrame =
    graft.sources.JdbcSource.readQuery(spark, url, exportQuery, props)
}

/** The sync pipeline: export → stage → merge → publish, per TableConfig —
  * the reference's whole job re-expressed (reference
  * dags/cloudsql_to_bigquery.py:273-287 wiring; §3.3 of SURVEY.md).
  */
object Sync {

  /** A15 — the run-date literal (`{{ ds_nodash }}`) that keys every staging
    * artifact (reference dags/cloudsql_to_bigquery.py:109,226-227).
    */
  def runDateLiteral(runDate: LocalDate): String =
    runDate.format(DateTimeFormatter.ofPattern("yyyyMMdd"))

  /** Failure-alerting hook — the engine analog of the reference's
    * `email_on_failure` / `email_on_retry` toggles
    * (reference dags/cloudsql_to_bigquery.py:26-28, both `False` there —
    * the SLOT is the declared surface, not an SMTP client). The default
    * is the reference's own configuration: both off, nothing fires.
    * Deployments plug a pager/email/webhook into the two callbacks;
    * alert failures are swallowed (an alerting outage must never turn a
    * recoverable retry into a job failure).
    */
  trait AlertHook {
    def alertOnRetry: Boolean = false
    def alertOnFailure: Boolean = false
    /** Fired before each retry sleep, when `alertOnRetry`. */
    def onRetry(attempt: Int, error: Throwable): Unit = ()
    /** Fired once, when retries are exhausted, when `alertOnFailure`. */
    def onFailure(attempts: Int, error: Throwable): Unit = ()
  }

  /** The reference's shipped configuration: alerts declared, disabled. */
  object NoAlerts extends AlertHook

  /** A13 — retry wrapper (reference default_args: retries=2, 60 s delay,
    * dags/cloudsql_to_bigquery.py:29-30). Tasks stay idempotent because
    * every sink overwrites. The [[AlertHook]] fires on each retry and on
    * final failure, mirroring the reference's email toggles.
    */
  def retry[T](retries: Int = 2, delayMs: Long = 60000L,
               alerts: AlertHook = NoAlerts)(body: => T): T = {
    var attempt = 0
    var out: Option[T] = None
    var last: Throwable = null
    while (out.isEmpty && attempt <= retries) {
      try out = Some(body)
      catch { case e: Throwable =>
        last = e
        attempt += 1
        if (attempt <= retries) {
          if (alerts.alertOnRetry)
            try alerts.onRetry(attempt, e) catch { case _: Throwable => () }
          if (delayMs > 0) Thread.sleep(delayMs)
        }
      }
    }
    out.getOrElse {
      if (alerts.alertOnFailure)
        try alerts.onFailure(attempt, last) catch { case _: Throwable => () }
      throw last
    }
  }

  /** Bounded-wait budget per export — the reference's hard per-table cap
    * (`gcloud sql ... operations wait --timeout=3600`,
    * reference dags/cloudsql_to_bigquery.py:117) re-expressed for an
    * in-engine export. The body runs on a daemon thread inside its own
    * Spark job group; if the budget expires, the group's jobs are
    * CANCELLED (a hung source must not keep executors pinned) and a
    * TimeoutException propagates — which the [[retry]] wrapper treats
    * like any transient failure, so cap × (retries + 1) bounds the total
    * wall-clock a sick table can consume before the run fails loudly.
    * `timeoutMs <= 0` disables the budget.
    */
  def withTimeout[T](spark: SparkSession, timeoutMs: Long,
                     what: String = "export")(body: => T): T = {
    if (timeoutMs <= 0) return body
    val group = s"graft-$what-${java.util.UUID.randomUUID()}"
    val task = new java.util.concurrent.FutureTask[T](() => {
      // job group is thread-local — set it on the worker thread so the
      // cancel below reaches exactly this body's Spark jobs
      spark.sparkContext.setJobGroup(group, s"bounded $what", true)
      try body finally spark.sparkContext.clearJobGroup()
    })
    val th = new Thread(task, group)
    th.setDaemon(true)
    th.start()
    try task.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        throw new java.util.concurrent.TimeoutException(
          s"$what exceeded its ${timeoutMs} ms budget (jobs cancelled)")
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    }
  }

  def stagingPath(stagingRoot: String, table: String, ds: String): String =
    s"$stagingRoot/$table/ds=$ds"

  def finalPath(warehouseRoot: String, table: String): String =
    s"$warehouseRoot/$table"

  /** Staging retention: delete a table's `ds=` staging snapshots older
    * than `keep` run-dates (lexicographic ds order IS chronological). A
    * daily sync accumulates one full snapshot per run — the reference
    * relies on bucket lifecycle rules for this; a self-contained
    * pipeline must vacuum its own staging area. Returns the deleted ds
    * keys (newest-first retention, deterministic).
    */
  def vacuumStaging(spark: SparkSession, stagingRoot: String, table: String,
                    keep: Int): Seq[String] = {
    require(keep >= 1, "must keep at least the latest snapshot")
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = new Path(s"$stagingRoot/$table")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val snaps = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ds="))
      .map(_.getPath.getName.stripPrefix("ds="))
      .sorted(Ordering[String].reverse)
    val doomed = snaps.drop(keep)
    doomed.foreach(ds => fs.delete(new Path(s"$stagingRoot/$table/ds=$ds"), true))
    doomed
  }

  /** Sanitize all column names post-export (A6, reference :187). */
  def sanitizeColumns(df: DataFrame): DataFrame = {
    val renames = df.columns.map(c => c -> TypeMapper.sanitizeName(c))
      .filter { case (a, b) => a != b }
    renames.foldLeft(df) { case (acc, (from, to)) => acc.withColumnRenamed(from, to) }
  }

  /** Atomic snapshot publish (the plain-Spark stand-in for
    * `bq load --replace` / WRITE_TRUNCATE, reference :225-227 and
    * dags/copy_cloudsql_to_bigquery_v2.py:108), crash-consistent at EVERY
    * boundary: a kill anywhere mid-publish leaves the previous snapshot
    * readable through [[readPublished]] — the BigQuery-side atomicity the
    * round-8 review flagged as untested in the old delete-then-rename swap
    * (whose kill window LOST the table).
    *
    * Layout under the table root:
    * {{{
    *   <root>/snap-N/           full snapshot N (parquet)
    *   <root>/snap-N/_GRAFT_COMMITTED   marker, written AFTER the write
    *   <root>/_CURRENT          text pointer to the acknowledged N
    * }}}
    *
    * Publish ordering: write snap-(N+1) → write its commit marker → write
    * `_CURRENT.tmp` → delete `_CURRENT` → rename tmp over it → vacuum
    * older snapshots. Readers resolve `_CURRENT` first and fall back to
    * the HIGHEST COMMITTED snapshot when the pointer is mid-swap, so each
    * crash window yields a complete snapshot: before the marker → old N
    * (new dir is uncommitted garbage, vacuumed by the next publish); after
    * the marker but before the swap → old N (publish unacknowledged);
    * between pointer delete and rename → fallback scan finds N+1, already
    * complete. A kill test exercises every boundary (SyncSpec).
    *
    * Concurrent readers: the vacuum RETAINS the immediately-previous
    * snapshot, so a reader that resolved N just before publish N+1 keeps
    * valid files for its lazy frames until a FURTHER publish lands — the
    * one-publish read window. Readers holding frames across two or more
    * publishes must re-resolve (the same contract snapshot-isolated table
    * formats document for expired versions).
    *
    * Scale: the pointer file and markers are O(1) metadata writes; the
    * data write is the same full-snapshot parquet job as before. On object
    * stores without atomic rename the pointer swap degrades to
    * last-writer-wins PUT — still a complete-snapshot flip, the reason the
    * pointer is a tiny file and not a directory rename of the data itself.
    */
  def publishOverwrite(df: DataFrame, path: String): Unit =
    publishStaged(df, path, _ => ())

  /** The retention window persisted in the table root by a publish that
    * set one explicitly (`_RETAIN`). A later plain `publishOverwrite(df,
    * path)` honors it instead of silently truncating a deeper
    * time-travel history back to the default 2 (r10 advice).
    */
  private[graft] def readRetain(fs: FileSystem, root: Path): Option[Int] = {
    val p = new Path(root, RetainFile)
    if (!fs.exists(p)) None
    else try {
      val in = fs.open(p)
      val b = new Array[Byte](16)
      var n = 0
      try {
        var r = in.read(b, n, b.length - n)
        while (r > 0) { n += r; r = in.read(b, n, b.length - n) }
      } finally in.close()
      Some(new String(b, 0, n,
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt)
    } catch { case _: Exception => None }
  }

  /** [[publishOverwrite]] with an explicit retention window: the newest
    * `retain` committed snapshots stay version-addressable after the
    * publish (default 2 = current + immediately-previous, the plain
    * overwrite contract). Larger windows turn the root into a bounded
    * time-travel history ([[readPublishedVersion]], [[snapshotDiff]])
    * at the cost of `retain` full copies on storage — prune on demand
    * with [[vacuumRetain]].
    */
  def publishOverwrite(df: DataFrame, path: String, retain: Int): Unit =
    publishStaged(df, path, _ => (), Some(retain))

  /** On-demand retention enforcement over a published table root: keep
    * the newest `retain` committed snapshots (the current version is
    * always kept, whatever `retain` says) and physically delete every
    * older snapshot directory — the storage-reclaim / compliance lever
    * (`VACUUM` in snapshot-isolated table formats; the GDPR-erasure
    * sibling of [[deleteWhere]]'s `purge`). Returns the number of
    * snapshot directories removed.
    *
    * Concurrency: only snapshot versions AT OR BELOW the current one are
    * candidates — an in-flight publish staging `snap-(cur+1)` is never
    * touched. O(versions) metadata operations, no data read.
    */
  def vacuumRetain(spark: SparkSession, path: String, retain: Int): Long = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    resolveVersion(fs, root) match {
      case None => 0L
      case Some(cur) =>
        val snaps = fs.listStatus(root).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("snap-"))
          .flatMap(n => scala.util.Try(n.stripPrefix("snap-").toLong).toOption)
        val committed = snaps
          .filter(v => fs.exists(new Path(snapPath(root, v), CommitMarker)))
          .sorted
        val keep = committed.takeRight(retain).toSet + cur
        val drop = snaps.filter(v => v <= cur && !keep.contains(v))
        drop.foreach(v => fs.delete(snapPath(root, v), true))
        drop.size.toLong
    }
  }

  private[graft] val CommitMarker = "_GRAFT_COMMITTED"
  private[graft] val RetainFile = "_RETAIN"
  private[graft] val Pointer = "_CURRENT"
  private[graft] val PointerTmp = "_CURRENT.tmp"
  private def snapPath(root: Path, v: Long) = new Path(root, s"snap-$v")

  /** The publish with crash-injection points for the kill spec: `boundary`
    * is invoked with 1..5 between every pair of externally visible steps
    * and may throw to simulate a crash exactly there.
    */
  private[graft] def publishStaged(df: DataFrame, path: String,
                                   boundary: Int => Unit,
                                   retainOpt: Option[Int] = None): Unit = {
    val spark = df.sparkSession
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // effective retention: explicit param > persisted table setting >
    // default 2 — a plain publish on a retain=4 root keeps the history
    val retain = retainOpt.orElse(readRetain(fs, root)).getOrElse(2)
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val next = resolveVersion(fs, root).getOrElse(0L) + 1
    val vdir = snapPath(root, next)
    df.write.mode("overwrite").parquet(vdir.toString)
    boundary(1) // snapshot written, uncommitted
    fs.create(new Path(vdir, CommitMarker), true).close()
    boundary(2) // committed, pointer still on the old snapshot
    val tmp = new Path(root, PointerTmp)
    val out = fs.create(tmp, true)
    out.write(next.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    boundary(3) // pointer staged beside the live one
    val ptr = new Path(root, Pointer)
    if (fs.exists(ptr)) fs.delete(ptr, false)
    boundary(4) // pointer gone: readers fall back to highest committed
    fs.rename(tmp, ptr)
    boundary(5) // acknowledged; stale snapshots not yet vacuumed
    retainOpt.foreach { r => // persist an explicit setting for later plain publishes
      val o = fs.create(new Path(root, RetainFile), true)
      o.write(r.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      o.close()
    }
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      // retain the newest `retain` snapshot versions (default: this one
      // plus the immediately-previous — a reader that resolved N−1 just
      // before this publish still has live lazy frames over it, the
      // documented one-publish read window); everything older — and any
      // uncommitted garbage from crashed writes — goes. Legacy
      // pre-versioning part files at the root are removed too, now that
      // a committed snapshot supersedes them.
      val keptVersion = scala.util.Try(n.stripPrefix("snap-").toLong)
        .toOption.exists(v => v > next - retain && v <= next)
      val keep = (n.startsWith("snap-") && keptVersion) ||
        n == Pointer || n == PointerTmp || n == RetainFile
      if (!keep) fs.delete(st.getPath, true)
    }
  }

  /** Resolve the readable published version: the `_CURRENT` pointer when
    * it names a committed snapshot, else the highest committed snapshot
    * directory (the mid-swap fallback). None = never published.
    */
  private[graft] def resolveVersion(fs: FileSystem, root: Path): Option[Long] = {
    def committed(v: Long) = fs.exists(new Path(snapPath(root, v), CommitMarker))
    val ptr = new Path(root, Pointer)
    val fromPtr =
      if (!fs.exists(ptr)) None
      else try {
        // read to EOF, not a single read(): some Hadoop FileSystems
        // legally return short reads, and a truncated parse would
        // silently degrade to the fallback scan (r10 advice)
        val in = fs.open(ptr)
        val b = new Array[Byte](32)
        var n = 0
        try {
          var r = in.read(b, n, b.length - n)
          while (r > 0) { n += r; r = in.read(b, n, b.length - n) }
        } finally in.close()
        val v = new String(b, 0, n,
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        if (committed(v)) Some(v) else None
      } catch { case _: Exception => None }
    fromPtr.orElse {
      if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("snap-"))
        .flatMap(n => scala.util.Try(n.stripPrefix("snap-").toLong).toOption)
        .filter(committed)
        .sorted.lastOption
    }
  }

  /** Read the currently published snapshot of a table root written by
    * [[publishOverwrite]]; None when no committed snapshot exists.
    *
    * Legacy fallback: a root written by the pre-versioning publisher
    * (plain parquet files, no `snap-*`/`_CURRENT`) reads as the published
    * table, so upgrading the publisher never makes an existing warehouse
    * invisible; the first versioned publish supersedes and removes the
    * legacy files.
    */
  def readPublished(spark: SparkSession, path: String): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    resolveVersion(fs, root)
      .map(v => spark.read.parquet(snapPath(root, v).toString))
      .orElse {
        if (fs.exists(root) && fs.listStatus(root).exists { st =>
            val n = st.getPath.getName
            st.isFile && n.endsWith(".parquet") && !n.startsWith("_")
          })
          Some(spark.read.parquet(root.toString))
        else None
      }
  }

  /** Full sync of one table (the reference's 5-task chain collapsed to one
    * lineage): export query → sanitized stage snapshot keyed by run date →
    * optional stage-final merge SQL → published final table.
    *
    * The `stageFinalQuery` may reference two views: `stage` (this run's
    * snapshot) and `existing` (the current final table, empty-schema'd from
    * stage when the final doesn't exist yet — first run). The `{ds}`
    * placeholder is replaced by the run-date literal (A15).
    *
    * Returns the published final DataFrame (read back from storage, so the
    * caller sees exactly what readers see).
    */
  def syncTable(spark: SparkSession, cfg: TableConfig, source: SqlSource,
                stagingRoot: String, warehouseRoot: String,
                runDate: LocalDate = LocalDate.now(),
                retries: Int = 2, retryDelayMs: Long = 0L,
                exportTimeoutMs: Long = 3600000L,
                alerts: AlertHook = NoAlerts): DataFrame = {
    val ds = runDateLiteral(runDate)
    val stagePathStr = stagingPath(stagingRoot, cfg.resolvedStageTable, ds)
    val finalPathStr = finalPath(warehouseRoot, cfg.resolvedStageTable)

    // 1-2. export (A1/A3) + sanitize (A6) + stage write (A8/A9/A15),
    // each attempt under the per-table budget (reference :117's 3600 s
    // default), timeouts retried like any transient failure (A13)
    retry(retries, retryDelayMs, alerts) {
      withTimeout(spark, exportTimeoutMs, s"export-${cfg.resolvedStageTable}") {
        val exported = sanitizeColumns(source.read(spark, cfg.resolvedExportQuery))
        exported.write.mode("overwrite").parquet(stagePathStr)
      }
    }
    val stage = spark.read.parquet(stagePathStr)

    // 3. stage→final merge (A10) or plain snapshot publish.
    //
    // The contract exposes the views as `stage` and `existing`, but the
    // session is shared: syncAll(maxParallel>1) runs syncTable concurrently,
    // and two merge-mode configs registering a view literally named "stage"
    // would overwrite each other between registration and execution. So the
    // views are registered under per-run unique names and the reserved
    // identifiers `stage`/`existing` (whole-word) are rewritten into them.
    // (`stage`/`existing` are reserved words inside stageFinalQuery — a
    // column of that name would need quoting anyway.)
    val finalDf = cfg.stageFinalQuery match {
      case Some(q) =>
        val runTag = s"${cfg.resolvedStageTable}_$ds".replaceAll("[^A-Za-z0-9_]", "_")
        val stageView = s"g_stage_$runTag"
        val existingView = s"g_existing_$runTag"
        stage.createOrReplaceTempView(stageView)
        val existing = readPublished(spark, finalPathStr).getOrElse(
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stage.schema))
        existing.createOrReplaceTempView(existingView)
        val sql = q.replace("{ds}", ds)
          .replaceAll("\\bstage\\b", stageView)
          .replaceAll("\\bexisting\\b", existingView)
        // spark.sql analyzes eagerly (temp view plans are inlined), so the
        // views can be dropped before the plan executes in step 4.
        val merged = spark.sql(sql)
        spark.catalog.dropTempView(stageView)
        spark.catalog.dropTempView(existingView)
        merged
      case None => stage
    }

    // 4. publish (A9 overwrite semantics)
    retry(retries, retryDelayMs, alerts) { publishOverwrite(finalDf, finalPathStr) }
    readPublished(spark, finalPathStr).get
  }

  /** Read one SPECIFIC committed snapshot version — time travel within
    * the retention window: the vacuum keeps the immediately-previous
    * snapshot alongside the current one, so after publish N both N and
    * N−1 are addressable (the audit/rollback read a `bq` user gets from
    * table snapshots); older versions are vacuumed and return None.
    */
  def readPublishedVersion(spark: SparkSession, path: String,
                           version: Long): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = snapPath(root, version)
    if (fs.exists(new Path(dir, CommitMarker)))
      Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Idempotent per-batch delta merge-publish — the shared core of the
    * streaming→warehouse bridges ([[graft.streaming.EventsStream
    * .incrementalPublish]], [[graft.sources.bus.BusSync]]): merge a
    * per-key DELTA frame (key column + additive numeric columns) into the
    * published snapshot, guarded by the stored `last_batch` watermark so
    * foreachBatch's at-least-once replay never double-merges, and publish
    * atomically. A zero-row published snapshot (an empty first batch)
    * reads as watermark −1, not a null crash — an empty batch 0 must
    * never poison the checkpoint.
    */
  def idempotentDeltaPublish(delta: DataFrame, batchId: Long,
                             finalPath: String, keyCol: String): Unit =
    idempotentDeltaPublish(delta, batchId, finalPath, Seq(keyCol))

  /** Composite-key form: the additive merge joins on ALL `keyCols`
    * (e.g. the streaming tumbling-window publish keys on
    * (user_id, window-start)); every non-key column must be additive.
    */
  def idempotentDeltaPublish(delta: DataFrame, batchId: Long,
                             finalPath: String,
                             keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions._
    val s = delta.sparkSession
    val valueCols = delta.columns.filterNot(keyCols.contains).toSeq
    val existing = readPublished(s, finalPath)
    val lastBatch = existing.map { e =>
      val r = e.agg(max("last_batch")).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
    if (!lastBatch.exists(_ >= batchId)) {
      val merged = existing match {
        case None => delta.withColumn("last_batch", lit(batchId))
        case Some(e) =>
          e.select((keyCols ++ valueCols).map(col): _*).as("e")
            .join(delta.as("d"), keyCols, "full_outer")
            .select(keyCols.map(col) ++
              valueCols.map(c => (coalesce(col(s"e.$c"), lit(0)) +
                coalesce(col(s"d.$c"), lit(0))).as(c)) :+
              lit(batchId).as("last_batch"): _*)
      }
      publishOverwrite(merged, finalPath)
    }
  }

  /** Incremental sync predicate — the reference's advertised improvement
    * path ("use time/id in the sync select", reference README.md:8): wrap
    * the export query with a high-watermark filter so each run pulls only
    * rows past the last-seen watermark. At 100 TB this is the difference
    * between a daily full-table copy and a bounded delta.
    */
  def incrementalQuery(cfg: TableConfig, watermarkCol: String,
                       lastSeen: String): String =
    s"SELECT * FROM (${cfg.resolvedExportQuery}) g_inc WHERE $watermarkCol > $lastSeen"

  /** Current high watermark of a published table (driver-side scalar). */
  def latestWatermark(df: org.apache.spark.sql.DataFrame, watermarkCol: String): Option[String] =
    df.agg(org.apache.spark.sql.functions.max(watermarkCol)).head() match {
      case r if r.isNullAt(0) => None
      case r => Some(r.get(0).toString)
    }

  /** A11/A12 — loop the configs with bounded source parallelism. The
    * reference serializes exports entirely (maxParallel=1,
    * dags/cloudsql_to_bigquery.py:284-287); higher values run tables in a
    * bounded pool, the engine-native form of "only one export at a time".
    */
  def syncAll(spark: SparkSession, cfgs: Seq[TableConfig], source: SqlSource,
              stagingRoot: String, warehouseRoot: String,
              runDate: LocalDate = LocalDate.now(),
              maxParallel: Int = 1): Map[String, Long] = {
    require(maxParallel >= 1)
    if (maxParallel == 1) {
      cfgs.map(c => c.resolvedStageTable ->
        syncTable(spark, c, source, stagingRoot, warehouseRoot, runDate).count()).toMap
    } else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(maxParallel)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = cfgs.map(c => Future(c.resolvedStageTable ->
          syncTable(spark, c, source, stagingRoot, warehouseRoot, runDate).count()))
        Await.result(Future.sequence(fs), Duration.Inf).toMap
      } finally pool.shutdown()
    }
  }

  private[graft] val Manifest = "_MANIFEST"
  private[graft] val ManifestTmp = "_MANIFEST.tmp"

  /** Thrown when a concurrent [[publishAtomicAll]] claimed the next
    * manifest version first. The loser refuses rather than clobbering a
    * version a live reader or [[readAtomicTableAt]] could already have
    * resolved — the optimistic-concurrency contract (Delta/Iceberg
    * commit semantics). The reference never faces this race only
    * because Airflow serializes its tasks
    * (dags/cloudsql_to_bigquery.py:284-287); callers here opt into
    * retry via the `retries` parameter.
    */
  final class ConcurrentPublishException(msg: String)
    extends RuntimeException(msg)

  /** Atomic MULTI-TABLE publish — the all-or-nothing dataset swap the
    * reference's per-table `bq load --replace` loop cannot give (a
    * failure mid-loop leaves tables at mixed versions;
    * dags/cloudsql_to_bigquery.py:225-227 reloads tables one at a
    * time). Layout:
    *
    *   <root>/<table>/snap-N/ + per-snap commit marker   (data)
    *   <root>/_manifests/manifest-N                      (publish history)
    *   <root>/_MANIFEST                                  (the live pointer:
    *                                                      `table=version` lines)
    *
    * Protocol (crash-consistent at every kill point AND safe against a
    * concurrent publisher):
    *
    *  1. stage every table's data under a unique dot-directory — final
    *     `snap-N` names are assigned only by the claim winner, so two
    *     racing publishes can never interleave writes into one
    *     directory;
    *  2. CLAIM the next manifest slot with an atomic create-if-absent
    *     (`manifest-N.claim`): the commit point of the optimistic-
    *     concurrency check. The loser deletes its staging and throws
    *     [[ConcurrentPublishException]] — it never overwrites a version
    *     anyone could have read;
    *  3. the winner renames staging into `snap-N` (N = the claimed
    *     slot, one global counter, so snapshot names are collision-free
    *     by construction) and writes commit markers;
    *  4. the immutable history entry is staged at a tmp name and
    *     RENAMED into place — it is never observable half-written (a
    *     torn `manifest-N` would otherwise parse as a silently
    *     incomplete dataset state for time-travel reads);
    *  5. the live pointer is swapped (stage tmp, delete, rename) to the
    *     NEWEST fully-committed history state — which is >= this
    *     publish's own, so a slow publisher that lost a later race can
    *     never regress the pointer below a state a reader already saw;
    *     a short convergence loop re-installs if two swaps consumed
    *     each other's files mid-flight.
    *
    * Readers resolve all tables through the ONE pointer file: before
    * the swap all tables read old, after it all read new, and in the
    * delete–rename window the newest fully-committed history entry
    * (rename-installed, never half-written) is the fallback — staged
    * pointer tmps are per-publisher scratch and never read, so a
    * concurrent publisher's mid-write bytes can never be parsed as a
    * manifest. Snapshot retention keeps each
    * table's newest `retain` snapshots BY ORDER (not by numeric
    * window — slot numbering is sparse per table when publishes of
    * disjoint table sets interleave).
    *
    * `boundary` is the crash-injection hook (0..4), the
    * [[publishStaged]] convention: 0 = slot computed + data staged,
    * claim NOT yet taken (the optimistic-concurrency race window);
    * 1 = snapshots + history committed, pointer old; 2 = pointer
    * staged; 3 = pointer deleted (tmp fallback window); 4 = new
    * pointer live.
    */
  def publishAtomicAll(tables: Seq[(String, DataFrame)], root: String,
                       boundary: Int => Unit = _ => (),
                       retain: Int = 2,
                       publishedAt: Option[Long] = None,
                       retries: Int = 0): Map[String, Long] = {
    require(tables.nonEmpty)
    require(retain >= 1, "retain must keep at least the live version")
    var attempt = 0
    while (attempt < retries) {
      try return publishAtomicOnce(tables, root, boundary, retain, publishedAt)
      catch { case _: ConcurrentPublishException => attempt += 1 }
    }
    publishAtomicOnce(tables, root, boundary, retain, publishedAt)
  }

  private def publishAtomicOnce(tables: Seq[(String, DataFrame)],
                                root: String, boundary: Int => Unit,
                                retain: Int,
                                publishedAt: Option[Long]): Map[String, Long] = {
    val UTF8 = java.nio.charset.StandardCharsets.UTF_8
    val spark = tables.head._2.sparkSession
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = resolveManifest(fs, rootP)
    val hist = listManifestHistory(fs, rootP)
    val histDir = new Path(rootP, ManifestHistoryDir)
    if (!fs.exists(histDir)) fs.mkdirs(histDir)
    // the slot this publish will claim: one past every history entry
    // AND every outstanding claim, so an in-flight (or crashed-after-
    // claim) publisher's slot is never contested twice and a vacuumed
    // id is never reused for different data
    val slot = (hist.map(_._1) ++ listClaims(fs, rootP))
      .foldLeft(0L)(math.max) + 1
    // snapshot version = the claimed slot (one global counter): two
    // racing publishes hold different slots by construction, so their
    // snap-N directories can never collide — a per-table `old+1`
    // counter would let both compute the same next version and
    // interleave writes into one directory (a lost-update corruption)
    val next = tables.map { case (t, _) =>
      require(!t.contains('=') && !t.contains('/'), s"bad table name $t")
      t -> slot
    }.toMap
    // 1) stage data under dot-dirs (invisible to snapshot listings)
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val staged = tables.map { case (t, df) =>
      val dir = new Path(rootP, s"$t/.stage-$nonce")
      df.write.mode("overwrite").parquet(dir.toString)
      (t, dir)
    }
    boundary(0) // race window: slot computed + data staged, claim not taken
    // 2) claim the slot — the optimistic-concurrency commit point
    if (!atomicClaim(fs, new Path(histDir, s"manifest-$slot$ClaimSuffix"))) {
      staged.foreach { case (_, d) => fs.delete(d, true) }
      throw new ConcurrentPublishException(
        s"manifest slot $slot at $root was claimed by a concurrent " +
          "publish; this publish was refused (no version was lost — " +
          "retry re-reads the advanced state)")
    }
    // 3) staging -> final snap homes + commit markers (any pre-existing
    //    snap-<slot> dir is wreckage of a crash AFTER this same slot's
    //    claim but before its history rename: unreferenced by any
    //    manifest, and un-raceable since the claim is ours)
    staged.foreach { case (t, d) =>
      val fin = new Path(rootP, s"$t/snap-$slot")
      if (fs.exists(fin)) fs.delete(fin, true)
      fs.rename(d, fin)
      fs.create(new Path(fin, CommitMarker), true).close()
    }
    val merged = old ++ next
    def bodyOf(m: Map[String, Long]): Array[Byte] =
      m.toSeq.sorted.map { case (t, v) => s"$t=$v" }.mkString("\n")
        .getBytes(UTF8)
    // 4) history entry — staged then renamed (never half-written). This
    //    is the time-travel record: the full dataset state of each
    //    publish, the Spark spelling of the reference's date-suffixed
    //    history tables (dags/cloudsql_to_bigquery.py:226-227). Markers
    //    precede this rename, so a history entry's presence implies its
    //    snapshots are fully committed.
    locally {
      val ts = publishedAt.getOrElse(System.currentTimeMillis())
      val tmpH = new Path(histDir, s".tmp-$nonce")
      val h = fs.create(tmpH, true)
      h.write((s"$PublishedAtKey=$ts\n" +
        new String(bodyOf(merged), UTF8)).getBytes(UTF8))
      h.close()
      fs.rename(tmpH, new Path(histDir, s"manifest-$slot"))
    }
    boundary(1) // snapshots + history committed; pointer still old
    // 5) pointer swap — to the newest committed history state (>= ours)
    def newestCommitted(): Map[String, Long] =
      listManifestHistory(fs, rootP).reverseIterator.map(_._3).find(m =>
        m.forall { case (t, v) =>
          fs.exists(new Path(rootP, s"$t/snap-$v/$CommitMarker")) })
        .getOrElse(merged)
    // the pointer is staged under a PER-PUBLISHER nonce name: a shared
    // tmp would let racer A's swap consume/truncate racer B's staged
    // bytes mid-write, and a reader falling back to that shared file
    // could parse a torn trailing line as a valid (stale) map. With a
    // nonce name every rename installs a file exactly one publisher
    // wrote in full; the mid-swap reader fallback is the newest
    // fully-committed history entry (see [[resolveManifest]]), which is
    // rename-installed and therefore never observable half-written.
    val tmp = new Path(rootP, s"$ManifestTmp-$nonce")
    val man = new Path(rootP, Manifest)
    def stage(m: Map[String, Long]): Unit = {
      val out = fs.create(tmp, true); out.write(bodyOf(m)); out.close()
    }
    stage(newestCommitted())
    boundary(2) // full manifest staged beside the live one
    if (fs.exists(man)) fs.delete(man, false)
    boundary(3) // pointer gone: readers fall back to committed history
    fs.rename(tmp, man)
    boundary(4) // acknowledged; stale snapshots not yet vacuumed
    // convergence guard: two concurrent swaps can consume each other's
    // pointer file or install out of order; loop until the live
    // pointer covers this publish's versions (each retry re-installs
    // the newest committed state, so racers converge on the max — in
    // the uncontended case the condition holds immediately and the
    // loop never runs)
    var spins = 0
    while (spins < 64 &&
        !next.forall { case (t, v) =>
          resolveManifest(fs, rootP).getOrElse(t, -1L) >= v }) {
      stage(newestCommitted())
      if (fs.exists(man)) fs.delete(man, false)
      fs.rename(tmp, man)
      spins += 1
    }
    if (fs.exists(tmp)) fs.delete(tmp, false) // lost-rename leftover
    if (!next.forall { case (t, v) =>
        resolveManifest(fs, rootP).getOrElse(t, -1L) >= v })
      // the snapshots and history entry ARE committed (time travel can
      // read them), but the live pointer never covered this publish —
      // returning a success map here would advertise liveness the root
      // does not have. 64 re-installs of a monotone max cannot lose to
      // a finite set of racers on a real FS, so this is corruption or
      // an FS without atomic rename — fail loudly, never silently.
      throw new IllegalStateException(
        s"publish at $root: live pointer failed to converge to " +
          s"$next after $spins swap attempts")
    // completion marker: this publish is about to RETURN success — only
    // now may a concurrent publisher's in-publish retention reap this
    // slot's snapshots. Without it, a racer that retried past an
    // already-advanced live pointer sees oldV >= this slot and reaps a
    // snapshot whose publish has not returned yet (caught by the chaos
    // race leg: retried publisher C at slot 4, live 3, reaping slot 2
    // while A was still mid-publish). A crashed publisher never writes
    // its marker, so its wreckage is only ever reaped by the explicit
    // vacuumPublished.
    fs.create(new Path(histDir, s"manifest-$slot$DoneSuffix"), true).close()
    // NOTE: the claim file is NOT deleted here — it is the slot's
    // tombstone. A same-slot loser still holds a reference to slot N;
    // freeing the claim would let its (slower) atomicClaim succeed and
    // silently clobber this publish's snap-N. Claims below the newest
    // retained manifest are reaped by vacuumPublished, where slot
    // arithmetic can never hand them out again.
    // snapshot retention: keep each table's newest `retain` committed
    // snapshots in VERSION ORDER up to this publish (default 2 = live +
    // immediately superseded, for readers mid-swap). Reaping is further
    // bounded to versions AT OR BELOW the live version this publish
    // started from (`old`): a slot NEWER than that can only belong to a
    // concurrent publish still in flight — reaping it would delete a
    // snapshot whose publish has not yet returned (retain=1, racer B at
    // slot 3 reaping racer A's just-committed snap-2), breaking "every
    // success is readable at its own slot". Anything above `old` is
    // left for a LATER publish (whose `old` has advanced past it) or
    // for [[vacuumPublished]]. Staging dot-dirs of in-flight publishes
    // are likewise left alone (vacuumPublished reaps orphans). A
    // time-travel dataset publishes with a larger retain and prunes
    // with vacuumPublished.
    merged.foreach { case (t, v) =>
      val tdir = new Path(rootP, t)
      val oldV = old.getOrElse(t, Long.MinValue)
      if (fs.exists(tdir)) {
        val snaps = fs.listStatus(tdir).toSeq.flatMap { st =>
          val n = st.getPath.getName
          if (!n.startsWith("snap-")) None
          else scala.util.Try(n.stripPrefix("snap-").toLong).toOption
            .map(_ -> st.getPath)
        }.sortBy(_._1)
        val keep = snaps.collect { case (x, _) if x <= v => x }
          .takeRight(retain).toSet
        snaps.foreach { case (x, p) =>
          // three independent safety conditions: superseded before this
          // publish began (x <= oldV), outside the retain window, and
          // its OWN publish has returned (completion marker — a racer
          // below the current live but not yet returned is in flight
          // and must keep its snapshot until it acknowledges success)
          if (x <= oldV && !keep.contains(x) &&
              fs.exists(new Path(histDir, s"manifest-$x$DoneSuffix")))
            fs.delete(p, true)
        }
      }
    }
    next
  }

  private[graft] val ClaimSuffix = ".claim"

  /** Publish-completion marker (`manifest-N.done`): written as the LAST
    * step before [[publishAtomicAll]] returns success. In-publish
    * retention only reaps snapshots whose slot carries one — the
    * guarantee "every success is readable at its own slot at the moment
    * the publish returns" under arbitrary concurrency. Unmarked slots
    * (in-flight or crashed publishers) are left to [[vacuumPublished]].
    */
  private[graft] val DoneSuffix = ".done"

  /** Slot claims (`manifest-N.claim`) — every slot ever claimed at this
    * root (tombstones persist so a same-slot loser can never re-claim a
    * freed slot; [[vacuumPublished]] reaps old ones). Includes claims
    * left by a publisher that crashed between its claim and its history
    * rename — those slots stay permanently skipped (a gap in the
    * history numbering), never reassigned.
    */
  private def listClaims(fs: FileSystem, rootP: Path): Seq[Long] = {
    val histDir = new Path(rootP, ManifestHistoryDir)
    if (!fs.exists(histDir)) Seq.empty
    else fs.listStatus(histDir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("manifest-") && n.endsWith(ClaimSuffix))
        scala.util.Try(
          n.stripPrefix("manifest-").stripSuffix(ClaimSuffix).toLong).toOption
      else None
    }
  }

  /** Atomic create-if-absent — the claim primitive. Hadoop's local-FS
    * `create(overwrite = false)` is check-then-create (a TOCTOU
    * window), so on the local FS this drops to
    * `java.io.File.createNewFile` (O_CREAT|O_EXCL, kernel-atomic);
    * on HDFS-like stores `create(false)` is atomic at the namenode.
    * Returns false when the path already exists — the losing racer.
    */
  private def atomicClaim(fs: FileSystem, p: Path): Boolean = fs match {
    case _: org.apache.hadoop.fs.LocalFileSystem |
         _: org.apache.hadoop.fs.RawLocalFileSystem =>
      val f = new java.io.File(p.toUri.getPath)
      f.getParentFile.mkdirs()
      f.createNewFile()
    case other =>
      try { other.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  private[graft] val ManifestHistoryDir = "_manifests"
  private[graft] val PublishedAtKey = "_published_at"

  /** The publish history, oldest first: (manifest version, published-at
    * epoch millis, table→snapshot map). Unparsable entries are skipped.
    */
  def listPublishHistory(spark: SparkSession,
                         root: String): Seq[(Long, Long, Map[String, Long])] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listManifestHistory(fs, rootP)
  }

  private def listManifestHistory(fs: FileSystem, rootP: Path)
      : Seq[(Long, Long, Map[String, Long])] = {
    val histDir = new Path(rootP, ManifestHistoryDir)
    if (!fs.exists(histDir)) return Seq.empty
    fs.listStatus(histDir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (!name.startsWith("manifest-")) None
      else scala.util.Try {
        val n = name.stripPrefix("manifest-").toLong
        val in = fs.open(st.getPath)
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r > 0) { bytes.write(buf, 0, r); r = in.read(buf) }
        in.close()
        val lines = new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8).split("\n")
        val ts = lines.collectFirst {
          case ln if ln.startsWith(s"$PublishedAtKey=") =>
            ln.stripPrefix(s"$PublishedAtKey=").trim.toLong
        }.getOrElse(0L)
        val tabs = lines.filter(ln =>
          ln.contains('=') && !ln.startsWith(PublishedAtKey)).map { ln =>
          val Array(t, v) = ln.trim.split("=", 2)
          t -> v.toLong
        }.toMap
        (n, ts, tabs)
      }.toOption
    }.sortBy(_._1)
  }

  /** TIME TRAVEL: read one table as of a given manifest version — the
    * dataset state a specific [[publishAtomicAll]] call made live.
    * None when the version never existed, never covered the table, or
    * the snapshot it references was vacuumed (the retention boundary is
    * a read error surfaced honestly, not silently-latest).
    */
  def readAtomicTableAt(spark: SparkSession, root: String, table: String,
                        version: Long): Option[DataFrame] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listManifestHistory(fs, rootP).find(_._1 == version)
      .flatMap(_._3.get(table)).flatMap { v =>
        val dir = new Path(rootP, s"$table/snap-$v")
        if (fs.exists(new Path(dir, CommitMarker)))
          Some(spark.read.parquet(dir.toString))
        else None
      }
  }

  /** TIME TRAVEL by date: read the table as of the NEWEST publish whose
    * `publishedAt` is <= `asOfMillis` — the "what did the warehouse say
    * on date D" audit/backfill read.
    */
  def readAtomicTableAsOf(spark: SparkSession, root: String, table: String,
                          asOfMillis: Long): Option[DataFrame] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listManifestHistory(fs, rootP).filter(_._2 <= asOfMillis)
      .lastOption.flatMap(m => readAtomicTableAt(spark, root, table, m._1))
  }

  /** Bounded retention over the manifest history: keep the newest
    * `keepN` manifests (the LIVE state is always among them — the
    * newest history entry matches the live pointer by construction, so
    * the current version CANNOT be deleted), drop older manifest files,
    * and delete every snapshot directory no kept manifest references.
    * Returns (manifests kept, snapshot dirs deleted).
    */
  def vacuumPublished(spark: SparkSession, root: String,
                      keepN: Int): (Long, Long) = {
    require(keepN >= 1, "vacuum must keep at least the live version")
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hist = listManifestHistory(fs, rootP)
    if (hist.isEmpty) return (0L, 0L)
    val kept = hist.takeRight(keepN)
    val dropped = hist.dropRight(keepN)
    dropped.foreach { case (n, _, _) =>
      fs.delete(new Path(rootP, s"$ManifestHistoryDir/manifest-$n"), false)
    }
    // claim tombstones strictly below the newest kept slot can never be
    // handed out again (slot arithmetic is max+1 over content AND
    // claims), so they are safe to reap; the newest claims stay — a
    // same-slot loser may still hold a reference to them
    val keptMax = kept.map(_._1).max
    listClaims(fs, rootP).filter(_ < keptMax).foreach { n =>
      fs.delete(
        new Path(rootP, s"$ManifestHistoryDir/manifest-$n$ClaimSuffix"),
        false)
      fs.delete(
        new Path(rootP, s"$ManifestHistoryDir/manifest-$n$DoneSuffix"),
        false)
    }
    // referenced = union over kept manifests PLUS the live pointer (the
    // can't-delete-current guard holds even if the history was damaged)
    val live = resolveManifest(fs, rootP)
    val referenced: Set[(String, Long)] =
      (kept.flatMap(_._3.toSeq) ++ live.toSeq).toSet
    var deleted = 0L
    // sweep table names from DROPPED manifests too: a table that
    // appears solely in dropped history would otherwise keep its
    // now-unreachable snapshots forever (and under-report `deleted`)
    val tableNames = (referenced.map(_._1) ++ live.keySet ++
      dropped.flatMap(_._3.keys)).toSeq.distinct
    tableNames.foreach { t =>
      val tdir = new Path(rootP, t)
      if (fs.exists(tdir)) fs.listStatus(tdir).foreach { st =>
        val n = st.getPath.getName
        val vOpt = if (n.startsWith("snap-"))
          scala.util.Try(n.stripPrefix("snap-").toLong).toOption else None
        vOpt.foreach { v =>
          if (!referenced.contains((t, v))) {
            fs.delete(st.getPath, true); deleted += 1
          }
        }
        // orphaned staging of a crashed publish (vacuum is an explicit
        // maintenance op, never run concurrently with a publish — the
        // Delta VACUUM convention)
        if (n.startsWith(".stage-")) fs.delete(st.getPath, true)
      }
    }
    // pointer tmps a crashed publisher never got to rename (same
    // explicit-maintenance contract as the staging dirs above)
    fs.listStatus(rootP).foreach { st =>
      if (st.getPath.getName.startsWith(s"$ManifestTmp-"))
        fs.delete(st.getPath, false)
    }
    (kept.length.toLong, deleted)
  }

  /** Resolve the live manifest: `_MANIFEST` when present and parsable,
    * else the NEWEST fully-committed history entry (the mid-swap
    * window: the pointer is momentarily deleted between stage and
    * rename, but the history entry — rename-installed, so never
    * half-written — already records a state >= the one being swapped
    * in), else empty (never published). A staged pointer tmp is NEVER
    * read: tmps are per-publisher in-flight scratch whose bytes may
    * still be mid-write.
    */
  private[graft] def resolveManifest(fs: FileSystem,
                                     root: Path): Map[String, Long] = {
    def parse(p: Path): Option[Map[String, Long]] =
      if (!fs.exists(p)) None
      else scala.util.Try {
        val in = fs.open(p)
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        in.close()
        new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").filter(_.contains('=')).map { ln =>
            val Array(t, v) = ln.trim.split("=", 2)
            t -> v.toLong
          }.toMap
      }.toOption.filter(_.nonEmpty)
    def newestCommittedHistory(): Option[Map[String, Long]] =
      scala.util.Try {
        listManifestHistory(fs, root).reverseIterator.map(_._3).find(m =>
          m.nonEmpty && m.forall { case (t, v) =>
            fs.exists(new Path(root, s"$t/snap-$v/$CommitMarker")) })
      }.toOption.flatten
    parse(new Path(root, Manifest))
      .orElse(newestCommittedHistory())
      .getOrElse(Map.empty)
  }

  /** Read one table of an atomically-published dataset at the manifest
    * version; None if the dataset or table was never published.
    */
  def readAtomicTable(spark: SparkSession, root: String,
                      table: String): Option[DataFrame] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    resolveManifest(fs, rootP).get(table).flatMap { v =>
      val dir = new Path(rootP, s"$table/snap-$v")
      if (fs.exists(new Path(dir, CommitMarker)))
        Some(spark.read.parquet(dir.toString))
      else None
    }
  }

  /** Targeted delete with an optional PURGE of history — the
    * right-to-be-forgotten leg the reference's WRITE_TRUNCATE reload
    * cannot express row-wise: read the published snapshot, drop rows
    * matching `condition`, publish the survivor set.
    *
    * `purge = false` is a plain versioned publish: the deletion is live
    * but the previous snapshot (retention window) STILL CONTAINS the
    * deleted rows — the audit/rollback trade-off, stated rather than
    * hidden. `purge = true` then removes every other snapshot directory
    * under the root (the vacuum with retention zero), so after return
    * no committed file on storage holds a deleted row — the actual
    * GDPR erasure contract. Returns the number of rows deleted.
    *
    * Scale: one scan + filter + write of the survivor set — the same
    * cost class as the reference's full reload, no read-modify-write of
    * individual files; at a real deployment the filter pushes to the
    * parquet scan and partition pruning skips untouched partitions.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  condition: org.apache.spark.sql.Column,
                  purge: Boolean = false): Long = {
    val cur = readPublished(spark, path).getOrElse(
      return 0L)
    import org.apache.spark.sql.functions.{coalesce, lit}
    // null-valued predicates keep the row (DELETE WHERE semantics)
    val kept = cur.filter(!coalesce(condition, lit(false)))
    val deleted = cur.count() - kept.count()
    publishOverwrite(kept, path)
    if (purge) {
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val live = resolveVersion(fs, root)
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val keep = live.exists(v => n == s"snap-$v") ||
          n == Pointer || n == PointerTmp
        if (!keep) fs.delete(st.getPath, true)
      }
    }
    deleted
  }

  /** Snapshot-to-snapshot change feed — CDC derived AFTER the fact from
    * two published versions (the audit a warehouse user runs between
    * `bq` table snapshots when the source emitted no change log): keyed
    * full-outer join, rows classified I(nsert)/D(elete)/U(pdate), with
    * unchanged rows dropped. Old and new non-key values ride along as
    * `old_`/`new_` columns.
    *
    * Scale: one shuffle join on the key set — both sides hash-partition,
    * AQE broadcasts a small old snapshot; the unchanged-row filter
    * happens pre-output so the feed is |changes|-sized, not
    * |table|-sized. Null-safe equality (`<=>`) keeps genuinely-null
    * values from classifying as perpetual updates.
    */
  def snapshotDiff(prev: DataFrame, cur: DataFrame,
                   keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val valueCols = cur.columns.filterNot(keys.contains).toSeq
    require(prev.columns.sorted.sameElements(cur.columns.sorted),
      "snapshotDiff: schemas must match")
    val p = prev.select(keys.map(col) ++
      valueCols.map(c => col(c).as(s"old_$c")) :+ lit(1).as("_in_old"): _*)
    val c = cur.select(keys.map(col) ++
      valueCols.map(c0 => col(c0).as(s"new_$c0")) :+ lit(1).as("_in_new"): _*)
    val j = p.join(c, keys, "full_outer")
    val changed = valueCols
      .map(v => !(col(s"old_$v") <=> col(s"new_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    j.withColumn("change",
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("change").isNotNull)
      .drop("_in_old", "_in_new")
  }
}
