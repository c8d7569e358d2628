package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SyncSpec extends SparkTestBase {

  test("TableConfig defaulting rules (reference :66,:69,:72)") {
    val c = TableConfig(exportTable = "DimAge")
    assert(c.resolvedExportQuery == "SELECT * from DimAge")
    assert(c.resolvedStageTable == "DimAge")
    assert(c.resolvedLocation == "EU")
    val c2 = TableConfig(exportTable = "t", exportQuery = Some("SELECT 1"),
      stageTable = Some("s"), location = Some("US"))
    assert(c2.resolvedExportQuery == "SELECT 1")
    assert(c2.resolvedStageTable == "s")
    assert(c2.resolvedLocation == "US")
  }

  test("run-date literal is ds_nodash (yyyyMMdd)") {
    assert(Sync.runDateLiteral(LocalDate.of(2020, 3, 7)) == "20200307")
  }

  test("publish is crash-consistent: a kill at EVERY boundary leaves a " +
      "complete snapshot readable, and the next publish recovers") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_atomic").toString + "/t"
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val v2 = Seq((1L, "a2"), (3L, "c")).toDF("k", "s")
    Sync.publishOverwrite(v1, root)
    val snap1 = Sync.readPublished(spark, root).get.orderBy("k").collect().toSeq
    assert(snap1.map(_.getLong(0)) == Seq(1L, 2L))

    final class Kill extends RuntimeException("simulated crash")
    // at boundaries 1-3 the OLD snapshot must remain the readable one
    // (the new one is unacknowledged); at 4-5 the NEW snapshot is fully
    // committed and the fallback/pointer must already serve it. Either
    // way a COMPLETE snapshot — never a half-written or missing table.
    (1 to 5).foreach { killAt =>
      val dir = Files.createTempDirectory(s"graft_atomic_$killAt").toString + "/t"
      Sync.publishOverwrite(v1, dir)
      intercept[Kill] {
        Sync.publishStaged(v2, dir, b => if (b == killAt) throw new Kill)
      }
      val visible = Sync.readPublished(spark, dir)
        .getOrElse(fail(s"kill@$killAt: table vanished"))
        .orderBy("k").collect().toSeq
      val keys = visible.map(_.getLong(0))
      if (killAt <= 3)
        assert(keys == Seq(1L, 2L), s"kill@$killAt must still serve v1")
      else
        assert(keys == Seq(1L, 3L), s"kill@$killAt must serve committed v2")
      // recovery: a fresh publish supersedes whatever the crash left
      Sync.publishOverwrite(v2, dir)
      assert(Sync.readPublished(spark, dir).get.orderBy("k")
        .collect().toSeq.map(_.getLong(0)) == Seq(1L, 3L),
        s"kill@$killAt: post-crash publish must converge on v2")
    }
  }

  test("vacuum retains the immediately-previous snapshot: a reader that " +
      "resolved before the publish keeps valid files (one-publish window)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_retain").toString + "/t"
    Sync.publishOverwrite(Seq((1L, "a")).toDF("k", "s"), root)
    val reader = Sync.readPublished(spark, root).get // resolves snap-1 lazily
    Sync.publishOverwrite(Seq((2L, "b")).toDF("k", "s"), root)
    // snap-1 must still be readable for the pre-publish reader…
    assert(reader.collect().map(_.getLong(0)).toSeq == Seq(1L),
      "previous snapshot must survive one publish for live readers")
    // …and one FURTHER publish expires it (the documented window)
    Sync.publishOverwrite(Seq((3L, "c")).toDF("k", "s"), root)
    val dirs = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(!dirs.contains("snap-1") && dirs.contains("snap-2") &&
      dirs.contains("snap-3"), s"retention window wrong: $dirs")
    assert(Sync.readPublished(spark, root).get
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("legacy pre-versioning layout: plain parquet at the root reads as " +
      "published; the first versioned publish supersedes and removes it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_legacy").toString + "/t"
    // the old publisher's layout: bare parquet files at the table root
    Seq((7L, "old")).toDF("k", "s").write.parquet(root)
    assert(Sync.readPublished(spark, root).get
      .collect().map(_.getLong(0)).toSeq == Seq(7L),
      "a pre-upgrade warehouse must stay visible")
    // an incremental-style publish must SEE the legacy table as existing
    val merged = Sync.readPublished(spark, root).get
      .unionByName(Seq((8L, "new")).toDF("k", "s"))
    Sync.publishOverwrite(merged, root)
    val got = Sync.readPublished(spark, root).get
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(7L, 8L), "history must survive the layout upgrade")
    // after a further publish the legacy part files are vacuumed
    Sync.publishOverwrite(Seq((9L, "x")).toDF("k", "s"), root)
    val files = new java.io.File(root).listFiles().map(_.getName)
    assert(!files.exists(f => f.endsWith(".parquet") &&
      new java.io.File(root, f).isFile), s"legacy files must vacuum: ${files.toSeq}")
  }

  test("readPublishedVersion: the previous snapshot stays addressable " +
      "(one-publish time travel), older versions return None") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_tt").toString + "/t"
    Sync.publishOverwrite(Seq((1L, "a")).toDF("k", "s"), root)
    Sync.publishOverwrite(Seq((2L, "b")).toDF("k", "s"), root)
    assert(Sync.readPublishedVersion(spark, root, 2).get
      .head().getLong(0) == 2L)
    assert(Sync.readPublishedVersion(spark, root, 1).get
      .head().getLong(0) == 1L, "previous version must be addressable")
    assert(Sync.readPublishedVersion(spark, root, 3).isEmpty)
    Sync.publishOverwrite(Seq((3L, "c")).toDF("k", "s"), root)
    assert(Sync.readPublishedVersion(spark, root, 1).isEmpty,
      "vacuumed versions must return None, not half-read")
    assert(Sync.readPublishedVersion(spark, root, 2).get
      .head().getLong(0) == 2L)
  }

  test("readPublished ignores uncommitted snapshot directories (no marker " +
      "= garbage from a crashed write)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_uncommitted").toString + "/t"
    Sync.publishOverwrite(Seq((1L, "a")).toDF("k", "s"), root)
    // fake a crashed larger-version write: data present, no commit marker
    Seq((9L, "junk")).toDF("k", "s")
      .write.mode("overwrite").parquet(s"$root/snap-99")
    val got = Sync.readPublished(spark, root).get.collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L),
      "an unmarked snapshot dir must never become visible")
  }

  test("retry succeeds after transient failures, gives up past budget") {
    var calls = 0
    val out = Sync.retry(retries = 2, delayMs = 0) {
      calls += 1
      if (calls < 3) sys.error("transient") else "ok"
    }
    assert(out == "ok" && calls == 3)
    var calls2 = 0
    intercept[RuntimeException] {
      Sync.retry(retries = 2, delayMs = 0) { calls2 += 1; sys.error("always") }
    }
    assert(calls2 == 3) // initial + 2 retries, like the reference
  }

  test("alert hook mirrors the reference's email toggles: fires per retry " +
      "and once on exhaustion when enabled, stays silent when off, and an " +
      "alerting outage never breaks the retry itself") {
    // enabled: 2 retry alerts + 1 failure alert, with attempt numbers
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val hook = new Sync.AlertHook {
      override def alertOnRetry = true
      override def alertOnFailure = true
      override def onRetry(attempt: Int, e: Throwable): Unit =
        seen += s"retry$attempt:${e.getMessage}"
      override def onFailure(attempts: Int, e: Throwable): Unit =
        seen += s"fail$attempts:${e.getMessage}"
    }
    intercept[RuntimeException] {
      Sync.retry(retries = 2, delayMs = 0, alerts = hook) { sys.error("boom") }
    }
    assert(seen.toSeq == Seq("retry1:boom", "retry2:boom", "fail3:boom"))
    // success path: a retry alert fires, the failure alert never does
    seen.clear()
    var calls = 0
    Sync.retry(retries = 2, delayMs = 0, alerts = hook) {
      calls += 1; if (calls < 2) sys.error("flaky") else "ok"
    }
    assert(seen.toSeq == Seq("retry1:flaky"))
    // default NoAlerts (the reference's shipped config): silent
    intercept[RuntimeException] {
      Sync.retry(retries = 1, delayMs = 0) { sys.error("quiet") }
    }
    // a throwing hook is swallowed — the body's outcome is unchanged
    val bad = new Sync.AlertHook {
      override def alertOnRetry = true
      override def onRetry(attempt: Int, e: Throwable): Unit =
        sys.error("alerting outage")
    }
    var calls2 = 0
    val out = Sync.retry(retries = 2, delayMs = 0, alerts = bad) {
      calls2 += 1; if (calls2 < 2) sys.error("flaky") else "ok"
    }
    assert(out == "ok")
  }

  test("snapshot sync publishes the export; re-run overwrites") {
    val staging = Files.createTempDirectory("sync_stg").toString
    val warehouse = Files.createTempDirectory("sync_wh").toString
    val src = ViewSource(sfDir)
    val cfg = TableConfig(exportTable = "nation",
      exportQuery = Some("SELECT * FROM nation WHERE n_regionkey < 2"))
    val out1 = Sync.syncTable(spark, cfg, src, staging, warehouse,
      LocalDate.of(2020, 1, 1))
    assert(out1.count() == 10)
    val out2 = Sync.syncTable(spark, cfg.copy(exportQuery = None), src,
      staging, warehouse, LocalDate.of(2020, 1, 2))
    assert(out2.count() == 25, "second run replaces the snapshot")
    // both runs' staging snapshots exist, date-keyed (A15)
    assert(new java.io.File(s"$staging/nation/ds=20200101").exists())
    assert(new java.io.File(s"$staging/nation/ds=20200102").exists())
  }

  test("merge sync: stage_final_query joins stage with existing") {
    val staging = Files.createTempDirectory("sync_stg2").toString
    val warehouse = Files.createTempDirectory("sync_wh2").toString
    val src = ViewSource(sfDir)
    val base = TableConfig(exportTable = "orders",
      exportQuery = Some("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0"))
    Sync.syncTable(spark, base, src, staging, warehouse, LocalDate.of(2020, 1, 1))
    val merged = Sync.syncTable(spark, base.copy(
      exportQuery = Some("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0"),
      stageFinalQuery = Some(
        """SELECT COALESCE(s.o_orderkey, e.o_orderkey) AS o_orderkey,
          |       COALESCE(s.o_orderstatus, e.o_orderstatus) AS o_orderstatus
          |FROM existing e FULL OUTER JOIN stage s ON e.o_orderkey = s.o_orderkey""".stripMargin)),
      src, staging, warehouse, LocalDate.of(2020, 1, 2))
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val expected = orders
      .filter(col("o_orderkey") % 2 === 0 || col("o_orderkey") % 3 === 0).count()
    assert(merged.count() == expected)
  }

  test("column names are sanitized on export (A6)") {
    val staging = Files.createTempDirectory("sync_stg3").toString
    val warehouse = Files.createTempDirectory("sync_wh3").toString
    val src = ViewSource(sfDir)
    val cfg = TableConfig(exportTable = "region",
      exportQuery = Some("SELECT r_regionkey AS `region key`, r_name AS `either/or` FROM region"))
    val out = Sync.syncTable(spark, cfg, src, staging, warehouse,
      LocalDate.of(2020, 1, 1))
    assert(out.columns.toSeq == Seq("region_key", "either_and_or"))
  }

  test("daily schedule helper (A14): next fire + data interval") {
    import java.time.{LocalDate, LocalDateTime}
    import graft.pipeline.Schedule
    val before = LocalDateTime.of(2020, 3, 7, 5, 30)
    val after = LocalDateTime.of(2020, 3, 7, 6, 30)
    assert(Schedule.nextDaily(6, before) == LocalDateTime.of(2020, 3, 7, 6, 0))
    assert(Schedule.nextDaily(6, after) == LocalDateTime.of(2020, 3, 8, 6, 0))
    assert(Schedule.dataDateFor(LocalDateTime.of(2020, 3, 8, 6, 0)) ==
      LocalDate.of(2020, 3, 7))
  }

  test("incremental sync pulls only rows past the high watermark") {
    val src = ViewSource(sfDir)
    val cfg = TableConfig(exportTable = "orders")
    val full = src.read(spark, cfg.resolvedExportQuery)
    val wm = Sync.latestWatermark(full.filter(col("o_orderkey") <= 750), "o_orderdate").get
    val inc = src.read(spark,
      Sync.incrementalQuery(cfg, "o_orderdate", s"TIMESTAMP '$wm'"))
    val expected = full.filter(col("o_orderdate") > lit(wm).cast("timestamp")).count()
    assert(inc.count() == expected)
    assert(inc.count() < full.count(), "delta must be a strict subset")
  }

  test("qualified table names: 3-part parsing + Derby schema round-trip") {
    // the reference's database.dbo.thetable form (dags/mssql_to_bigquery.py:2):
    // full name in the export SQL, base name for staging artifacts
    val q = TableConfig(exportTable = "database.dbo.thetable")
    assert(q.nameParts == Seq("database", "dbo", "thetable"))
    assert(q.tableBaseName == "thetable")
    assert(q.resolvedStageTable == "thetable", "stage under split('.')[-1]")
    assert(q.resolvedDatabase == "database")
    assert(q.resolvedExportQuery == "SELECT * from database.dbo.thetable")
    val plain = TableConfig(exportTable = "orders")
    assert(plain.resolvedStageTable == "orders")
    assert(plain.resolvedDatabase == "db")
    assert(TableConfig(exportTable = "dbo.t", database = "given")
      .resolvedDatabase == "given", "explicit database wins")

    // and a schema-qualified name drives the sync end-to-end through a
    // real Derby schema (Derby auto-creates it on qualified CREATE TABLE)
    val url = "jdbc:derby:memory:graftqual;create=true"
    graft.sources.JdbcSource.write(
      graft.Tables.load(spark, sfDir, "region"), url, "GRAFTS.region_q")
    val staging = Files.createTempDirectory("sync_stg6").toString
    val warehouse = Files.createTempDirectory("sync_wh6").toString
    val out = Sync.syncTable(spark, TableConfig(exportTable = "GRAFTS.region_q"),
      JdbcSqlSource(url), staging, warehouse, LocalDate.of(2020, 1, 1))
    assert(out.count() == 5)
    assert(new java.io.File(s"$staging/region_q/ds=20200101").exists(),
      "staging artifacts keyed by the base name")
  }

  test("incremental two-run sync: delta-only export, snapshot+delta ≡ full") {
    val staging = Files.createTempDirectory("sync_stg5").toString
    val warehouse = Files.createTempDirectory("sync_wh5").toString
    val src = ViewSource(sfDir)
    val base = TableConfig(exportTable = "orders", stageTable = Some("o_inc"),
      exportQuery = Some("SELECT o_orderkey FROM orders"))
    val run1 = base.copy(exportQuery =
      Some("SELECT o_orderkey FROM orders WHERE o_orderkey <= 750"))
    val pub1 = Sync.syncTable(spark, run1, src, staging, warehouse,
      LocalDate.of(2020, 1, 1))
    val wm = Sync.latestWatermark(pub1, "o_orderkey").get
    val run2 = base.copy(
      exportQuery = Some(Sync.incrementalQuery(base, "o_orderkey", wm)),
      stageFinalQuery = Some(
        "SELECT o_orderkey FROM existing UNION ALL SELECT o_orderkey FROM stage"))
    val pub2 = Sync.syncTable(spark, run2, src, staging, warehouse,
      LocalDate.of(2020, 1, 2))
    val orders = graft.Tables.load(spark, sfDir, "orders")
    // run 2's staging snapshot holds ONLY the delta — the bounded export
    // is the entire point of the watermark path
    val stage2 = spark.read.parquet(s"$staging/o_inc/ds=20200102")
    assert(stage2.count() ==
      orders.filter(col("o_orderkey") > wm.toLong).count())
    assert(stage2.count() < orders.count(), "delta must be a strict subset")
    // and the published final equals one full export
    assert(pub2.count() == orders.count())
  }

  test("syncAll runs every config (sequential and bounded-parallel)") {
    val staging = Files.createTempDirectory("sync_stg4").toString
    val warehouse = Files.createTempDirectory("sync_wh4").toString
    val src = ViewSource(sfDir)
    val cfgs = Seq(TableConfig("region"), TableConfig("nation"),
      TableConfig(exportTable = "customer", isFact = true))
    val counts = Sync.syncAll(spark, cfgs, src, staging, warehouse,
      LocalDate.of(2020, 1, 1))
    assert(counts == Map("region" -> 5L, "nation" -> 25L, "customer" -> 150L))
    val counts2 = Sync.syncAll(spark, cfgs, src, staging, warehouse,
      LocalDate.of(2020, 1, 2), maxParallel = 3)
    assert(counts2 == counts)
  }

  test("staging vacuum keeps the newest N snapshots, deletes the rest") {
    val staging = Files.createTempDirectory("vacuum_stg").toString
    val warehouse = Files.createTempDirectory("vacuum_wh").toString
    val src = ViewSource(sfDir)
    val cfg = TableConfig("region")
    for (d <- 1 to 4)
      Sync.syncTable(spark, cfg, src, staging, warehouse, LocalDate.of(2020, 1, d))
    def snaps(): Set[String] =
      new java.io.File(s"$staging/region").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
    assert(snaps() == Set("ds=20200101", "ds=20200102", "ds=20200103", "ds=20200104"))
    val deleted = Sync.vacuumStaging(spark, staging, "region", keep = 2)
    assert(deleted == Seq("20200102", "20200101"), "oldest first... newest kept")
    assert(snaps() == Set("ds=20200103", "ds=20200104"))
    // idempotent: nothing more to delete
    assert(Sync.vacuumStaging(spark, staging, "region", keep = 2).isEmpty)
    // the published final table is untouched
    assert(Sync.readPublished(spark, s"$warehouse/region").get.count() == 5)
  }

  test("a hung export times out within its budget, is retried, and the " +
      "retry's result is published") {
    // the reference's hard per-export cap (3600 s) in miniature: attempt 1
    // hangs far past the 1500 ms budget; the timeout must fire, count as a
    // transient failure (A13), and attempt 2 must deliver
    var calls = 0
    val hangingOnce = new SqlSource {
      def read(sess: org.apache.spark.sql.SparkSession, q: String)
          : org.apache.spark.sql.DataFrame = {
        calls += 1
        if (calls == 1) Thread.sleep(120000L) // hung source, first attempt
        ViewSource(sfDir).read(sess, q)
      }
    }
    val staging = Files.createTempDirectory("to_stg").toString
    val warehouse = Files.createTempDirectory("to_wh").toString
    val t0 = System.nanoTime()
    val out = Sync.syncTable(spark, TableConfig("region"), hangingOnce,
      staging, warehouse, LocalDate.of(2020, 1, 1),
      retries = 1, retryDelayMs = 0L, exportTimeoutMs = 1500L)
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(calls == 2, "the timed-out attempt must be retried")
    assert(out.count() == 5, "the retry's snapshot must publish")
    assert(elapsedSec < 60.0,
      s"the hung attempt must be abandoned at its budget (took $elapsedSec s)")
  }

  test("an export that exceeds every retry's budget fails with a timeout") {
    val alwaysHung = new SqlSource {
      def read(sess: org.apache.spark.sql.SparkSession, q: String)
          : org.apache.spark.sql.DataFrame = {
        Thread.sleep(120000L); ViewSource(sfDir).read(sess, q)
      }
    }
    val staging = Files.createTempDirectory("to2_stg").toString
    val warehouse = Files.createTempDirectory("to2_wh").toString
    intercept[java.util.concurrent.TimeoutException] {
      Sync.syncTable(spark, TableConfig("region"), alwaysHung,
        staging, warehouse, LocalDate.of(2020, 1, 1),
        retries = 1, retryDelayMs = 0L, exportTimeoutMs = 300L)
    }
  }

  test("compaction shrinks the file count without changing content (A24)") {
    val base = Files.createTempDirectory("compact_spec").toString
    val df = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    df.repartition(50).write.mode("overwrite").parquet(s"$base/frag")
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts(s"$base/frag") == 50)
    spark.read.parquet(s"$base/frag").repartition(2)
      .write.mode("overwrite").parquet(s"$base/compact")
    assert(parts(s"$base/compact") == 2, "50 part files must become 2")
    val before = df.orderBy("o_orderkey").collect().map(_.toSeq)
    val after = spark.read.parquet(s"$base/compact")
      .orderBy("o_orderkey").collect().map(_.toSeq)
    assert(before.toSeq == after.toSeq, "compaction must be content-lossless")
  }

  test("snapshotDiff classifies I/D/U, drops unchanged rows, and is " +
      "null-safe on values") {
    import spark.implicits._
    val prev = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("k", "v")
    val cur = Seq((2L, Some("B")), (3L, None), (4L, Some("d")),
      (5L, None)).toDF("k", "v")
    val got = Sync.snapshotDiff(prev, cur, Seq("k"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(3),
        Option(r.getString(1)), Option(r.getString(2))))
    // k=3 (null==null) and k=4 (d==d) are unchanged and must not appear
    assert(got.toSeq == Seq(
      (1L, "D", Some("a"), None),
      (2L, "U", Some("b"), Some("B")),
      (5L, "I", None, None)))
  }

  test("snapshotDiff over the published retention window (a39 shape): " +
      "versions N-1 and N read back and diff from storage") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sd").toString + "/t"
    Sync.publishOverwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "p"), root)
    Sync.publishOverwrite(Seq((2L, 25.0), (3L, 30.0)).toDF("k", "p"), root)
    val prev = Sync.readPublishedVersion(spark, root, 1).get
    val cur = Sync.readPublishedVersion(spark, root, 2).get
    val got = Sync.snapshotDiff(prev, cur, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "D"), (2L, "U"), (3L, "I")))
    // beyond the window: version 0 never existed, vacuumed versions gone
    assert(Sync.readPublishedVersion(spark, root, 0).isEmpty)
  }

  test("retention window + vacuumRetain: history accumulates to `retain`, " +
      "vacuum physically deletes beyond it, current always survives") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_vr").toString + "/t"
    def snapDirs = Option(new java.io.File(root).listFiles())
      .map(_.map(_.getName).filter(_.startsWith("snap-")).sorted.toSeq)
      .getOrElse(Seq.empty)
    // vacuum of a never-published root is a no-op
    assert(Sync.vacuumRetain(spark, root, 1) == 0L)
    (1 to 4).foreach { v =>
      Sync.publishOverwrite(Seq((v.toLong, v * 10.0)).toDF("k", "p"),
        root, retain = 4)
    }
    assert(snapDirs == Seq("snap-1", "snap-2", "snap-3", "snap-4"))
    (1 to 4).foreach(v =>
      assert(Sync.readPublishedVersion(spark, root, v).isDefined, s"v$v"))
    // retain larger than history: no-op
    assert(Sync.vacuumRetain(spark, root, 9) == 0L)
    // prune to the newest 2: snap-1/snap-2 physically gone
    assert(Sync.vacuumRetain(spark, root, 2) == 2L)
    assert(snapDirs == Seq("snap-3", "snap-4"))
    assert(Sync.readPublishedVersion(spark, root, 1).isEmpty)
    assert(Sync.readPublishedVersion(spark, root, 2).isEmpty)
    // current read unaffected, serving version 4's content
    val cur = Sync.readPublished(spark, root).get.collect()
    assert(cur.map(_.getLong(0)).toSeq == Seq(4L))
    // idempotent; retain=1 keeps only the current even so
    assert(Sync.vacuumRetain(spark, root, 2) == 0L)
    assert(Sync.vacuumRetain(spark, root, 1) == 1L)
    assert(snapDirs == Seq("snap-4"))
    assert(Sync.readPublished(spark, root).get.count() == 1L)
    // an in-flight (uncommitted, above-current) stage dir is never touched
    val staged = new java.io.File(root, "snap-5")
    staged.mkdirs()
    assert(Sync.vacuumRetain(spark, root, 1) == 0L)
    assert(snapDirs == Seq("snap-4", "snap-5"))
  }

  test("late-arriving dims (a43 shape): parked facts retry from storage " +
      "after the late batch merges; never-arriving keys stay pending") {
    val got = graft.operators.PipelineQueries
      .a43LateArriving(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").cast("long"),
        round(col("o_totalprice"), 2)).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def stage(p: Long => Boolean) = {
      val xs = orders.filter(o => p(o._1))
      (xs.length.toLong,
        BigDecimal(xs.map(_._2).sum).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got("enriched_pass_1")._1 == stage(_ % 3 != 0)._1)
    assert(got("enriched_pass_2")._1 == stage(k => k % 3 == 0 && k % 9 != 0)._1)
    assert(got("pending")._1 == stage(_ % 9 == 0)._1)
    // totals within float-fold slack of the brute recomputation
    Seq("enriched_pass_1" -> stage(_ % 3 != 0),
      "enriched_pass_2" -> stage(k => k % 3 == 0 && k % 9 != 0),
      "pending" -> stage(_ % 9 == 0)).foreach { case (k, (_, tot)) =>
      assert(math.abs(got(k)._2 - tot) < 0.02, s"$k total")
    }
    // conservation: every fact lands in exactly one stage
    assert(got.values.map(_._1).sum == orders.length.toLong)
  }

  test("write-audit-publish (a44 shape): a failing audit refuses the " +
      "pointer flip and the previous snapshot keeps serving") {
    val got = graft.operators.PipelineQueries
      .a44WriteAuditPublish(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // batch 1 publishes with all rules green
    Seq("dup_keys", "null_keys", "range_violations").foreach { rule =>
      assert(got((1L, rule)) == ((0L, true)), s"batch1 $rule")
      assert(!got((2L, rule))._2, s"batch2 must be refused ($rule)")
    }
    // batch 2's duplicate injection is what trips the breaker
    assert(got((2L, "dup_keys"))._1 > 0L)
    // the surviving table is batch 1, row for row
    val n = graft.Tables.load(spark, sfDir, "customer").count()
    assert(got((9L, "published_rows")) == ((n, true)))
  }

  test("deleteWhere: purge erases deleted rows from EVERY file on " +
      "storage; without purge the retention snapshot still holds them") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def snapDirs(root: String) =
      new java.io.File(root).listFiles().map(_.getName)
        .filter(_.startsWith("snap-")).toSeq
    // non-purge: deletion live, history retains (the stated trade-off)
    val r1 = Files.createTempDirectory("graft_del1").toString + "/t"
    Sync.publishOverwrite(Seq((1L, "keep"), (2L, "secret")).toDF("k", "v"), r1)
    assert(Sync.deleteWhere(spark, r1, col("v") === "secret") == 1L)
    assert(Sync.readPublished(spark, r1).get.collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    val retained = spark.read.parquet(s"$r1/snap-1")
    assert(retained.filter(col("v") === "secret").count() == 1,
      "retention window must still hold the row pre-purge")
    // purge: only the live snapshot survives, nothing on disk matches
    val r2 = Files.createTempDirectory("graft_del2").toString + "/t"
    Sync.publishOverwrite(
      (1L to 10L).map(i => (i, if (i % 3 == 0) "secret" else "ok"))
        .toDF("k", "v"), r2)
    Sync.publishOverwrite(
      (1L to 12L).map(i => (i, if (i % 3 == 0) "secret" else "ok"))
        .toDF("k", "v"), r2)
    assert(Sync.deleteWhere(spark, r2, col("v") === "secret",
      purge = true) == 4L)
    assert(snapDirs(r2).size == 1, "purge keeps exactly the live snapshot")
    val all = spark.read.parquet(s"$r2/snap-*")
    assert(all.filter(col("v") === "secret").count() == 0,
      "no file on storage may hold an erased row")
    assert(all.count() == 8)
    // null predicate values keep their rows; empty root deletes nothing
    assert(Sync.deleteWhere(spark, r2,
      org.apache.spark.sql.functions.lit(null).cast("boolean")) == 0L)
    assert(Sync.deleteWhere(spark,
      Files.createTempDirectory("graft_del3").toString + "/t",
      col("v") === "x") == 0L)
  }

  test("atomic multi-table publish: a kill at EVERY boundary leaves a " +
      "CONSISTENT dataset (all-old or all-new, never mixed), and the " +
      "next publish recovers") {
    import spark.implicits._
    final class Kill extends RuntimeException("simulated crash")
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    def readTags(root: String): Option[(Set[String], Set[String])] =
      for {
        a <- Sync.readAtomicTable(spark, root, "ta")
        b <- Sync.readAtomicTable(spark, root, "tb")
      } yield (a.select("tag").distinct().collect().map(_.getString(0)).toSet,
        b.select("tag").distinct().collect().map(_.getString(0)).toSet)
    for (killAt <- 1 to 4) {
      val root = Files.createTempDirectory(s"graft_atomic_$killAt")
        .toString + "/ds"
      Sync.publishAtomicAll(Seq("ta" -> ds("v1", 3), "tb" -> ds("v1", 5)), root)
      assert(readTags(root).contains((Set("v1"), Set("v1"))))
      intercept[Kill] {
        Sync.publishAtomicAll(Seq("ta" -> ds("v2", 4), "tb" -> ds("v2", 6)),
          root, boundary = b => if (b == killAt) throw new Kill)
      }
      val got = readTags(root)
      assert(got.contains((Set("v1"), Set("v1"))) ||
        got.contains((Set("v2"), Set("v2"))),
        s"kill@$killAt must not expose a mixed dataset: $got")
      // boundaries 1-2 must still read old; 3-4 read new via tmp/manifest
      if (killAt <= 2) assert(got.contains((Set("v1"), Set("v1"))))
      else assert(got.contains((Set("v2"), Set("v2"))))
      // recovery: a fresh publish lands cleanly on top of the wreckage
      Sync.publishAtomicAll(Seq("ta" -> ds("v3", 2), "tb" -> ds("v3", 2)), root)
      assert(readTags(root).contains((Set("v3"), Set("v3"))))
    }
  }

  test("concurrent publishAtomicAll: racing publishes never lose a " +
      "version — each success is readable at its own slot, history " +
      "stays strictly monotone, the live pointer never regresses " +
      "below the newest committed state, and a same-slot loser " +
      "refuses with ConcurrentPublishException (or lands cleanly on " +
      "the next slot)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    for (trial <- 1 to 6) {
      val root = Files.createTempDirectory(s"graft_race_$trial")
        .toString + "/ds"
      Sync.publishAtomicAll(Seq("t" -> ds("base", 1)), root, retain = 10)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val outs = new java.util.concurrent.ConcurrentLinkedQueue[
        Either[Throwable, Map[String, Long]]]()
      val threads = Seq("pub_a", "pub_b").map { tag =>
        val th = new Thread(() => {
          gate.await()
          try outs.add(Right(Sync.publishAtomicAll(
            Seq("t" -> ds(tag, 2)), root, retain = 10)))
          catch { case e: Throwable => outs.add(Left(e)) }
        })
        th.start(); th
      }
      // a reader hammering the root DURING the race must always resolve
      // a complete, committed state — base or either publisher's table,
      // never a torn manifest or a half-written snapshot
      val readerBad = new java.util.concurrent.atomic.AtomicReference[
        String](null)
      val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        gate.await()
        while (!stopReader.get()) {
          try {
            Sync.readAtomicTable(spark, root, "t").foreach { df =>
              val tags = df.select("tag").distinct().collect()
                .map(_.getString(0)).toSet
              val n = df.count()
              val ok = (tags == Set("base") && n == 1L) ||
                (n == 2L && (tags == Set("pub_a") || tags == Set("pub_b")))
              if (!ok) readerBad.compareAndSet(null, s"tags=$tags n=$n")
            }
          } catch { case e: Throwable =>
            readerBad.compareAndSet(null, s"reader threw: ${e.getMessage}")
          }
        }
      })
      reader.start()
      gate.countDown()
      threads.foreach(_.join(120000))
      stopReader.set(true)
      reader.join(120000)
      assert(readerBad.get() == null,
        s"trial $trial: mid-race reader saw a torn state: ${readerBad.get()}")
      val (losses, wins) = outs.asScala.toSeq.partition(_.isLeft)
      assert(wins.nonEmpty, s"trial $trial: at least one publish must land")
      // a loser is ONLY ever the optimistic-concurrency refusal
      losses.foreach { l =>
        assert(l.left.exists(_.isInstanceOf[Sync.ConcurrentPublishException]),
          s"trial $trial: unexpected failure ${l.left}")
      }
      // no lost version: every success reads back its own data at its slot
      wins.foreach { w =>
        val v = w.toOption.get("t")
        val df = Sync.readAtomicTableAt(spark, root, "t", v)
        assert(df.exists(_.count() == 2L),
          s"trial $trial: version $v must be readable")
      }
      // history strictly monotone, no duplicate slots
      val slots = Sync.listPublishHistory(spark, root).map(_._1)
      assert(slots == slots.sorted && slots.distinct == slots,
        s"trial $trial: history not monotone: $slots")
      // pointer = the newest committed state (no regression possible)
      val live = Sync.readAtomicTable(spark, root, "t").get
      val maxV = wins.map(_.toOption.get("t")).max
      assert(Sync.listPublishHistory(spark, root).last._3("t") == maxV)
      assert(live.count() == 2L)
    }
    // deterministic same-slot contention via the boundary(0) race
    // window: publisher B claims the slot INSIDE A's window, so A's
    // claim must fail with the refusal — and `retries` then lands A
    // on the next slot
    val root = Files.createTempDirectory("graft_race_det").toString + "/ds"
    Sync.publishAtomicAll(Seq("t" -> ds("base", 1)), root, retain = 10)
    intercept[Sync.ConcurrentPublishException] {
      Sync.publishAtomicAll(Seq("t" -> ds("loser", 2)), root,
        boundary = b => if (b == 0)
          Sync.publishAtomicAll(Seq("t" -> ds("winner", 3)), root,
            retain = 10),
        retain = 10)
    }
    // winner's data is live; the refused publish left no trace
    assert(Sync.readAtomicTable(spark, root, "t").get
      .select("tag").distinct().head().getString(0) == "winner")
    assert(Sync.listPublishHistory(spark, root).map(_._1) == Seq(1L, 2L))
    // retry path: one conflict then success on the advanced slot
    var first = true
    val got = Sync.publishAtomicAll(Seq("t" -> ds("retried", 4)), root,
      boundary = b => if (b == 0 && first) {
        first = false
        Sync.publishAtomicAll(Seq("t" -> ds("squeeze", 5)), root,
          retain = 10)
      },
      retain = 10, retries = 2)
    assert(got("t") == 4L, s"retried publish must land on slot 4: $got")
    assert(Sync.readAtomicTable(spark, root, "t").get
      .select("tag").distinct().head().getString(0) == "retried")
    assert(Sync.listPublishHistory(spark, root).map(_._1) ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("manifest time travel: every publish is readable at its version " +
      "and by date; vacuum keeps the newest N readable, deletes the " +
      "rest's snapshots, and can never delete the live version") {
    import spark.implicits._
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
    val root = Files.createTempDirectory("graft_tt_spec").toString + "/ds"
    for (v <- 1 to 4)
      Sync.publishAtomicAll(Seq("t" -> ds(s"v$v", v)), root,
        retain = 10, publishedAt = Some(v * 1000L))
    // history is complete and ordered
    val hist = Sync.listPublishHistory(spark, root)
    assert(hist.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(hist.map(_._2) == Seq(1000L, 2000L, 3000L, 4000L))
    // every version reads back its own state
    for (v <- 1 to 4) {
      val df = Sync.readAtomicTableAt(spark, root, "t", v.toLong)
      assert(df.exists(_.count() == v.toLong), s"version $v")
      assert(df.exists(_.select("tag").distinct().head().getString(0)
        == s"v$v"))
    }
    // as-of-date semantics: newest publish at or before the stamp;
    // before the first publish there is nothing to read
    assert(Sync.readAtomicTableAsOf(spark, root, "t", 2500L)
      .exists(_.count() == 2L))
    assert(Sync.readAtomicTableAsOf(spark, root, "t", 2000L)
      .exists(_.count() == 2L))
    assert(Sync.readAtomicTableAsOf(spark, root, "t", 500L).isEmpty)
    // vacuum to the newest 2: v1/v2 snapshots deleted, v3/v4 intact
    val (keptN, deleted) = Sync.vacuumPublished(spark, root, keepN = 2)
    assert(keptN == 2L && deleted == 2L, s"kept=$keptN deleted=$deleted")
    assert(Sync.readAtomicTableAt(spark, root, "t", 1L).isEmpty)
    assert(Sync.readAtomicTableAt(spark, root, "t", 2L).isEmpty)
    assert(Sync.readAtomicTableAt(spark, root, "t", 3L)
      .exists(_.count() == 3L), "a kept version must stay readable")
    assert(Sync.readAtomicTableAt(spark, root, "t", 4L)
      .exists(_.count() == 4L))
    // the live pointer always survives vacuum, even keepN = 1
    val (k1, _) = Sync.vacuumPublished(spark, root, keepN = 1)
    assert(k1 == 1L)
    assert(Sync.readAtomicTable(spark, root, "t")
      .exists(_.count() == 4L), "live read after maximal vacuum")
    assert(Sync.readAtomicTableAt(spark, root, "t", 4L)
      .exists(_.count() == 4L))
    // guard: a vacuum keeping nothing is refused outright
    intercept[IllegalArgumentException] {
      Sync.vacuumPublished(spark, root, keepN = 0)
    }
    // a publish AFTER vacuum continues the manifest numbering (5), so
    // vacuumed version ids are never reused for different data
    Sync.publishAtomicAll(Seq("t" -> ds("v5", 5)), root,
      retain = 10, publishedAt = Some(5000L))
    assert(Sync.listPublishHistory(spark, root).map(_._1) == Seq(4L, 5L))
  }

  test("vacuumPublished reaps crashed-publish wreckage: orphaned staging " +
      "dirs, stale claim tombstones below the kept window, and snapshots " +
      "of tables only dropped manifests reference") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    val root = Files.createTempDirectory("graft_vac_wreck").toString + "/ds"
    for (v <- 1 to 3)
      Sync.publishAtomicAll(Seq("t" -> ds(s"v$v", v)), root, retain = 10)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a publish that dies in the race window leaves its staging behind
    final class Kill extends RuntimeException("crash")
    intercept[Kill] {
      Sync.publishAtomicAll(Seq("t" -> ds("dead", 9)), root,
        boundary = b => if (b == 0) throw new Kill, retain = 10)
    }
    assert(fs.listStatus(new Path(root, "t"))
      .exists(_.getPath.getName.startsWith(".stage-")),
      "the crashed publish must have left a staging dir to reap")
    // a table that ONLY dropped manifests reference (damaged-history
    // defensive path): hand-plant a ghost snapshot + reference in the
    // oldest manifest
    val m1 = new Path(root, "_manifests/manifest-1")
    val body = new String(
      {
        val in = fs.open(m1)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r > 0) { out.write(buf, 0, r); r = in.read(buf) }
        in.close(); out.toByteArray
      }, "UTF-8")
    val w = fs.create(m1, true)
    w.write((body + "\nghost=7").getBytes("UTF-8")); w.close()
    ds("ghost", 1).write.parquet(s"$root/ghost/snap-7")
    fs.create(new Path(root, "ghost/snap-7/_GRAFT_COMMITTED"), true).close()
    // vacuum to the newest manifest only
    val (kept, deleted) = Sync.vacuumPublished(spark, root, keepN = 1)
    assert(kept == 1L)
    // deleted: t snap-1, t snap-2, ghost snap-7 (live t snap-3 survives)
    assert(deleted == 3L, s"deleted=$deleted")
    assert(!fs.exists(new Path(root, "ghost/snap-7")),
      "a snapshot only dropped manifests reference must be reaped")
    assert(!fs.listStatus(new Path(root, "t"))
      .exists(_.getPath.getName.startsWith(".stage-")),
      "orphaned staging must be reaped")
    // claim tombstones below the kept window are gone; the newest stays
    val claims = fs.listStatus(new Path(root, "_manifests"))
      .map(_.getPath.getName).filter(_.endsWith(".claim")).sorted
    assert(claims.toSeq == Seq("manifest-3.claim"), claims.mkString(","))
    // live read is untouched
    assert(Sync.readAtomicTable(spark, root, "t").get.count() == 3L)
  }

  test("a55 fixed-width roundtrip: record layout is byte-exact, the " +
      "15-char priority with an INTERNAL space survives, and the " +
      "re-parsed aggregate matches a direct one") {
    import spark.implicits._
    import graft.operators.PipelineQueries
    // layout replica on one hand row: widths 12|1|14|8|15 = 50 bytes
    val row = Seq((42L, "P", 1234.56, java.sql.Date.valueOf("1997-03-09"),
      "4-NOT SPECIFIED")).toDF(
      "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    val line = row.select(concat(
      lpad(col("o_orderkey").cast("string"), 12, "0"),
      col("o_orderstatus"),
      lpad(floor(col("o_totalprice") * 100 + 0.5).cast("long")
        .cast("string"), 14, "0"),
      date_format(col("o_orderdate"), "yyyyMMdd"),
      rpad(col("o_orderpriority"), 15, " ")).as("v")).head().getString(0)
    assert(line.length == 50, s"record must be 50 bytes, got ${line.length}")
    assert(line == "000000000042P0000000012345619970309" +
      "4-NOT SPECIFIED", line)
    // end-to-end: the registered query equals the same aggregate taken
    // directly from the source table (no file hop)
    val got = PipelineQueries.a55FixedWidthRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val direct = graft.Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("total_cents"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT))")
          .as("key_xor"),
        count_distinct(col("o_orderpriority")).as("n_priorities"))
      .orderBy("status")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == direct, s"\ngot    $got\ndirect $direct")
  }

  test("a56 csv multiline: a single hand row with comma + quotes + " +
      "newline survives the RFC dialect write/read byte-exactly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_csvml_spec").toString + "/t"
    val tricky = "plain, then \"quoted, with comma\" then\na second line"
    Seq((1L, tricky)).toDF("id", "v")
      .write.option("header", true).option("escape", "\"").csv(base)
    val back = spark.read
      .schema("id BIGINT, v STRING")
      .option("header", true).option("multiLine", true)
      .option("escape", "\"").csv(base)
      .collect()
    assert(back.length == 1, "the quoted newline must NOT split the record")
    assert(back.head.getString(1) == tricky, back.head.getString(1))
    // registered query equals the same aggregate taken directly
    import graft.operators.PipelineQueries
    val got = PipelineQueries.a56CsvMultiline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val direct = graft.Tables.load(spark, sfDir, "documents")
      .select(col("lang"), col("source"), col("n_chars"),
        concat(col("text"), lit(", \"mid\"\ntail-"),
          col("doc_id").cast("string")).as("text"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("total_chars"),
        expr("bit_xor(CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT))")
          .as("content_xor"))
      .orderBy("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == direct)
  }

  test("in-publish retention under concurrency: a faster higher-slot " +
      "publish with retain=1 never reaps a slower concurrent publish's " +
      "just-committed snapshot — every success stays readable at its " +
      "own slot") {
    import spark.implicits._
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    val root = Files.createTempDirectory("graft_ret_race").toString + "/ds"
    Sync.publishAtomicAll(Seq("t" -> ds("base", 1)), root, retain = 1)
    // A commits its snapshot + history (boundary 1) and PAUSES before
    // its pointer swap; B publishes fully — slot 3, retain=1 — inside
    // that pause. B's in-publish retention must only reap versions at
    // or below the live version B started from (slot 1), never A's
    // committed-but-not-yet-live snap-2.
    var fired = false
    val gotA = Sync.publishAtomicAll(Seq("t" -> ds("slow_a", 2)), root,
      boundary = b => if (b == 1 && !fired) {
        fired = true
        Sync.publishAtomicAll(Seq("t" -> ds("fast_b", 3)), root, retain = 1)
      }, retain = 1)
    assert(gotA("t") == 2L, s"A must land on slot 2: $gotA")
    val atA = Sync.readAtomicTableAt(spark, root, "t", 2L)
    assert(atA.exists(_.count() == 2L),
      "A's snapshot was reaped by B's concurrent retention")
    assert(atA.get.select("tag").distinct().head().getString(0) == "slow_a")
    // live converged on the newest committed state (B's slot 3)
    assert(Sync.readAtomicTable(spark, root, "t").get
      .select("tag").distinct().head().getString(0) == "fast_b")
    // the superseded base (slot 1, below B's starting live) WAS reaped
    assert(Sync.readAtomicTableAt(spark, root, "t", 1L).isEmpty,
      "retain=1 must still reap the superseded base snapshot")
  }

  test("in-publish retention never reaps an UNRETURNED publish even when " +
      "the live pointer has advanced past its slot: completion markers " +
      "gate the reap (the chaos-race scenario: A paused pre-return at " +
      "slot 2, B lands slot 3, C lands slot 4 with retain=1 — snap-2 " +
      "must survive until A acknowledges)") {
    import spark.implicits._
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    val root = Files.createTempDirectory("graft_done_race").toString + "/ds"
    Sync.publishAtomicAll(Seq("t" -> ds("base", 1)), root, retain = 1)
    var fired = false
    val gotA = Sync.publishAtomicAll(Seq("t" -> ds("slow_a", 2)), root,
      boundary = b => if (b == 1 && !fired) {
        fired = true
        // B then C land fully inside A's pause; C's publish-time live
        // is already B's slot 3 — past A's slot 2 — so without the
        // completion-marker gate C's retention would reap snap-2
        Sync.publishAtomicAll(Seq("t" -> ds("fast_b", 3)), root, retain = 1)
        Sync.publishAtomicAll(Seq("t" -> ds("fast_c", 4)), root, retain = 1)
      }, retain = 1)
    assert(gotA("t") == 2L, s"A must land on slot 2: $gotA")
    val atA = Sync.readAtomicTableAt(spark, root, "t", 2L)
    assert(atA.exists(_.count() == 2L),
      "A's snapshot was reaped while its publish was still in flight")
    assert(atA.get.select("tag").distinct().head().getString(0) == "slow_a")
    // base (slot 1, returned long ago, below everyone's window) IS reaped
    assert(Sync.readAtomicTableAt(spark, root, "t", 1L).isEmpty)
    // live converged on the newest committed state (C's slot 4)
    assert(Sync.readAtomicTable(spark, root, "t").get
      .select("tag").distinct().head().getString(0) == "fast_c")
    // and once A HAS returned, a later publish may reap its slot — the
    // retain window applies normally to acknowledged versions
    Sync.publishAtomicAll(Seq("t" -> ds("after", 5)), root, retain = 1)
    assert(Sync.readAtomicTableAt(spark, root, "t", 2L).isEmpty,
      "an acknowledged superseded version must still fall out of the " +
        "retain window")
  }

  test("deletion vectors: each batch is O(deleted) sidecar bytes with " +
      "byte-stable base, MOR equals the anti-join truth at every step, " +
      "re-running a batch is idempotent, compact retires the sidecars") {
    import spark.implicits._
    val path = Files.createTempDirectory("dv_spec").toString
    val base = (1L to 500L).map(i => (i, i % 7, s"p$i"))
      .toDF("k", "grp", "payload")
    DeletionVectors.publishBase(base, path)
    val fp0 = DeletionVectors.baseFingerprint(spark, path)
    // no sidecars → plain scan
    assert(DeletionVectors.readMor(spark, path, "k").count() == 500)
    DeletionVectors.addDeletes(spark, path,
      base.filter($"k" % 5 === 0).select("k"), "k")
    assert(DeletionVectors.readMor(spark, path, "k").count() == 400)
    // second batch overlaps the first — overlap must not double-delete
    DeletionVectors.addDeletes(spark, path,
      base.filter($"k" % 10 === 0).select("k"), "k")
    val mor = DeletionVectors.readMor(spark, path, "k")
    assert(mor.count() == 400)
    assert(mor.filter($"k" % 5 === 0).count() == 0)
    // base untouched by any number of delete batches
    assert(DeletionVectors.baseFingerprint(spark, path) == fp0)
    // a crashed-and-retried batch id overwrites, not duplicates
    val fsys = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nBefore = fsys.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/_deletes")).length
    assert(nBefore == 2)
    DeletionVectors.compact(spark, path, "k")
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$path/_deletes")))
    val after = DeletionVectors.readMor(spark, path, "k")
    assert(after.count() == 400 && after.filter($"k" % 5 === 0).count() == 0)
  }

  test("mid-swap reader fallback is the newest COMMITTED history entry, " +
      "never a staged pointer tmp — a torn concurrent tmp cannot " +
      "resolve a stale state") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    def ds(tag: String, n: Int) =
      (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")
    val root = Files.createTempDirectory("graft_tmp_torn").toString + "/ds"
    Sync.publishAtomicAll(Seq("t" -> ds("v1", 1)), root, retain = 10)
    Sync.publishAtomicAll(Seq("t" -> ds("v2", 2)), root, retain = 10)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // simulate the delete–rename window with torn/stale tmps beside it:
    // "t=1" is exactly the torn prefix of a half-written "t=12"-style
    // line — parsable, and WRONG
    fs.delete(new Path(root, "_MANIFEST"), false)
    for (tmpName <- Seq("_MANIFEST.tmp", "_MANIFEST.tmp-deadbeef")) {
      val out = fs.create(new Path(root, tmpName), true)
      out.write("t=1".getBytes("UTF-8")); out.close()
    }
    val seen = Sync.readAtomicTable(spark, root, "t").get
    assert(seen.count() == 2L &&
      seen.select("tag").distinct().head().getString(0) == "v2",
      "mid-swap fallback must resolve the newest committed history " +
        "entry, not a (possibly torn) staged tmp")
    // vacuum reaps the orphaned pointer tmps; the next publish then
    // restores the live pointer file
    Sync.vacuumPublished(spark, root, keepN = 10)
    assert(!fs.exists(new Path(root, "_MANIFEST.tmp-deadbeef")))
    Sync.publishAtomicAll(Seq("t" -> ds("v3", 3)), root, retain = 10)
    assert(fs.exists(new Path(root, "_MANIFEST")))
    assert(Sync.readAtomicTable(spark, root, "t").get.count() == 3L)
  }
}
