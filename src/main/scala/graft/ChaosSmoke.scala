package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Sync

/** Executor-loss chaos evidence (not part of the driver contract) — the
  * fault-tolerance sibling of [[ClusterSmoke]]: on `local-cluster[2,4,2048]`
  * (two REAL executor JVMs), an executor is killed MID-QUERY over a
  * multi-stage shuffle chain and MID-BATCH inside a streaming incremental
  * publish, and the results must be bit-identical to the undisturbed run /
  * the batch truth — Spark's task-retry and the sink's idempotence guard
  * doing exactly what the 100 TB design story claims they do.
  *
  * Leg 1 (batch): a 3-shuffle aggregate chain (union-fattened lineitem →
  * per-order agg → orders join → per-customer agg) runs once undisturbed
  * for the truth fingerprint, then again with `sc.killExecutors` fired
  * ~0.5 s into the job; the run only counts if the kill landed BEFORE the
  * query finished (wall-clock assert) and dropped a live executor. Lost
  * tasks reschedule on the surviving executor; (rows, xor-hash) must match
  * exactly.
  *
  * Leg 2 (streaming): the a38 shape — documents published to a live bus
  * from executor tasks, then `busIncrementalPublish` drains it in ~30
  * capped micro-batches (AvailableNow), each full-outer-merging its delta
  * into the crash-consistent published snapshot under the last_batch
  * idempotence guard. An executor dies after the second progress event;
  * the final published table must equal the one-shot batch aggregate
  * row-for-row — no lost batch, no double-applied retry.
  *
  * Leg 3 (concurrent publish): three [[graft.pipeline.Sync.publishAtomicAll]]
  * racers on one root (retain=2, conflict retries) while an executor dies
  * and a reader hammers the pointer — no torn read, no pointer
  * regression, every returned success readable at its own slot (the
  * optimistic-concurrency + in-publish-retention contract under fault
  * injection, not just under SyncSpec's single-JVM race).
  *
  * Usage: `SPARK_SCALA_VERSION=2.13 SPARK_HOME=/opt/spark
  * tools/run_one.sh graft.ChaosSmoke [sfDir]` (the launcher needs both
  * to build executor commands from a jars-only Spark layout).
  *
  * Round-12 run at sf0.1: batch leg OK (executor 0 lost 2.7 s before
  * job end, result bit-identical), stream leg OK (executor lost 9.9 s
  * before drain end, published == batch truth).
  */
object ChaosSmoke {

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val row = df.select(xxhash64(cols: _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)).as("x"), count(lit(1)).as("n"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  /** The multi-stage shuffle chain: wide enough to spread over both
    * executors, long enough (~several seconds at sf0.1) that the kill
    * lands mid-flight.
    */
  private def heavy(s: SparkSession, dir: String): DataFrame = {
    // integer cents end to end: double sums re-associate under task
    // retry, so only exact arithmetic can be asserted bit-identical
    // across an executor loss (that re-association is Spark semantics,
    // not a defect — the house integer-micro-unit idiom exists for it)
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
    val fat = (1 to 8).map(_ => l).reduce(_ unionAll _)
    val perOrder = fat.groupBy("l_orderkey")
      .agg(sum("cents").as("rev_c"), sum("qty").as("qty"),
        count(lit(1)).as("n"))
    val o = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey")
    perOrder.join(o, perOrder("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_c").as("rev_c"), sum("qty").as("qty"),
        sum("n").as("n"))
  }

  /** Kill one live executor; returns the id that went down. */
  private def killOne(s: SparkSession): Option[String] = {
    val sc = s.sparkContext
    (0 to 3).map(_.toString).find { id =>
      try sc.killExecutors(Seq(id)) catch { case _: Throwable => false }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    sys.props("spark.executor.extraClassPath") = sys.props("java.class.path")
    sys.props("spark.master") = "local-cluster[2,4,2048]"
    sys.props("spark.sql.shuffle.partitions") = "8"
    sys.props("spark.ui.enabled") = "false"
    var failures = 0

    // ---- leg 1: batch query with mid-flight executor loss ----------------
    locally {
      val spark = Engine.session("chaos-batch", "8")
      try {
        val truth = fingerprint(heavy(spark, sfDir))
        println(s"[chaos] batch truth: rows=${truth._1} hash=${truth._2}")
        val killedAt = new java.util.concurrent.atomic.AtomicLong(0L)
        val killedId = new java.util.concurrent.atomic.AtomicReference[String]("")
        val chaos = new Thread(() => {
          val sc = spark.sparkContext
          while (sc.statusTracker.getActiveJobIds().isEmpty) Thread.sleep(20)
          Thread.sleep(500)
          killOne(spark).foreach { id =>
            killedId.set(id)
            killedAt.set(System.nanoTime())
          }
        }, "chaos-killer")
        chaos.setDaemon(true)
        chaos.start()
        val survived = fingerprint(heavy(spark, sfDir))
        val endAt = System.nanoTime()
        chaos.join(10000)
        if (killedAt.get() == 0L) {
          println("[chaos] FAIL batch: no executor was killed")
          failures += 1
        } else if (killedAt.get() >= endAt) {
          println("[chaos] FAIL batch: kill landed after the query finished " +
            "(vacuous run — enlarge the chain)")
          failures += 1
        } else if (survived != truth) {
          println(s"[chaos] FAIL batch: rows/hash diverged after losing " +
            s"executor ${killedId.get()}: $survived vs $truth")
          failures += 1
        } else {
          println(s"[chaos] batch leg OK: executor ${killedId.get()} lost " +
            f"${(endAt - killedAt.get()) / 1e9}%.1fs before job end, " +
            "result bit-identical")
        }
      } finally {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }

    // ---- leg 2: streaming incremental publish with mid-batch loss --------
    locally {
      val spark = Engine.session("chaos-stream", "8")
      try {
        import spark.implicits._
        val server = new graft.sources.bus.BusServer(4,
          bindHost = graft.operators.PipelineQueries.driverHost(spark))
        val port = server.start()
        val busHost = graft.operators.PipelineQueries.driverHost(spark)
        Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("len"))
          .as[(Long, Long)]
          .foreachPartition { (it: Iterator[(Long, Long)]) =>
            val cl = new graft.sources.bus.BusClient(busHost, port)
            try it.foreach { case (id, len) =>
              cl.append((id % 4).toInt, 1700000000000000L + id,
                "s" + (id % 10), len.toString)
            } finally cl.close()
          }
        val truth = Tables.load(spark, sfDir, "documents")
          .select(concat(lit("s"), (col("doc_id") % 10)).as("key"),
            length(col("text")).cast("long").as("len"))
          .groupBy("key")
          .agg(count(lit(1)).as("n"), sum("len").as("total"))
        val truthFp = fingerprint(truth)
        val tmp = graft.util.Scratch.dir("graft_chaos")
        val finalPath = s"$tmp/published"
        // small cap → many merge→publish cycles, so the kill lands with
        // plenty of drain still ahead of it
        val q = graft.sources.bus.BusSync.busIncrementalPublish(spark,
          busHost, port, s"$tmp/ck", finalPath,
          maxRecordsPerTrigger = 128)
        val killedAt = new java.util.concurrent.atomic.AtomicLong(0L)
        val chaos = new Thread(() => {
          while (q.isActive && q.recentProgress.isEmpty) Thread.sleep(20)
          if (q.isActive)
            killOne(spark).foreach(_ => killedAt.set(System.nanoTime()))
        }, "chaos-stream-killer")
        chaos.setDaemon(true)
        chaos.start()
        q.awaitTermination()
        val endAt = System.nanoTime()
        chaos.join(10000)
        val got = graft.pipeline.Sync.readPublished(spark, finalPath).get
          .select(col("key"), col("n"), col("total"))
        val gotFp = fingerprint(got)
        if (killedAt.get() == 0L) {
          println("[chaos] FAIL stream: no executor was killed mid-stream")
          failures += 1
        } else if (killedAt.get() >= endAt) {
          println("[chaos] FAIL stream: kill landed after the drain ended")
          failures += 1
        } else if (gotFp != truthFp) {
          println(s"[chaos] FAIL stream: published table diverged: " +
            s"$gotFp vs $truthFp (exactly-once broken)")
          failures += 1
        } else {
          println(s"[chaos] stream leg OK: executor lost mid-drain " +
            f"(${(endAt - killedAt.get()) / 1e9}%.1fs before end), " +
            s"published == batch truth (${truthFp._1} keys)")
        }
        server.close()
      } finally {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }

    // ---- leg 3: concurrent atomic publishers + executor loss -------------
    // a66's optimistic-concurrency race under REAL fault injection: three
    // publishers race on one root (retain=2, retries so conflicts retry
    // onto the next slot) while an executor JVM dies mid-race and a
    // reader hammers the live pointer. Invariants: the reader never
    // resolves a torn/mixed state (a successful read is exactly one
    // publisher's complete data), the history slot sequence only grows,
    // every publish that returned success is readable AT ITS OWN SLOT
    // afterwards (the in-publish retention bound: a concurrent
    // publisher's fresh snapshot is never reaped — the r15 Sync fix),
    // and the final live state is the newest committed slot.
    locally {
      val spark = Engine.session("chaos-race", "8")
      try {
        val tmp = graft.util.Scratch.dir("graft_chaos_race")
        val root = s"$tmp/ds"
        def frame(tag: String) = {
          val l = Tables.load(spark, sfDir, "lineitem")
            .select(col("l_orderkey"),
              round(col("l_extendedprice") * 100).cast("long").as("cents"))
          (1 to 4).map(_ => l).reduce(_ unionAll _)
            .groupBy("l_orderkey")
            .agg(sum("cents").as("c"), count(lit(1)).as("n"))
            .withColumn("tag", lit(tag))
        }
        val base = Tables.load(spark, sfDir, "nation")
          .select(col("n_nationkey").as("l_orderkey"),
            col("n_regionkey").cast("long").as("c"), lit(1L).as("n"))
          .withColumn("tag", lit("base"))
        val baseN = base.count()
        val orderN = frame("x").count()
        Sync.publishAtomicAll(Seq("t" -> base), root, retain = 2)
        val tags = Seq("pub_a", "pub_b", "pub_c")
        val outs = new java.util.concurrent.ConcurrentLinkedQueue[
          Either[Throwable, Map[String, Long]]]()
        val gate = new java.util.concurrent.CountDownLatch(1)
        // the own-slot read-back runs INSIDE the publisher thread,
        // immediately after the publish returns — the exact moment the
        // "every success is readable at its own slot" contract speaks
        // (later, a successor's in-publish retention may legitimately
        // reap versions that fall out of the retain window)
        val readbackBad =
          new java.util.concurrent.atomic.AtomicReference[String](null)
        val pubs = tags.map { tag =>
          val th = new Thread(() => {
            gate.await()
            try {
              val got = Sync.publishAtomicAll(
                Seq("t" -> frame(tag)), root, retain = 2, retries = 5)
              val v = got("t")
              val ok = Sync.readAtomicTableAt(spark, root, "t", v)
                .exists(_.count() == orderN)
              if (!ok) readbackBad.compareAndSet(null,
                s"$tag: slot $v unreadable at the moment its publish " +
                  "returned (a concurrent retention reaped an in-flight " +
                  "publish)")
              outs.add(Right(got))
            } catch { case e: Throwable => outs.add(Left(e)) }
          }, s"chaos-pub-$tag")
          th.start(); th
        }
        val readerBad =
          new java.util.concurrent.atomic.AtomicReference[String](null)
        val readErrs = new java.util.concurrent.atomic.AtomicLong(0L)
        val lastSlot = new java.util.concurrent.atomic.AtomicLong(0L)
        val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)
        val reader = new Thread(() => {
          gate.await()
          while (!stopReader.get()) {
            try {
              val hist = Sync.listPublishHistory(spark, root)
              if (hist.nonEmpty) {
                val s0 = hist.last._1
                val prev = lastSlot.getAndUpdate(p => math.max(p, s0))
                if (s0 < prev) readerBad.compareAndSet(null,
                  s"history regressed: $s0 after $prev")
              }
              Sync.readAtomicTable(spark, root, "t").fold[Unit] {
                readerBad.compareAndSet(null,
                  "published root resolved to NOTHING mid-race"); ()
              } { df =>
                val ts = df.select("tag").distinct().collect()
                  .map(_.getString(0)).toSet
                val k = df.count()
                val ok = ts.size == 1 && (
                  (ts.head == "base" && k == baseN) ||
                  (tags.contains(ts.head) && k == orderN))
                if (!ok) readerBad.compareAndSet(null,
                  s"torn read: tags=$ts rows=$k")
              }
            } catch {
              // a data-file read racing a snapshot reap (retain=2 with
              // three racers reaps the base) is a transient, counted —
              // torn CONTENT or a regressing pointer is what fails
              case _: Throwable => readErrs.incrementAndGet()
            }
          }
        }, "chaos-race-reader")
        reader.start()
        val killedAt = new java.util.concurrent.atomic.AtomicLong(0L)
        val chaos = new Thread(() => {
          val sc = spark.sparkContext
          while (sc.statusTracker.getActiveJobIds().isEmpty) Thread.sleep(20)
          Thread.sleep(300)
          killOne(spark).foreach(_ => killedAt.set(System.nanoTime()))
        }, "chaos-race-killer")
        chaos.setDaemon(true)
        gate.countDown()
        chaos.start()
        pubs.foreach(_.join(180000))
        val endAt = System.nanoTime()
        stopReader.set(true)
        reader.join(60000)
        chaos.join(10000)
        import scala.jdk.CollectionConverters._
        val (losses, wins) = outs.asScala.toSeq.partition(_.isLeft)
        val winSlots = wins.flatMap(_.toOption).map(_("t"))
        def fail(msg: String): Unit = { println(s"[chaos] FAIL race: $msg"); failures += 1 }
        if (killedAt.get() == 0L) fail("no executor was killed")
        else if (killedAt.get() >= endAt)
          fail("kill landed after every publish finished (vacuous)")
        else if (readerBad.get() != null) fail(readerBad.get())
        else if (wins.isEmpty) fail(s"no publish landed: $losses")
        else if (!losses.forall(_.left.exists(
            _.isInstanceOf[Sync.ConcurrentPublishException])))
          fail(s"non-refusal failure: $losses")
        else {
          // post-hoc, only the newest `retain` success slots must still
          // be readable — older ones may have fallen out of the window
          val unreadable = winSlots.sorted.takeRight(2).filterNot { v =>
            Sync.readAtomicTableAt(spark, root, "t", v)
              .exists(_.count() == orderN)
          }
          val hist = Sync.listPublishHistory(spark, root).map(_._1)
          val live = Sync.readAtomicTable(spark, root, "t").get
            .select("tag").distinct().collect().map(_.getString(0)).toSet
          if (readbackBad.get() != null)
            fail(readbackBad.get())
          else if (unreadable.nonEmpty)
            fail(s"newest success slots $unreadable not readable " +
              "(inside the retain window)")
          else if (hist != hist.sorted || hist.distinct != hist)
            fail(s"history not strictly monotone: $hist")
          else if (live.size != 1 || !tags.contains(live.head))
            fail(s"final live state is not a single racer's data: $live")
          else
            println(s"[chaos] race leg OK: ${wins.size}/3 publishes landed " +
              s"at slots ${winSlots.sorted.mkString(",")} " +
              s"(${losses.size} clean refusals) through an executor loss; " +
              s"reader: 0 torn states, ${readErrs.get()} transient " +
              "read-vs-reap retries; every success readable at its slot")
        }
      } finally {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
      }
    }

    println(s"[chaos] ${if (failures == 0) "ALL LEGS OK" else s"$failures leg(s) FAILED"}")
    if (failures > 0) sys.exit(1)
  }
}
