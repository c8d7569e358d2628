package graft

import org.apache.spark.sql.functions._

/** Multi-executor execution evidence (not part of the driver contract).
  *
  * Runs the FULL registered query surface (minus the per-JVM embedded-Derby
  * queries) on `local-cluster[2,4,2048]` — Spark's standalone-mode test
  * master that launches TWO SEPARATE EXECUTOR JVMs on this host — then
  * re-runs the same slice on plain `local[8]` in the same driver and
  * compares row counts plus an order-independent value hash.
  *
  * What this proves that `local[N]` cannot: closures, Encoders and the
  * codebook/Bloom literals actually SERIALIZE across JVM boundaries; shuffles
  * and broadcasts move over netty instead of sharing a heap;
  * `localCheckpoint` blocks live on executors and survive task retries on
  * the other executor. The slice deliberately covers every mechanism class:
  * broadcast-hash star join, map-side-combined aggregate, window top-k,
  * checkpointed MinHash signatures, the checkpointed IVF-PQ code table, the
  * Bloom semi-join's driver-built sketch literal, the one-pass tolerance
  * percentiles, and the driver-side union-find components path.
  *
  * Usage: `SPARK_HOME=/opt/spark tools/run_one.sh graft.ClusterSmoke [sfDir]`
  * (the executor classpath is this JVM's own classpath, forwarded via
  * `spark.executor.extraClassPath`).
  */
object ClusterSmoke {

  /** Embedded Derby is `jdbc:derby:memory:` — a PER-JVM store, so an
    * executor JVM connecting to it sees a fresh empty database. These
    * queries are single-process by design (on a real cluster the JDBC
    * source is a network database); everything else runs clustered.
    */
  private val derbyBacked = Set("a01_jdbc_pushdown", "a02_jdbc_partitioned",
    "a04_catalog_scan", "a04b_mysql_catalog", "a21_jdbc_publish")

  private def slice: Seq[String] = {
    // dev bisect hook (never set by the driver): restrict the parity
    // slice to named queries, the SPARK_GRAFT_BENCH_ONLY convention
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.keys.toSeq.sorted.filterNot(derbyBacked)
      .filter(n => only.forall(_.contains(n)))
  }

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    // bit_xor: order-independent and overflow-free (ANSI-safe)
    val row = df.select(xxhash64(cols: _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)).as("x"), count(lit(1)).as("n"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  private def runSlice(sfDir: String): Map[String, (Long, Long)] = {
    val spark = Engine.session("cluster-smoke", "8")
    try slice.map { name =>
      System.err.println(s"[cluster-smoke] running $name")
      name -> fingerprint(SparkEntry.queries(name)(spark, sfDir))
    }.toMap
    finally { spark.stop(); org.apache.spark.sql.SparkSession.clearActiveSession() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val master = if (args.length > 1) args(1) else "local-cluster[2,4,2048]"
    // forward this JVM's classpath to the executor JVMs the cluster spawns
    sys.props("spark.executor.extraClassPath") = sys.props("java.class.path")
    sys.props("spark.master") = master
    sys.props("spark.sql.shuffle.partitions") = "8"
    sys.props("spark.ui.enabled") = "false"
    val clustered = runSlice(sfDir)
    println(s"[cluster-smoke] $master: ${clustered.size} queries executed")
    // same slice, single-JVM local mode, same driver process
    sys.props -= "spark.master"
    sys.props -= "spark.executor.extraClassPath"
    val local = runSlice(sfDir)
    var failed = 0
    slice.foreach { name =>
      val (cn, ch) = clustered(name)
      val (ln, lh) = local(name)
      val ok = cn == ln && ch == lh
      if (!ok) failed += 1
      println(f"[cluster-smoke] $name%-24s rows=$cn%-6d hash=${ch}%-22d ${if (ok) "MATCH" else s"MISMATCH vs local rows=$ln hash=$lh"}")
    }
    println(s"[cluster-smoke] ${slice.size - failed}/${slice.size} identical across 2-executor cluster vs local")
    if (failed > 0) sys.exit(1)
  }
}
