package graft

import org.apache.spark.sql.functions._

/** Bounded-memory stress evidence (not part of the driver contract) —
  * the MEMORY axis of the "would it survive 100×" question the plan
  * audits answer only structurally: the heaviest registered rows run on
  * `local-cluster[2,2,768]` (two REAL executor JVMs, each starved to a
  * 768 MiB heap — a fraction of what the same rows get under the bench's
  * local[32] / 128 GiB), and must finish WITHOUT an OOM with results
  * bit-identical to a comfortable local[8] run in the same driver.
  * Surviving here means the plans' spill paths (sort-merge fallback,
  * ObjectHashAggregate spill, shuffle spill) actually engage rather than
  * being assumed — an operator that secretly buffers an unbounded
  * structure on the executor heap dies loudly instead.
  *
  * The slice is the round-13 verdict's heavy list: the PassJoin
  * edit-distance dedup (probe fan-out + banded DP), the span dedup, the
  * exact+IVF reciprocal-NN agreement row, the composed multi-publish
  * prep pipeline, and the exact distinct-value percentile (per-group
  * ObjectHashAggregate state).
  *
  * Usage: `SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
  * tools/run_one.sh graft.MemStress [sfDir]`; `tools/memstress_gate.sh`
  * wraps it into a dated MEMSTRESS.md line per round.
  */
object MemStress {

  private val heavy = Seq("dedup_edit", "dedup_span",
    "sim_reciprocal_nn_ivf", "pipeline_prep", "q59_percentile_disc")

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val row = df.select(xxhash64(cols: _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
        count(lit(1)).as("n"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  private def runSlice(sfDir: String): Map[String, (Long, Long)] = {
    val spark = Engine.session("mem-stress", "4")
    try heavy.map { name =>
      val t0 = System.nanoTime()
      val fp = fingerprint(SparkEntry.queries(name)(spark, sfDir))
      println(f"[mem] $name%-24s rows=${fp._1}%-7d " +
        f"${(System.nanoTime() - t0) / 1e9}%.1fs")
      name -> fp
    }.toMap
    finally {
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val master = if (args.length > 1) args(1) else "local-cluster[2,2,768]"
    // starved pass: two executor JVMs at 768 MiB each; small shuffle
    // partition count RAISES per-partition pressure (the adversarial
    // direction — more rows per task must spill, not fewer)
    sys.props("spark.executor.extraClassPath") = sys.props("java.class.path")
    sys.props("spark.master") = master
    sys.props("spark.executor.memory") = "768m"
    sys.props("spark.sql.shuffle.partitions") = "8"
    sys.props("spark.ui.enabled") = "false"
    println(s"[mem] starved pass on $master")
    val starved = runSlice(sfDir)
    // comfortable pass: plain local in the same driver
    sys.props -= "spark.master"
    sys.props -= "spark.executor.extraClassPath"
    sys.props -= "spark.executor.memory"
    println(s"[mem] comfortable pass on local[4]")
    val comfy = runSlice(sfDir)
    var failed = 0
    heavy.foreach { name =>
      val ok = starved(name) == comfy(name)
      if (!ok) failed += 1
      println(f"[mem] $name%-24s ${if (ok) "MATCH" else
        s"MISMATCH starved=${starved(name)} comfy=${comfy(name)}"}")
    }
    println(s"[mem] ${if (failed == 0)
      s"ALL OK: ${heavy.size} heavy rows spill-not-OOM at 768m, bit-identical"
    else s"$failed row(s) FAILED"}")
    if (failed > 0) sys.exit(1)
  }
}
