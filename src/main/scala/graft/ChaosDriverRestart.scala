package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DRIVER-restart chaos evidence (not part of the driver contract) — the
  * coordinator-level sibling of [[ChaosSmoke]]'s executor kills, and the
  * fault streaming users actually hit weekly: the whole driver JVM dies
  * mid-drain (SIGKILL, no shutdown hooks, nothing flushed), the job
  * restarts from its checkpoint, and the published table must equal the
  * one-shot batch truth — the reference's retry-to-idempotent-overwrite
  * contract (dags/cloudsql_to_bigquery.py:29-30,
  * copy_cloudsql_to_bigquery_v2.py:108) exercised at the process level.
  *
  * Three phases, one per JVM, so the kill is a REAL process death rather
  * than an in-process simulation (`tools/chaos_gate.sh` drives them):
  *
  *  - `prepare <sfDir> <workDir>`: split documents into many small
  *    parquet files (one micro-batch each under maxFilesPerTrigger=1)
  *    and record the batch-truth fingerprint;
  *  - `drain <workDir> <paceMs>`: stream the file source →
  *    per-batch delta aggregate → [[pipeline.Sync.idempotentDeltaPublish]]
  *    (checkpointed, Trigger.AvailableNow). `paceMs` spaces batches out
  *    so the gate's SIGKILL lands mid-drain with committed AND
  *    uncommitted work outstanding; the resume run passes 0. The batch
  *    in flight at kill time may have published its merge without
  *    committing the checkpoint — exactly the replay the last_batch
  *    idempotence guard must absorb on restart;
  *  - `check <workDir>`: fingerprint the published table against the
  *    recorded truth (bit-identical or FAIL).
  */
object ChaosDriverRestart {

  private def fingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val row = df.select(xxhash64(cols: _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)).as("x"),
        count(lit(1)).as("n"))
      .head()
    (row.getLong(1), row.getLong(0))
  }

  private def truthOf(s: SparkSession, workDir: String): DataFrame =
    s.read.parquet(s"$workDir/in")
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("len").as("total"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: prepare|drain|check <args>")
    args(0) match {
      case "prepare" =>
        val (sfDir, workDir) = (args(1), args(2))
        val spark = Engine.session("chaos-restart-prepare", "8")
        Tables.load(spark, sfDir, "documents")
          .select(col("doc_id"),
            concat(lit("s"), col("doc_id") % 10).as("key"),
            length(col("text")).cast("long").as("len"))
          .repartition(40)
          .write.mode("overwrite").parquet(s"$workDir/in")
        val (n, h) = fingerprint(truthOf(spark, workDir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$workDir/truth.txt"), s"$n $h")
        println(s"[chaos] prepared: 40 input files, truth rows=$n hash=$h")
        spark.stop()

      case "drain" =>
        val (workDir, paceMs) = (args(1), args(2).toLong)
        val spark = Engine.session("chaos-restart-drain", "8")
        val schema = spark.read.parquet(s"$workDir/in").schema
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$workDir/in")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$workDir/ck")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val delta = batch.groupBy("key")
              .agg(count(lit(1)).as("n"), sum("len").as("total"))
            pipeline.Sync.idempotentDeltaPublish(
              delta, batchId, s"$workDir/published", "key")
            if (paceMs > 0) Thread.sleep(paceMs)
          }
          .start()
        q.awaitTermination()
        println(s"[chaos] drain complete")
        spark.stop()

      case "check" =>
        val workDir = args(1)
        val spark = Engine.session("chaos-restart-check", "8")
        val Array(n, h) = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$workDir/truth.txt")).trim.split(" ")
        val got = pipeline.Sync.readPublished(spark, s"$workDir/published")
          .map(df => fingerprint(df.select("key", "n", "total")))
        if (got.contains((n.toLong, h.toLong))) {
          println(s"[chaos] restart leg OK: published == batch truth " +
            s"(rows=$n) across a SIGKILLed driver + checkpoint resume")
        } else {
          println(s"[chaos] FAIL restart: published $got vs truth ($n,$h)")
          spark.stop()
          sys.exit(1)
        }
        spark.stop()

      case other => sys.error(s"unknown phase $other")
    }
  }
}
