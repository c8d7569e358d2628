package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-level deletes as DELETION-VECTOR sidecars with merge-on-read —
  * the modern lakehouse delete path (Delta deletion vectors / Iceberg
  * v2 position deletes, re-expressed by KEY over the engine's published
  * parquet layout; the reference's own delete story is the full
  * overwrite its `WRITE_TRUNCATE` loads imply,
  * `dags/cloudsql_to_bigquery.py:238-249`).
  *
  * Why a sidecar: [[graft.operators.PipelineQueries.a40GdprDelete]]'s
  * copy-on-write rewrite is O(table) per delete batch — correct, and
  * the right call for a big purge — but a steady drip of small deletes
  * (GDPR erasure queues, CDC tombstones) wants O(deleted) writes. A
  * delete batch here writes ONLY its key set under `_deletes/dv-N/`;
  * the base files are never touched (checked by [[baseFingerprint]] —
  * byte-identical base after any number of delete batches). Readers
  * merge on read: base LEFT ANTI JOIN the union of sidecars.
  * [[compact]] folds the sidecars into a rewritten base (one O(table)
  * pass amortized over many O(deleted) batches) and retires them.
  *
  * Scale shape: the anti-join shuffles on the key — or broadcasts,
  * since deletion vectors are small relative to base BY DESIGN (a DV
  * that grows toward base size is exactly when [[compact]] should run;
  * AQE makes that call at runtime). No driver-side state anywhere.
  */
object DeletionVectors {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def publishBase(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(s"$path/base")

  /** One delete batch: O(|keys|) bytes written, base untouched. The
    * sidecar index is the count of existing `dv-*` dirs — batches are
    * append-only and a re-run of the same batch id overwrites it
    * (idempotent retry, the [[Sync]] discipline).
    */
  def addDeletes(spark: SparkSession, path: String, keys: DataFrame,
                 keyCol: String): Int = {
    val f = fs(spark, path)
    val root = new Path(s"$path/_deletes")
    val n =
      if (!f.exists(root)) 0
      else f.listStatus(root).count(_.getPath.getName.startsWith("dv-"))
    keys.select(col(keyCol)).distinct()
      .write.mode("overwrite").parquet(s"$path/_deletes/dv-$n")
    n
  }

  /** Merge-on-read: base minus every sidecar's keys. With no sidecars
    * this is the plain base scan — the read path never branches on
    * "has deletes" beyond a directory listing.
    */
  def readMor(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val base = spark.read.parquet(s"$path/base")
    val f = fs(spark, path)
    val root = new Path(s"$path/_deletes")
    val dvs =
      if (!f.exists(root)) Nil
      else f.listStatus(root).map(_.getPath.toString)
        .filter(_.contains("dv-")).sorted.toSeq
    if (dvs.isEmpty) base
    else {
      val deleted = spark.read.parquet(dvs: _*).distinct()
      base.join(deleted, Seq(keyCol), "left_anti")
    }
  }

  /** Fold the sidecars into the base: one rewrite amortizing every
    * delete batch since the last compaction, then retire the sidecars.
    * After compact, [[readMor]] degenerates to the plain scan.
    */
  def compact(spark: SparkSession, path: String, keyCol: String): Unit = {
    // EAGER by necessity (exempt from the repo-wide lazy-barrier
    // convention): the merged view must be fully materialized BEFORE the
    // overwrite below rewrites the very base files it reads
    val merged = readMor(spark, path, keyCol).localCheckpoint(true)
    merged.write.mode("overwrite").parquet(s"$path/base")
    val f = fs(spark, path)
    f.delete(new Path(s"$path/_deletes"), true)
  }

  /** (name, length) of every base data file — the "deletes never touch
    * base" invariant made checkable.
    */
  def baseFingerprint(spark: SparkSession, path: String): Seq[(String, Long)] =
    fs(spark, path).listStatus(new Path(s"$path/base"))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(st => (st.getPath.getName, st.getLen)).toSeq.sorted
}
