package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators for training pipelines.
  *
  * The reference ships data TO a warehouse (reference README.md:1-8); a
  * training pipeline additionally needs the warehouse-side prep steps.
  * Everything here is deterministic and engine-portable (the
  * [[Hashing.md5Long]] hash), so an external system can reproduce — and
  * audit — exactly which rows landed in which split.
  */
object Prep {

  /** Deterministic stratified train/val/test split with EXACT per-stratum
    * proportions: rows are ranked inside their stratum by a content-free
    * portable hash of the id (so the order is pseudorandom but
    * reproducible anywhere), and the rank modulo 10 assigns
    * 10% test / 10% val / 80% train — every stratum gets the exact
    * ratios (±1 row), unlike plain hash-mod splits whose per-stratum
    * proportions only concentrate with size.
    *
    * Scale: one window shuffle on the stratum key. Skewed strata are fine
    * (rank is a streaming window function); if a single stratum exceeds a
    * partition, pre-salt the rank and re-rank per salt block.
    */
  def trainValTestSplit(df: DataFrame, idCol: String,
                        strataCol: String): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(Hashing.md5Long(col(idCol).cast("string")), col(idCol))
    val slot = (row_number().over(w) - 1) % 10
    df.select(col(idCol), col(strataCol),
      when(slot === 0, "test").when(slot === 1, "val")
        .otherwise("train").as("split"))
  }

  /** Split sizes per stratum — the audit view of [[trainValTestSplit]]. */
  def splitSummary(assigned: DataFrame, strataCol: String): DataFrame =
    assigned.groupBy(col(strataCol), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(strataCol, "split")
}
