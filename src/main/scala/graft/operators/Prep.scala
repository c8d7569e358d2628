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

  /** Deterministic stratified train/val/test split with exact per-block
    * proportions: rows are ranked inside (stratum, salt-block) by a
    * content-free portable hash of the id (pseudorandom but reproducible
    * anywhere), and the rank modulo 10 assigns 10% test / 10% val /
    * 80% train. Every (stratum, salt) block gets the exact ratios (±1
    * row), so each stratum is within ±`salts` rows of exact — far
    * tighter than plain hash-mod splits, whose per-stratum proportions
    * only concentrate with size.
    *
    * Scale: the window partitions on (stratum, salt), NOT the bare
    * stratum — a bare-stratum rank is one task per stratum, which a
    * 100 TB corpus with a handful of languages cannot run. The salt
    * fans each stratum out `salts`-fold (size it to the cluster's
    * parallelism); blocks are hash-uniform, so no skew.
    */
  def trainValTestSplit(df: DataFrame, idCol: String, strataCol: String,
                        salts: Int = 64): DataFrame = {
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol), pmod(h, lit(salts)))
      .orderBy(h, col(idCol))
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
