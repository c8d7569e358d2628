package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Narrow access bridge into Spark's `private[sql]` plan constructors.
  *
  * Extension libraries that add whole logical operators (graft's native
  * as-of join, [[graft.plans.AsOfJoinPlan]]) must wrap a hand-built
  * `LogicalPlan` back into a `DataFrame`; the only constructor,
  * `Dataset.ofRows`, is `private[sql]`, so this one-object subpackage of
  * `org.apache.spark.sql` re-exports it. Nothing else from the private
  * surface is exposed.
  */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** The analyzed plan of a DataFrame (resolved attributes, ready to be a
    * child of a custom node).
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed
}
