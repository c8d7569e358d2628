package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, ExpressionUtils, SparkSession => CSparkSession}

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

  /** Wrap a hand-built catalyst Expression as a user-facing Column (the
    * Spark 4 column-node API hides the direct constructor) — used for
    * expressions Spark ships but does not register as SQL functions
    * (e.g. `BloomFilterMightContain`).
    */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The catalyst Expression behind a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
