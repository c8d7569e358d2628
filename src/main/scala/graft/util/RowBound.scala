package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enforced row bound for frames that are about to broadcast into a
  * BroadcastNestedLoopJoin build side (cross joins against 1-row
  * totals are structurally bounded; everything else must carry THIS).
  *
  * The plan gate (`ProfMain plans`) statically accepts a BNLJ build
  * only when its lineage shows a global aggregate, an explicit limit, a
  * literal LocalTableScan — or this guard's `raise_error` filter: the
  * frame is then bounded AT RUNTIME (≤ `maxRows` or the query fails
  * loudly), which is the honest contract for frames whose bound comes
  * from data semantics (a probe id's uniqueness, a class domain, a
  * fixture's key range) rather than from plan structure. Same pattern
  * as the similarity tier's probe guard; O(rows) window over a frame
  * that is small by definition.
  */
object RowBound {

  def guard(df: DataFrame, maxRows: Long, what: String): DataFrame = {
    val all = Window.partitionBy()
    df.withColumn("_rb_n", count(lit(1)).over(all))
      .filter(when(col("_rb_n") <= maxRows, lit(true))
        .otherwise(raise_error(concat(
          lit(s"$what: broadcast-bound guard: "), col("_rb_n"),
          lit(s" rows exceed the declared bound of $maxRows — this frame " +
            "feeds a BroadcastNestedLoopJoin build side and must stay " +
            "broadcast-class")))))
      .drop("_rb_n")
  }
}
