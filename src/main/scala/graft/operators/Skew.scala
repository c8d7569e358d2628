package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * [[graft.Engine.session]]), which re-plans oversized partitions at stage
  * boundaries. [[saltedJoin]] is the explicit fallback for the cases AQE
  * can't fix — e.g. one pathological key receiving most of the data in a
  * non-splittable aggregation-feeding join: the skewed (left) side gets a
  * random-ish salt derived deterministically from a row id, the small
  * (right) side is replicated `salts`×, and the join key becomes
  * (key, salt) — spreading one hot key over `salts` reducers.
  */
object Skew {

  /** Inner equi-join with the left side salted and the right side
    * replicated. `leftIdCol` seeds the salt deterministically (no
    * Math.random — reruns produce identical partitioning).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftIdCol: String, salts: Int = 8): DataFrame = {
    require(salts >= 1)
    val salted = left.withColumn("g_salt",
      pmod(xxhash64(col(leftIdCol)), lit(salts)).cast("int"))
    val replicated = right
      .withColumn("g_salt", explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "g_salt")).drop("g_salt")
  }
}
