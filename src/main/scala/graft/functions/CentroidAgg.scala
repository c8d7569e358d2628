package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of a vector column — a typed `Aggregator` UDAF
  * (SURVEY §2.D). This is the training step of an IVF coarse quantizer:
  * per-label centroids that [[graft.operators.Similarity]]'s bucketed
  * search can probe instead of the full corpus.
  *
  * Partial aggregation works exactly like built-in sums: per-partition
  * (sums, count) buffers merge associatively, so the 100 TB path is one
  * map-side combine + one shuffle of 64-double buffers per group.
  */
case class CentroidBuffer(sums: Array[Double], n: Long)

object CentroidAgg extends Aggregator[Seq[Double], CentroidBuffer, Seq[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(Array.emptyDoubleArray, 0L)

  override def reduce(b: CentroidBuffer, v: Seq[Double]): CentroidBuffer = {
    if (v == null) return b
    val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    CentroidBuffer(sums, b.n + 1)
  }

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    if (a.sums.isEmpty) return b
    if (b.sums.isEmpty) return a
    val sums = a.sums.clone()
    var i = 0
    while (i < sums.length && i < b.sums.length) { sums(i) += b.sums(i); i += 1 }
    CentroidBuffer(sums, a.n + b.n)
  }

  override def finish(r: CentroidBuffer): Seq[Double] =
    if (r.n == 0) Seq.empty else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
