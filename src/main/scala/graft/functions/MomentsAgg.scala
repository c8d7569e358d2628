package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** First + second moment sums of an integer-quantized vector column in
  * ONE aggregation buffer — the sufficient-statistics pass behind
  * [[graft.operators.Pca]], replacing its former `posexplode×posexplode`
  * formulation: that plan materialized d² = 4096 rows per input row
  * before the map-side combine; this buffer does the identical
  * arithmetic in-place, so the scan emits NOTHING per row and the
  * shuffle carries one (d² + d + 1)-long buffer per partition.
  *
  * Exactness contract (the [[graft.operators.Pca]] oracle contract):
  * every sum is EXACT 64-bit integer arithmetic, order-independent
  * across partitions. Where the former plan's distributed sums failed
  * loudly on overflow via ANSI mode, this buffer uses
  * addExact/multiplyExact — an over-bound corpus still raises instead
  * of drifting silently.
  *
  * The buffer is ~33 KB at d = 64 (4161 longs); partial merges are
  * element-wise adds, associative like any built-in sum.
  */
case class MomentsBuffer(n: Long, s: Array[Long], ss: Array[Long])

class MomentsAgg(dims: Int)
    extends Aggregator[Seq[Long], MomentsBuffer, MomentsBuffer] {

  override def zero: MomentsBuffer =
    MomentsBuffer(0L, new Array[Long](dims), new Array[Long](dims * dims))

  override def reduce(b: MomentsBuffer, v: Seq[Long]): MomentsBuffer = {
    if (v == null) return b
    require(v.length == dims,
      s"MomentsAgg(dims = $dims) fed a ${v.length}-long vector")
    val arr = v.toArray
    var i = 0
    while (i < dims) {
      val ei = arr(i)
      b.s(i) = Math.addExact(b.s(i), ei)
      val rowBase = i * dims
      var j = 0
      while (j < dims) {
        b.ss(rowBase + j) =
          Math.addExact(b.ss(rowBase + j), Math.multiplyExact(ei, arr(j)))
        j += 1
      }
      i += 1
    }
    MomentsBuffer(b.n + 1, b.s, b.ss)
  }

  override def merge(a: MomentsBuffer, b: MomentsBuffer): MomentsBuffer = {
    var i = 0
    while (i < dims) { a.s(i) = Math.addExact(a.s(i), b.s(i)); i += 1 }
    i = 0
    val d2 = dims * dims
    while (i < d2) { a.ss(i) = Math.addExact(a.ss(i), b.ss(i)); i += 1 }
    MomentsBuffer(a.n + b.n, a.s, a.ss)
  }

  override def finish(r: MomentsBuffer): MomentsBuffer = r

  override def bufferEncoder: Encoder[MomentsBuffer] = Encoders.product
  override def outputEncoder: Encoder[MomentsBuffer] = Encoders.product
}
