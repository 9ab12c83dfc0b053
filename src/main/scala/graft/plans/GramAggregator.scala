package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Upper-triangle Gram-matrix accumulator over quantized embedding
  * vectors — the one-pass covariance/Gram kernel under PCA, linear
  * probes, and whitening.
  *
  * Why an Aggregator and not a posexplode self-join: the join
  * formulation shuffles n·d² (vec_id, i, j, xi·xj) rows — corpus ×
  * 4096 at d = 64 — while this buffer folds each vector into a
  * d(d+1)/2-long partial (16 KiB at d = 64) that Spark merges
  * map-side, so the shuffle carries ONE partial per partition
  * regardless of corpus size: the canonical 100 TB moment-matrix
  * shape (same argument as [[TopK]]).
  *
  * Components arrive pre-quantized to scaled longs (the caller's SQL
  * projection), so every product and sum is integer-exact; the
  * accumulator holds Σ qᵢ·qⱼ, bounded by n·10⁶ at the 1e-3 quantizer —
  * exact past 10¹² rows before BIGINT overflow is a concern.
  */
case class GramUpper(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * (d + 1) / 2)

  override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
    val a = q.toArray
    var idx = 0
    var i = 0
    while (i < d) {
      val ai = a(i)
      var j = i
      while (j < d) { buf(idx) += ai * a(j); j += 1; idx += 1 }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < x.length) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    buf.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
