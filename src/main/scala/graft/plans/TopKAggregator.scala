package graft.plans

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs — the
  * partial-aggregation formulation of similarity top-k.
  *
  * The window formulation (`row_number() OVER (ORDER BY sim DESC)
  * <= k`) shuffles EVERY scored candidate row to the query's reducer
  * and sorts Q·N rows; this aggregator keeps a k-bounded buffer that
  * Spark merges map-side, so the shuffle carries at most
  * k × partitions rows per query — the difference between O(Q·N) and
  * O(Q·k·P) shuffle bytes at corpus scale.
  *
  * Ordering: score descending, id ascending on ties — identical to
  * the window queries' deterministic ordering. The buffer is a plain
  * sorted array (k is small); `reduce` inserts lazily and truncates.
  */
case class TopK(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] {
      case (score, id) => (-score, id)
    }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && ord.gteq(row, buf.last)) buf
    else ((buf :+ row).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}
