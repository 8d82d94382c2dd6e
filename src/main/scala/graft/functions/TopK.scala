package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (the third Catalyst
  * extension surface next to the `Fnv64` Expression and the
  * `AsOfJoinPlan` operator): keeps the k largest (score, id) pairs
  * per group in O(k) state with map-side partial aggregation — at
  * scale this replaces the window+rank top-k, which must shuffle and
  * sort *every* row of a group before discarding all but k.
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (score, id) => (-score, id) }.take(k)

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ row)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
