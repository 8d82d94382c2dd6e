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

/** Bounded bottom-k over INTEGER keys — [[TopKAgg]]'s exact-order
  * sibling for hash-rank sampling (operators/Sampling.scala): keeps
  * the k smallest (key, id) pairs in O(k) state with map-side
  * partial aggregation. Integer keys, not Double: a 60-bit hash
  * rank does not survive a 53-bit mantissa, and sampling ranks must
  * compare EXACTLY (the oracle does). The natural tuple order
  * (key asc, id asc) is the sample's tiebreak. Merge is order-free,
  * which is what lets the same aggregator run as streaming state
  * (s20): the streamed sample provably equals the batch sample.
  */
class BottomKAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  override def zero: Seq[(Long, Long)] = Vector.empty

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] = s.sorted.take(k)

  override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] =
    trim(buf :+ row)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = trim(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
