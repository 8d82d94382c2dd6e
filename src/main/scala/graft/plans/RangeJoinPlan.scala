package graft.plans

import scala.collection.mutable.ArrayDeque
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Interval (range/band) join as a custom Catalyst operator: emit
  * (left, right) pairs with equal keys and
  * `leftTime + lowDelta < rightTime <= leftTime + highDelta`.
  *
  * Physical plan: co-partition on key, sort both sides by (key, time)
  * (EnsureRequirements inserts both), then a partition-local sliding
  * window merge — each right row is buffered at most once and each
  * pair is emitted exactly once, so the cost is O(n + m + matches)
  * per partition with O(window) memory. This is the plan a band join
  * deserves at 100 TB; the composable alternative (time-bucket
  * equality join + filter, [[graft.operators.AsOf.rangeJoin]])
  * re-reads each row from up to two buckets.
  *
  * Key and time expressions must be LongType.
  */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    lowDelta: Long, highDelta: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: RangeJoinPlan =>
      RangeJoinExec(planLater(p.left), planLater(p.right), p.leftKey,
        p.leftTime, p.rightKey, p.rightTime, p.lowDelta, p.highDelta) :: Nil
    case _ => Nil
  }
}

case class RangeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    lowDelta: Long, highDelta: Long) extends BinaryExecNode {

  import RangeJoinExec.satAdd

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKey, lTime, rKey, rTime) = (leftKey, leftTime, rightKey, rightTime)
    val (lo, hi) = (lowDelta, highDelta)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow

      // buffered right rows of the current key window: (time, row copy)
      val window = new ArrayDeque[(Long, UnsafeRow)]()
      var rHasCur = false
      var rCurKey = 0L
      var rCurTime = 0L
      var rCurRow: InternalRow = null

      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rCurRow = rIter.next()
          val kv = rProj(rCurRow)
          rCurKey = kv.getLong(0); rCurTime = kv.getLong(1); rHasCur = true
        } else rHasCur = false
      advanceRight()

      var lastKey = Long.MinValue
      lIter.flatMap { lRow =>
        val kv = lProj(lRow)
        val k = kv.getLong(0)
        val t = kv.getLong(1)
        if (k != lastKey) { window.clear(); lastKey = k }
        val tLo = satAdd(t, lo)
        val tHi = satAdd(t, hi)
        // evict rights at or below the window's low bound
        while (window.nonEmpty && window.head._1 <= tLo) window.removeHead()
        // pull rights up to the high bound (dropping other-key rows)
        while (rHasCur && (rCurKey < k || (rCurKey == k && rCurTime <= tHi))) {
          if (rCurKey == k && rCurTime > tLo)
            window.append((rCurTime, rProjCopy(rCurRow)))
          advanceRight()
        }
        val lCopy = lRow.copy()
        window.iterator.map { case (_, rRow) => resultProj(joined(lCopy, rRow)) }
      }
    }
  }

  private def rProjCopy(row: InternalRow): UnsafeRow =
    row.asInstanceOf[UnsafeRow].copy()

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinExec {
  /** Saturating Long add: `t + delta` clamped to [Long.Min, Long.Max].
    * A band bound past either end of the representable range compares
    * the way the true (unbounded-integer) bound would — above every
    * time / below every time — so band membership stays mathematically
    * correct on inputs where plain `+` would wrap (and ANSI `+` would
    * raise). See [[BandJoinRewrite]]'s overflow note.
    */
  def satAdd(t: Long, delta: Long): Long = {
    val s = t + delta
    // overflow iff operands share a sign and the sum flipped it
    if (((t ^ s) & (delta ^ s)) < 0L)
      if (delta > 0L) Long.MaxValue else Long.MinValue
    else s
  }
}

object RangeJoin {
  /** Column-API entry mirroring [[AsOfJoin.asofJoin]]. */
  def rangeJoin(left: DataFrame, lKey: Column, lTime: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      lowDelta: Long, highDelta: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    val (lk, lt) = AsOfJoin.resolvePair(left, lKey, lTime)
    val (rk, rt) = AsOfJoin.resolvePair(right, rKey, rTime)
    GraftBridge.ofRows(spark, RangeJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      lk, lt, rk, rt, lowDelta, highDelta))
  }
}
