package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class Catalyst operator — the custom
  * LogicalPlan + Strategy + physical-exec extension point (SURVEY.md
  * §4 `graft.plans`): for each left row, the greatest right `time`
  * at-or-before the left `time` within the same `key` (inner
  * semantics — unmatched left rows are dropped).
  *
  * Physical execution is a partition-local streaming merge: the node
  * declares hash distribution on the keys and (key, time) ordering
  * for both children, so `EnsureRequirements` inserts the exchanges
  * and sorts — then each partition pair is merged in one pass with
  * O(1) state (the current right key/time). No pair blow-up, no
  * window buffering: strictly better than the union+window
  * composition in [[graft.operators.AsOf]] when the right side is
  * wide, and the same one-shuffle cost.
  *
  * Key and time expressions must be LongType (e.g. `unix_micros`).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    matchedAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTime, p.rightKey, p.rightTime, p.matchedAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    matchedAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey
    val lTime = leftTime
    val rKey = rightKey
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut :+ outAttrs.last)
      val matchedRow = new GenericInternalRow(1)
      val joined = new JoinedRow

      var rHasCur = false
      var rCurKey = 0L
      var rCurTime = 0L
      // last right (key, time) already consumed, per running key
      var lastKey = 0L
      var lastTime = 0L
      var hasLast = false

      def advanceRight(): Unit = {
        if (rIter.hasNext) {
          val kv = rProj(rIter.next())
          rCurKey = kv.getLong(0); rCurTime = kv.getLong(1); rHasCur = true
        } else rHasCur = false
      }
      advanceRight()

      lIter.flatMap { lRow =>
        val kv = lProj(lRow)
        val k = kv.getLong(0)
        val t = kv.getLong(1)
        // consume right rows up to (k, t)
        while (rHasCur && (rCurKey < k || (rCurKey == k && rCurTime <= t))) {
          if (rCurKey != lastKey) hasLast = false
          lastKey = rCurKey; lastTime = rCurTime; hasLast = true
          advanceRight()
        }
        if (hasLast && lastKey == k) {
          matchedRow.setLong(0, lastTime)
          Iterator.single(resultProj(joined(lRow, matchedRow)))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Column-API entry: left rows gain `matchedName` = greatest right
    * time (micros) at-or-before their own time per key. Installs the
    * planner strategy on first use (`spark.experimental` — the
    * runtime-registration twin of `SparkSessionExtensions
    * .injectPlannerStrategy`, see [[GraftSessionExtensions]]).
    */
  /** Resolve (key, time) Columns against a child by analyzing a
    * throwaway projection — Spark 4's opaque Column nodes are only
    * converted inside known operators, so a custom logical node must
    * receive already-resolved expressions.
    */
  private[plans] def resolvePair(df: DataFrame, a: Column, b: Column): (Expression, Expression) = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val pl = df.select(a, b).queryExecution.analyzed.asInstanceOf[Project].projectList
    def unwrap(e: Expression): Expression = e match {
      case al: Alias => al.child
      case other => other
    }
    (unwrap(pl(0)), unwrap(pl(1)))
  }

  def asofJoin(left: DataFrame, lKey: Column, lTime: Column,
      right: DataFrame, rKey: Column, rTime: Column,
      matchedName: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    val attr = AttributeReference(matchedName, LongType, nullable = false)()
    val (lk, lt) = resolvePair(left, lKey, lTime)
    val (rk, rt) = resolvePair(right, rKey, rTime)
    GraftBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      lk, lt, rk, rt, attr))
  }
}

/** Deployment-time registration for clusters where the session is
  * built once: `spark.sql.extensions=graft.plans.GraftSessionExtensions`.
  */
class GraftSessionExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfStrategy)
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
    e.injectOptimizerRule(_ => BandJoinRewrite)
  }
}
