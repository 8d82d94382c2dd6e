package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a PLAIN inner join whose condition is an
  * equality key plus a time band —
  *
  *   `l.key = r.key AND r.t > l.t + lo AND r.t <= l.t + hi`
  *
  * — into the custom [[RangeJoinPlan]] (co-partitioned sliding-window
  * merge, O(n + m + matches) per partition). Without the rewrite
  * Catalyst plans a hash join on the key with the band as a post-join
  * FILTER: every same-key pair is materialized before the band cuts
  * it — O(Σ per-key n·m), the quadratic hot-key trap a 100 TB event
  * table cannot afford. With it, users who write the natural
  * DataFrame/SQL join get the custom operator automatically — the
  * third Catalyst extension surface (expressions: Fnv64/NfcNormalize;
  * plan+strategy: AsOf/RangeJoin; and now a `Rule[LogicalPlan]`),
  * the same optimization commercial engines ship as "range join
  * optimization".
  *
  * The trigger is deliberately CONSERVATIVE — exactly the shapes
  * whose semantics the exec implements (strict lower, inclusive
  * upper, all LongType, lo < hi, sides resolved to opposite join
  * children, no other conjuncts). Anything else is left untouched;
  * a missed rewrite is a slower plan, a wrong one is a wrong answer.
  *
  * NULL safety: an inner equality join drops NULL keys/times, but
  * [[RangeJoinExec]] reads both through `UnsafeRow.getLong` (NULL
  * reads as 0) and sorts NULLS FIRST — a NULL key would spuriously
  * match key 0 and break the merge's monotone-key invariant. When
  * any matched attribute is nullable the rewrite therefore wraps
  * each child in `Filter(IsNotNull(key) && IsNotNull(time))` —
  * semantics-preserving for THIS inner join (a NULL on either
  * column can never satisfy `=`, `<`, `<=`), and the filters then
  * push into the scans like any other predicate.
  *
  * Overflow: the original `t + delta` is whatever `Add` the user
  * wrote — under ANSI mode it RAISES on Long overflow. The exec
  * computes the band with saturating arithmetic instead
  * ([[RangeJoinExec.satAdd]]), which yields the mathematically
  * correct comparison result (a bound past Long.MaxValue is above
  * every representable time). Divergence on overflow inputs is
  * thus error-vs-correct-answer, never wraparound-vs-error.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** `t` or `t + <long literal>` over a LongType attribute. */
  private def timePlusDelta(e: Expression): Option[(Attribute, Long)] = e match {
    case a: Attribute if a.dataType == LongType => Some((a, 0L))
    case Add(a: Attribute, Literal(v: Long, LongType), _)
        if a.dataType == LongType => Some((a, v))
    case Add(Literal(v: Long, LongType), a: Attribute, _)
        if a.dataType == LongType => Some((a, v))
    case _ => None
  }

  /** Normalize a comparison into a band bound: lower bounds are the
    * STRICT `lt + lo < rt` family, upper bounds the INCLUSIVE
    * `rt <= lt + hi` family (the exec's exact semantics).
    * Returns (ltAttr, rtAttr, delta, isLower).
    */
  private def bound(cmp: Expression,
      leftOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      rightOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[(Attribute, Attribute, Long, Boolean)] = {
    def lower(l: Expression, r: Expression) = for {
      (lt, lo) <- timePlusDelta(l)
      rt <- r match { case a: Attribute if a.dataType == LongType => Some(a); case _ => None }
      if leftOut.contains(lt) && rightOut.contains(rt)
    } yield (lt, rt, lo, true)
    def upper(l: Expression, r: Expression) = for {
      rt <- l match { case a: Attribute if a.dataType == LongType => Some(a); case _ => None }
      (lt, hi) <- timePlusDelta(r)
      if leftOut.contains(lt) && rightOut.contains(rt)
    } yield (lt, rt, hi, false)
    cmp match {
      case LessThan(l, r) => lower(l, r)            // lt + lo < rt
      case GreaterThan(l, r) => lower(r, l)         // rt > lt + lo
      case LessThanOrEqual(l, r) => upper(l, r)     // rt <= lt + hi
      case GreaterThanOrEqual(l, r) => upper(r, l)  // lt + hi >= rt
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if hint == org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE =>
      val cs = conjuncts(cond)
      if (cs.length != 3) j
      else {
        val eq = cs.collectFirst {
          case EqualTo(a: Attribute, b: Attribute)
              if a.dataType == LongType && b.dataType == LongType &&
                left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
          case EqualTo(b: Attribute, a: Attribute)
              if a.dataType == LongType && b.dataType == LongType &&
                left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
        }
        val bounds = cs.flatMap(bound(_, left.outputSet, right.outputSet))
        (eq, bounds.find(_._4), bounds.find(!_._4)) match {
          case (Some((lk, rk)), Some((lt1, rt1, lo, _)), Some((lt2, rt2, hi, _)))
              if lt1.semanticEquals(lt2) && rt1.semanticEquals(rt2) && lo < hi =>
            def notNull(child: LogicalPlan, key: Attribute, time: Attribute): LogicalPlan =
              if (!key.nullable && !time.nullable) child
              else org.apache.spark.sql.catalyst.plans.logical.Filter(
                And(IsNotNull(key), IsNotNull(time)), child)
            RangeJoinPlan(notNull(left, lk, lt1), notNull(right, rk, rt1),
              lk, lt1, rk, rt1, lo, hi)
          case _ => j
        }
      }
  }

  /** Runtime installation (the `spark.experimental` twin of
    * [[GraftSessionExtensions]]'s injectOptimizerRule path).
    *
    * SESSION-GLOBAL: `spark.experimental` is shared session state,
    * so after install() the rewrite applies to every subsequent
    * query in the session (that is the point — users get the custom
    * operator from the natural join shape). The nullable-attribute
    * filter wrap above keeps that safe on arbitrary user data. Use
    * [[uninstall]] to remove it, or prefer the scoped
    * `spark.sql.extensions=graft.plans.GraftSessionExtensions`
    * config at session build.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
  }

  /** Reverse [[install]] — removes the rule (leaves the strategy,
    * which is inert without a RangeJoinPlan node to match).
    */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
}
