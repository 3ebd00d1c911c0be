package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (extension point: `injectOptimizerRule`) that
  * rewrites a plain BETWEEN join into [[IntervalJoinPlan]] — so the
  * ordinary SQL spelling
  *
  *   SELECT ... FROM points JOIN intervals ON p BETWEEN lo AND hi
  *
  * (and the equivalent DataFrame `join(..., p >= lo && p <= hi)`)
  * gets the broadcast sorted-index operator instead of Spark's
  * O(n·m) BroadcastNestedLoopJoin, with no API opt-in.
  *
  * Deliberately conservative — it fires only when ALL of:
  *  - inner join, no join hint (a user hint is an instruction);
  *  - the condition is exactly `p >= lo AND p <= hi` (either And
  *    order; SQL BETWEEN parses to this) — exclusive bounds keep
  *    their semantics and are left alone;
  *  - `p` is a LongType attribute of the left side, `lo`/`hi` are
  *    LongType attributes of the right side (the probe-side/build-
  *    side orientation the exec implements; mirrored orientation is
  *    left alone rather than re-projected);
  *  - the interval side's stats fit `autoBroadcastJoinThreshold`
  *    (the same bound a broadcast join would demand; rewrite is off
  *    when the threshold is disabled with -1).
  *
  * Everything else — range joins on |a−b| ≤ tol, equi+range mixes,
  * outer joins — passes through untouched.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] {

  private def longAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == LongType => Some(a)
    case _ => None
  }

  /** Extract (point, lo, hi) from `p >= lo && p <= hi` in either
    * conjunct order, requiring the same point attribute on both. */
  private def bounds(cond: Expression): Option[(Attribute, Attribute, Attribute)] = {
    def geq(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(p, lo) =>
        for (pa <- longAttr(p); la <- longAttr(lo)) yield (pa, la)
      case LessThanOrEqual(lo, p) =>
        for (pa <- longAttr(p); la <- longAttr(lo)) yield (pa, la)
      case _ => None
    }
    def leq(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThanOrEqual(p, hi) =>
        for (pa <- longAttr(p); ha <- longAttr(hi)) yield (pa, ha)
      case GreaterThanOrEqual(hi, p) =>
        for (pa <- longAttr(p); ha <- longAttr(hi)) yield (pa, ha)
      case _ => None
    }
    cond match {
      case And(a, b) =>
        (for ((p1, lo) <- geq(a); (p2, hi) <- leq(b) if p1.semanticEquals(p2))
          yield (p1, lo, hi)).orElse(
          for ((p1, hi) <- leq(a); (p2, lo) <- geq(b) if p1.semanticEquals(p2))
            yield (p1, lo, hi))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE) =>
      bounds(cond) match {
        case Some((p, lo, hi))
            if AttributeSet(Seq(p)).subsetOf(left.outputSet) &&
              AttributeSet(Seq(lo, hi)).subsetOf(right.outputSet) &&
              conf.autoBroadcastJoinThreshold > 0 &&
              right.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold =>
          IntervalJoinPlan(left, right, p, lo, hi)
        case _ => j
      }
  }
}
