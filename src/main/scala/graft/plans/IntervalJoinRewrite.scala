package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Attribute, EqualTo, Expression, GreaterThanOrEqual,
  LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: recognize a plain INNER equi+range join —
  * `l.key = r.key AND lo <= t AND t <= hi` with both bounds from one
  * side and the probe time from the other — and replan it as the native
  * [[IntervalJoinNode]], so a user writing ordinary DataFrame/SQL
  * inequality joins gets the per-partition interval sweep with NO API
  * change. Without this, Spark plans equi+range conditions as a
  * SortMergeJoin whose extra predicates evaluate over each key's full
  * cross product — quadratic per hot key — which is exactly the shape
  * the sweep exists to avoid.
  *
  * Deliberately conservative; the rewrite fires only when
  * - the join is INNER with no hint (a user hint = an explicit choice),
  * - the plan is batch (IntervalJoinExec has no streaming protocol),
  * - the condition splits into EXACTLY one cross-side equality and two
  *   range conjuncts forming a closed interval around one probe
  *   expression (leftovers would be droppable as a Filter, but a
  *   multi-equality join — e.g. ops.RangeJoin's own (key, bin) bucket
  *   join — must keep its equi-join plan, so anything beyond the exact
  *   shape is left untouched).
  * The original attribute order is restored with a Project when the
  * interval side is the join's right child. IntervalRewriteSpec proves
  * a spark.sql BETWEEN join plans IntervalJoinExec with identical
  * results, and that the guarded shapes (two equalities, hints,
  * half-open ranges) stay on the stock planner.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def sidesOf(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Boolean] = { // Some(true) = all refs from l, false = from r
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE)
        if !j.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      val eqs = conjuncts.collect { case e: EqualTo => e }
      // a <= b normalized to (lower, upper)
      val ranges = conjuncts.collect {
        case LessThanOrEqual(a, b) => (a, b)
        case GreaterThanOrEqual(a, b) => (b, a)
      }
      val rewritten = (eqs, ranges) match {
        case (Seq(eq), Seq(ra, rb)) if conjuncts.length == 3 =>
          tryRewrite(j, l, r, eq, ra, rb)
        case _ => None
      }
      rewritten.getOrElse(j)
  }

  private def tryRewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      eq: EqualTo, ra: (Expression, Expression),
      rb: (Expression, Expression)): Option[LogicalPlan] = {
    // the equality must span the two sides
    val keyLR = (sidesOf(eq.left, l, r), sidesOf(eq.right, l, r)) match {
      case (Some(true), Some(false)) => Some((eq.left, eq.right))
      case (Some(false), Some(true)) => Some((eq.right, eq.left))
      case _ => None
    }
    keyLR.flatMap { case (lKeyExpr, rKeyExpr) =>
      // find the shared probe expression: one range gives (lo, t), the
      // other (t, hi), t semantically equal in both
      def probe(lo: (Expression, Expression), hi: (Expression, Expression))
          : Option[(Expression, Expression, Expression)] =
        if (lo._2.semanticEquals(hi._1)) Some((lo._1, hi._2, lo._2))
        else None
      probe(ra, rb).orElse(probe(rb, ra)).flatMap { case (lo, hi, t) =>
        (sidesOf(lo, l, r), sidesOf(hi, l, r), sidesOf(t, l, r)) match {
          // interval side = left child: node output order already matches
          case (Some(true), Some(true), Some(false)) =>
            Some(IntervalJoinNode(l, r, lKeyExpr, rKeyExpr, lo, hi, t))
          // interval side = right child: build with intervals on the
          // node's left, restore the join's (l ++ r) attribute order
          case (Some(false), Some(false), Some(true)) =>
            val node = IntervalJoinNode(r, l, rKeyExpr, lKeyExpr, lo, hi, t)
            Some(Project((l.output ++ r.output).map(a => a: Attribute),
              node))
          case _ => None
        }
      }
    }
  }
}
