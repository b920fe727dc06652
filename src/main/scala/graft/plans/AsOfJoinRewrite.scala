package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, CreateStruct, EqualTo, Expression, GetStructField,
  GreaterThanOrEqual, IsNotNull, LessThanOrEqual, Subtract, SubtractDates,
  SubtractTimestamps}
import org.apache.spark.sql.catalyst.expressions.aggregate.MinBy
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, AsOfJoin, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer post-hoc rule: replan Spark's own `logical.AsOfJoin` — the
  * node `pandas-on-Spark`'s `merge_asof` builds — onto [[AsOfJoinNode]],
  * the companion to [[IntervalJoinRewrite]] (which catches the plain
  * BETWEEN join the same way this catches the stock as-of shape).
  *
  * Stock Spark has no as-of physical operator: the optimizer's
  * Finish-Analysis batch (`RewriteAsOfJoin`) expands the node into
  *
  *   Project(l.output ++ fields of __nearest_right)
  *     [Filter(IsNotNull(__nearest_right))   — Inner only]
  *       Aggregate(l.output, l.output :+ min_by(struct(r.*), lt - rt),
  *         Join(l, r, LeftOuter, l.key = r.key AND r.t <= l.t))
  *
  * whose inner join materializes EVERY (left row × prior right row)
  * pair — quadratic per hot key, the exact shape [[AsOfJoinExec]]'s
  * single-pass merge exists to avoid. This rule runs at analyzer
  * post-hoc resolution — BEFORE the optimizer, which is what makes
  * preempting a Finish-Analysis rule possible at all (injected
  * optimizer rules run after it) — and emits the SAME skeleton with the
  * pair join replaced by the native node, which feeds the aggregate one
  * pre-matched row per left row:
  *
  *   Project(identical, original exprIds preserved)
  *     [Filter(IsNotNull(__nearest_right))   — Inner only]
  *       Aggregate(identical min_by skeleton,
  *         AsOfJoinNode(l, r, key, key, l.t, r.t))
  *
  * The aggregate is kept (not just a Project off the node) because the
  * stock expansion groups by `l.output`, collapsing duplicate left rows
  * — reproducing that grouping is what makes the rewrite result-
  * identical rather than merely similar; on unique lefts it degenerates
  * to a by-construction-singleton group per row. min_by's tie choice
  * among equal `r.t` is implementation-arbitrary in stock Spark and
  * stays arbitrary here (one row per group reaches it, pre-tie-broken
  * by the merge's last-in-sort-order rule).
  *
  * Deliberately conservative, the [[IntervalJoinRewrite]] guard
  * discipline; fires only when
  * - the node is resolved, batch, and joinType is Inner or LeftOuter;
  * - the as-of condition is backward-inclusive — `l.t >= r.t` with the
  *   probe time from the left child (merge_asof's default
  *   direction='backward', allow_exact_matches=True) — either bare or
  *   AND-ed with the backward-tolerance bound `r.t >= (l.t - tol)`,
  *   whose right side reaches us already coerced (for timestamps,
  *   `cast(ts - interval as timestamp)`) and is carried opaquely into
  *   [[AsOfJoinExec]] as a per-left-row lower bound (same dataType as
  *   `r.t`, references only the left side). A tolerance assertion must
  *   be constant-foldable to true (merge_asof tolerances are literals;
  *   a non-positive or non-constant one keeps stock, which raises the
  *   stock error). Forward/nearest/strict shapes stay stock;
  * - the order expression is the stock backward ordering `l.t - r.t` in
  *   any of its analyzer-coerced spellings — `Subtract` (numerics),
  *   `SubtractTimestamps`, `SubtractDates` — anything else means
  *   semantics this node doesn't have;
  * - the `by` condition is exactly ONE cross-side equality with equal
  *   key types, and the two time types match ([[AsOfJoinExec]] derives
  *   one interpreted ordering per pair; multi-key bys keep stock).
  * AsOfRewriteSpec proves plan shape, row-parity with the stock
  * expansion's semantics (duplicate-left collapse included), and that
  * every guarded shape stays on the stock path.
  */
object AsOfJoinRewrite extends Rule[LogicalPlan] {

  private def fromOnly(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ AsOfJoin(l, r, asOfCond, Some(cond), jt, ord, tolAssert)
        if j.resolved && !j.isStreaming && supported(jt) &&
          assertionHolds(tolAssert) =>
      rewrite(l, r, asOfCond, cond, jt, ord).getOrElse(j)
  }

  private def supported(jt: JoinType): Boolean =
    jt == Inner || jt == LeftOuter

  /** No assertion, or a constant one that evaluates to true (the
    * `tolerance >= 0` check merge_asof attaches for literal tolerances).
    * Anything non-foldable/false/failing keeps the stock path, which
    * carries the stock runtime error behavior.
    */
  private def assertionHolds(tolAssert: Option[Expression]): Boolean =
    tolAssert match {
      case None => true
      case Some(a) =>
        a.foldable && Try(a.eval()).toOption.contains(true)
    }

  private def rewrite(l: LogicalPlan, r: LogicalPlan, asOfCond: Expression,
      cond: Expression, jt: JoinType, ord: Expression): Option[LogicalPlan] = {
    // backward-inclusive probe: l.t >= r.t (either comparison spelling),
    // optionally AND-ed with the backward-tolerance bound
    // r.t >= (l.t - tol); the bound is kept opaque — any left-side
    // expression of r.t's type works as the exec's per-row lower bound.
    def probe(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(lt, rt)
          if fromOnly(lt, l) && fromOnly(rt, r) => Some((lt, rt))
      case LessThanOrEqual(rt, lt)
          if fromOnly(lt, l) && fromOnly(rt, r) => Some((lt, rt))
      case _ => None
    }
    val shapes: Option[(Expression, Expression, Option[Expression])] =
      asOfCond match {
        case And(base, GreaterThanOrEqual(rt2, lb))
            if fromOnly(lb, l) =>
          probe(base).collect {
            case (lt, rt) if rt2.semanticEquals(rt) &&
              lb.dataType == rt.dataType => (lt, rt, Some(lb))
          }
        case And(base, LessThanOrEqual(lb, rt2))
            if fromOnly(lb, l) =>
          probe(base).collect {
            case (lt, rt) if rt2.semanticEquals(rt) &&
              lb.dataType == rt.dataType => (lt, rt, Some(lb))
          }
        case other => probe(other).map { case (lt, rt) => (lt, rt, None) }
      }
    shapes.flatMap { case (lt, rt, lowerBound) =>
      val keys = cond match {
        case EqualTo(a, b) if fromOnly(a, l) && fromOnly(b, r) => Some((a, b))
        case EqualTo(a, b) if fromOnly(b, l) && fromOnly(a, r) => Some((b, a))
        case _ => None
      }
      keys.flatMap { case (lk, rk) =>
        val typesOk = lk.dataType == rk.dataType && lt.dataType == rt.dataType
        // the stock backward ordering `l.t - r.t`, in any of the
        // analyzer's coerced spellings, and nothing else
        val ordOk = ord match {
          case Subtract(a, b, _) => a.semanticEquals(lt) && b.semanticEquals(rt)
          case st: SubtractTimestamps =>
            st.left.semanticEquals(lt) && st.right.semanticEquals(rt)
          case sd: SubtractDates =>
            sd.left.semanticEquals(lt) && sd.right.semanticEquals(rt)
          case _ => false
        }
        if (!typesOk || !ordOk) None
        else {
          val node = AsOfJoinNode(l, r, lk, rk, lt, rt, lowerBound)
          val nearest = Alias(
            MinBy(CreateStruct(r.output.map(a => a: Expression)), ord)
              .toAggregateExpression(), "__nearest_right")()
          val agg = Aggregate(l.output, l.output :+ nearest, node)
          val nearestRef = nearest.toAttribute
          val base: LogicalPlan =
            if (jt == Inner) Filter(IsNotNull(nearestRef), agg) else agg
          val rightCols = r.output.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(nearestRef, i, Some(a.name)), a.name)(
              exprId = a.exprId)
          }
          Some(Project(l.output.map(a => a: Attribute) ++ rightCols, base))
        }
      }
    }
  }
}
