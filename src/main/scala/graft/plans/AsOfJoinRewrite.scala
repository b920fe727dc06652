package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, CreateStruct, EqualTo, Expression, GetStructField,
  GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual,
  Subtract, SubtractDates, SubtractTimestamps}
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
  * - the as-of condition is a single time comparison in either
  *   direction — backward `l.t >= r.t` (merge_asof's default) or
  *   forward `l.t <= r.t`, the probe time from the left child —
  *   inclusive or STRICT (`>` / `<`, allow_exact_matches=False; strict
  *   semantics are exact, unlike nearest, so the merge implements
  *   them), either bare or AND-ed with the direction's tolerance bound
  *   (backward: `r.t >= l.t - tol`, a lower bound; forward:
  *   `r.t <= l.t + tol`, an upper bound; strict probes pair with
  *   strict bounds — merge_asof emits them together), whose bound side
  *   reaches us already coerced (for timestamps,
  *   `cast(ts ± interval as timestamp)`) and is carried opaquely into
  *   [[AsOfJoinExec]] as a per-left-row bound (same dataType as `r.t`,
  *   references only the left side). A tolerance assertion must be
  *   constant-foldable to true (merge_asof tolerances are literals; a
  *   non-positive or non-constant one keeps stock, which raises the
  *   stock error). Nearest shapes stay stock — nearest's equidistant
  *   tie is implementation-arbitrary in the stock expansion, so there
  *   is nothing exact to replicate;
  * - the order expression is the stock ordering for the direction —
  *   `l.t - r.t` backward, `r.t - l.t` forward — in any of its
  *   analyzer-coerced spellings (`Subtract`, `SubtractTimestamps`,
  *   `SubtractDates`); anything else means semantics this node doesn't
  *   have;
  * - the `by` condition is a conjunction of cross-side equalities with
  *   equal key types (merge_asof's by=[k1, k2, …]); several keys
  *   compose into one null-guarded struct key
  *   ([[AsOfJoinNode.structKey]] — the guard preserves the
  *   conjunction's per-field null semantics). Any non-equality
  *   conjunct keeps stock, and the two time types must match
  *   ([[AsOfJoinExec]] derives one interpreted ordering per pair).
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
    // the probe, either direction, inclusive OR strict: backward is
    // l.t >= r.t (merge_asof default) or l.t > r.t
    // (allow_exact_matches=False); forward is l.t <= r.t or l.t < r.t
    // (each in both comparison spellings — the sides decide which
    // direction a spelling means), optionally AND-ed with the tolerance
    // bound (backward: r.t >= l.t - tol, a lower bound; forward:
    // r.t <= l.t + tol, an upper — both strict when the probe is).
    // Bounds are kept opaque — any left-side expression of r.t's type
    // works as the exec's per-row bound. Probe tuple:
    // (leftTime, rightTime, forward, strict).
    def probe(e: Expression)
        : Option[(Expression, Expression, Boolean, Boolean)] =
      e match {
        case GreaterThanOrEqual(lt, rt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, false, false))
        case LessThanOrEqual(rt, lt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, false, false))
        case LessThanOrEqual(lt, rt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, true, false))
        case GreaterThanOrEqual(rt, lt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, true, false))
        case GreaterThan(lt, rt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, false, true))
        case LessThan(rt, lt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, false, true))
        case LessThan(lt, rt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, true, true))
        case GreaterThan(rt, lt)
            if fromOnly(lt, l) && fromOnly(rt, r) =>
          Some((lt, rt, true, true))
        case _ => None
      }
    // bound conjunct → (rightTime, bound, boundIsUpper, boundIsStrict)
    def bound(e: Expression)
        : Option[(Expression, Expression, Boolean, Boolean)] =
      e match {
        case GreaterThanOrEqual(rt2, b) if fromOnly(b, l) =>
          Some((rt2, b, false, false)) // r.t >= b: lower bound
        case LessThanOrEqual(b, rt2) if fromOnly(b, l) =>
          Some((rt2, b, false, false))
        case LessThanOrEqual(rt2, b) if fromOnly(b, l) =>
          Some((rt2, b, true, false)) // r.t <= b: upper bound
        case GreaterThanOrEqual(b, rt2) if fromOnly(b, l) =>
          Some((rt2, b, true, false))
        case GreaterThan(rt2, b) if fromOnly(b, l) =>
          Some((rt2, b, false, true)) // r.t > b: strict lower
        case LessThan(b, rt2) if fromOnly(b, l) =>
          Some((rt2, b, false, true))
        case LessThan(rt2, b) if fromOnly(b, l) =>
          Some((rt2, b, true, true)) // r.t < b: strict upper
        case GreaterThan(b, rt2) if fromOnly(b, l) =>
          Some((rt2, b, true, true))
        case _ => None
      }
    val shapes: Option[(Expression, Expression, Option[Expression],
        Boolean, Boolean)] =
      asOfCond match {
        case And(base, conj) =>
          for {
            (lt, rt, fwd, strict) <- probe(base)
            (rt2, b, isUpper, bStrict) <- bound(conj)
            // a backward probe pairs with a lower bound, forward with an
            // upper, and the bound's strictness follows the probe's
            // (merge_asof emits them together); a mismatched pair is
            // not a merge_asof shape
            if isUpper == fwd && bStrict == strict &&
              rt2.semanticEquals(rt) && b.dataType == rt.dataType
          } yield (lt, rt, Some(b), fwd, strict)
        case other => probe(other).map { case (lt, rt, fwd, strict) =>
          (lt, rt, None, fwd, strict)
        }
      }
    shapes.flatMap { case (lt, rt, timeBound, fwd, strict) =>
      // the `by` condition: one or more cross-side equalities (merge_asof
      // with by=[k1, k2, …] builds their conjunction). Several keys
      // compose into one null-guarded struct (AsOfJoinNode.structKey) —
      // positional field names make both sides' types equal, and the
      // guard preserves the conjunction's null semantics. Any
      // non-equality conjunct keeps stock.
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(a, b) => conjuncts(a) ++ conjuncts(b)
        case other => Seq(other)
      }
      val pairs = conjuncts(cond).map {
        case EqualTo(a, b) if fromOnly(a, l) && fromOnly(b, r) &&
          a.dataType == b.dataType => Some((a, b))
        case EqualTo(a, b) if fromOnly(b, l) && fromOnly(a, r) &&
          a.dataType == b.dataType => Some((b, a))
        case _ => None
      }
      val keys =
        if (pairs.nonEmpty && pairs.forall(_.isDefined))
          Some((AsOfJoinNode.structKey(pairs.flatten.map(_._1)),
            AsOfJoinNode.structKey(pairs.flatten.map(_._2))))
        else None
      keys.flatMap { case (lk, rk) =>
        val typesOk = lk.dataType == rk.dataType && lt.dataType == rt.dataType
        // the stock ordering for the direction — `l.t - r.t` backward,
        // `r.t - l.t` forward — in any of the analyzer's coerced
        // spellings, and nothing else. An ambiguous probe (a comparison
        // shape both directions could produce never is: the operand
        // sides pin it) is further confirmed here, since the ordering
        // names the direction a second time.
        val (ordA, ordB) = if (fwd) (rt, lt) else (lt, rt)
        val ordOk = ord match {
          case Subtract(a, b, _) =>
            a.semanticEquals(ordA) && b.semanticEquals(ordB)
          case st: SubtractTimestamps =>
            st.left.semanticEquals(ordA) && st.right.semanticEquals(ordB)
          case sd: SubtractDates =>
            sd.left.semanticEquals(ordA) && sd.right.semanticEquals(ordB)
          case _ => false
        }
        if (!typesOk || !ordOk) None
        else {
          val node =
            AsOfJoinNode(l, r, lk, rk, lt, rt, timeBound, fwd, strict)
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
