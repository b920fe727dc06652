package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The interval (range) join as a FIRST-CLASS Catalyst operator — the
  * second whole-operator extension next to [[AsOfJoinNode]]: INNER join
  * of an interval side (key, lo, hi) against a point side (key, t) on
  * `l.key = r.key AND l.lo <= r.t AND r.t <= l.hi`, planned as one hash
  * exchange + sort per side (EnsureRequirements, driven by the
  * `requiredChildDistribution` / `requiredChildOrdering` contracts)
  * followed by a per-partition INTERVAL SWEEP: points stream in
  * (key, t) order, intervals are admitted to an active set when their
  * `lo` passes, and an interval whose `hi` has fallen behind the
  * current point time can never match again (t only grows within a
  * key), so it is dropped on scan — O(|L| + |R| + output) per
  * partition with memory bounded by the maximum concurrent-interval
  * overlap, never the partition.
  *
  * This is what `ops.RangeJoin`'s bin-bucketed rewrite approximates
  * from pure DataFrame algebra: the native form needs NO bin-width
  * knob (the composed form degrades when interval lengths are skewed —
  * a wide outlier interval explodes into many bins), emits no
  * duplicate candidates, and runs no post-join re-filter.
  * NativeIntervalSpec proves row-parity with the bin-bucketed form and
  * the plan shape; `ev_range_native` puts it under the same DuckDB
  * inequality-join oracle as ev_range_join.
  *
  * Null semantics: SQL inner-join rules — null key/lo/hi/t never match.
  * Evaluation is interpreted (BindReferences + eval per row), the
  * AsOfJoinExec trade documented there.
  */
case class IntervalJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    lo: Expression, hi: Expression, time: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinNode]] into [[IntervalJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinNode(l, r, lk, rk, lo, hi, t) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lo, hi, t) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    lo: Expression, hi: Expression, time: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(lo, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(time, Ascending)))

  override def outputPartitioning: Partitioning = right.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val loB = BindReferences.bindReference(lo, left.output)
    val hiB = BindReferences.bindReference(hi, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val tB = BindReferences.bindReference(time, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(time.dataType)
    val out = output
    left.execute().zipPartitions(right.execute(), true) { (lIt, rIt) =>
      val lBuf = lIt.buffered
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(out, out)
      // active intervals of the CURRENT point key, admission-ordered;
      // bounded by the key's max concurrent overlap
      val active = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      var curKey: Any = null
      rIt.flatMap { r =>
        val rk = rKeyB.eval(r)
        val rt = tB.eval(r)
        if (rk == null || rt == null) Iterator.empty
        else {
          if (curKey == null || keyOrd.compare(curKey, rk) != 0) {
            active.clear()
            curKey = rk
            // point keys only grow: intervals of earlier keys are dead
            var skip = true
            while (skip && lBuf.hasNext) {
              val k = lKeyB.eval(lBuf.head)
              if (k == null || keyOrd.compare(k, rk) < 0) lBuf.next()
              else skip = false
            }
          }
          // admit intervals whose lo has passed (same key only)
          var admit = true
          while (admit && lBuf.hasNext) {
            val head = lBuf.head
            val k = lKeyB.eval(head)
            if (k == null) lBuf.next() // nulls never match
            else if (keyOrd.compare(k, rk) == 0) {
              val l = loB.eval(head)
              if (l == null) { lBuf.next() } // null lo never matches
              else if (timeOrd.compare(l, rt) <= 0) {
                // unsafe iterators reuse row objects
                active += lBuf.next().copy()
              } else admit = false
            } else admit = false
          }
          // expire intervals that ended before this point — t only
          // grows within the key, so they can never match again
          active.filterInPlace { l =>
            val h = hiB.eval(l)
            h != null && timeOrd.compare(h, rt) >= 0
          }
          val point = r.copy() // r is reused by the child iterator
          active.iterator.map(l => toUnsafe(joined(l, point)))
        }
      }
    }
  }
}

/** DataFrame-level entry point, mirroring [[NativeAsOf.asOf]]: resolves
  * the key/bound columns on the analyzed children, re-aliases on
  * expression-id collision (self-join safety), and prefixes the point
  * side's payload columns.
  */
object NativeIntervalJoin {
  import org.apache.spark.sql.GraftBridge

  def intervalJoin(intervals: DataFrame, points: DataFrame, key: String,
      lo: String, hi: String, time: String,
      prefix: String = "p_"): DataFrame = {
    val spark = intervals.sparkSession
    val lPlan = intervals.queryExecution.analyzed
    var rPlan = points.queryExecution.analyzed
    if (lPlan.output.map(_.exprId).toSet
        .intersect(rPlan.output.map(_.exprId).toSet).nonEmpty)
      rPlan = Project(rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val lk = attr(lPlan, key); val rk = attr(rPlan, key)
    val loA = attr(lPlan, lo); val hiA = attr(lPlan, hi)
    val tA = attr(rPlan, time)
    // fail at construction, not as a per-row ClassCastException inside
    // the interpreted ordering mid-sweep: the exec compares key-vs-key
    // and lo/hi-vs-time with orderings derived from ONE side's type
    def sameType(aName: String, a: Attribute, bName: String, b: Attribute): Unit =
      require(a.dataType == b.dataType,
        s"intervalJoin: $aName (${a.dataType.catalogString}) and $bName " +
          s"(${b.dataType.catalogString}) must have identical types")
    sameType(s"intervals.$key", lk, s"points.$key", rk)
    sameType(s"intervals.$lo", loA, s"points.$time", tA)
    sameType(s"intervals.$hi", hiA, s"points.$time", tA)
    val node = IntervalJoinNode(lPlan, rPlan, lk, rk, loA, hiA, tA)
    val joined = GraftBridge.ofRows(spark, node)
    val outCols = lPlan.output.map(a => GraftBridge.column(a)) ++
      rPlan.output.filterNot(_.name == key)
        .map(a => GraftBridge.column(a).as(prefix + a.name))
    joined.select(outCols: _*)
  }
}
