package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS Catalyst operator — the (c)-tier
  * extension path: a custom `LogicalPlan` node, a `SparkStrategy` that
  * plans it, and a `SparkPlan` whose `requiredChildDistribution` /
  * `requiredChildOrdering` contracts let EnsureRequirements insert
  * exactly one hash exchange + one sort per side, after which the join
  * itself is a ZERO-allocation single-pass per-partition merge: for each
  * left row (key-clustered, (key, time)-sorted), the right cursor
  * advances while `r.key < l.key` or (`r.key == l.key` and
  * `r.time <= l.time`), carrying the last matching right row — O(|L|+|R|)
  * per partition, no pair explosion, no window state.
  *
  * Semantics match `ops.AsOfJoin.asOf` (union-and-fill) exactly — DuckDB
  * `ASOF JOIN ... ON r.t <= l.t` tie rule, left-outer nulls when no
  * prior right row — and NativeAsOfSpec proves row-identity between the
  * two forms plus the plan shape. The union-and-fill form remains the
  * default inside `queries` (it composes with pure DataFrame lineage);
  * this operator is the whole-operator extension point: same cost model
  * (one exchange + sort per side), but the merge replaces the window
  * pass, and the physical contract is explicit rather than emergent.
  *
  * Scale notes: distribution is `ClusteredDistribution` on the key, so
  * co-partitioning is planner-guaranteed (`zipPartitions` is legal);
  * SMJ-grade skew caveats apply as they do to any keyed join. Evaluation
  * is interpreted (`BindReferences` + eval) — key/time extraction per
  * row, not codegen; the house queries keep the union-and-fill form in
  * the hot path for exactly this reason.
  *
  * Null semantics: SQL join rules — a null key or null time on either
  * side never matches (right rows with nulls are skipped, left rows with
  * nulls emit null payloads).
  *
  * `leftLowerBound` (optional) is merge_asof's backward tolerance,
  * pre-lowered by [[AsOfJoinRewrite]] to a per-left-row expression of
  * the right-time's type (e.g. `cast(l.ts - interval as timestamp)`): a
  * carried match is emitted only when `r.t >= lowerBound(l)`; a null
  * bound never matches (SQL comparison semantics of the stock
  * expansion's `r.t >= l.t - tol` conjunct). The merge still carries
  * the single nearest prior row — tolerance only gates emission, so the
  * pass stays O(|L|+|R|).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftLowerBound: Option[Expression] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, lb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftLowerBound: Option[Expression] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val lBoundB = leftLowerBound.map(BindReferences.bindReference(_, left.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val out = output
    val nRight = right.output.size
    left.execute().zipPartitions(right.execute(), true) { (lIt, rIt) =>
      val rBuf = rIt.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(out, out)
      var lastKey: Any = null
      var lastTime: Any = null
      var lastRow: InternalRow = null
      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (lk != null && lt != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTimeB.eval(head)
            if (rk == null || rt == null) rBuf.next() // nulls never match
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0 || (c == 0 && timeOrd.compare(rt, lt) <= 0)) {
                val r = rBuf.next()
                lastKey = rk
                lastTime = rt
                lastRow = r.copy() // unsafe iterators reuse row objects
              } else advance = false
            }
          }
        }
        var matched = lk != null && lastRow != null &&
          keyOrd.compare(lastKey, lk) == 0
        if (matched && lBoundB.isDefined) {
          // backward tolerance: carried match must satisfy r.t >= bound;
          // a null bound never matches (stock `>=` conjunct semantics)
          val lb = lBoundB.get.eval(l)
          matched = lb != null && timeOrd.compare(lastTime, lb) >= 0
        }
        toUnsafe(joined(l, if (matched) lastRow else nullRight))
      }
    }
  }
}

/** DataFrame-level entry point: resolves key/time columns against the
  * analyzed child plans, re-aliases the right side when expression ids
  * collide (self-join safety), and returns the joined frame with the
  * right side's columns renamed `prefix<name>`. DataFrame construction
  * from the custom node goes through the two-forwarder
  * `org.apache.spark.sql.GraftBridge` shim (see its scaladoc).
  */
object NativeAsOf {
  import org.apache.spark.sql.GraftBridge

  /** `lowerBound`: optional NAME of a precomputed left column holding
    * the per-row backward-tolerance bound (e.g.
    * `.withColumn("lb", $"ts" - lit(5L))`) — typed by construction, so
    * no cross-type arithmetic happens here; matches require
    * `r.time >= lb`. The bound column still appears in the output's
    * left half (drop it afterwards if unwanted).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      prefix: String = "r_",
      lowerBound: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    var rPlan = right.queryExecution.analyzed
    if (lPlan.output.map(_.exprId).toSet
        .intersect(rPlan.output.map(_.exprId).toSet).nonEmpty)
      rPlan = Project(
        rPlan.output.map(a => Alias(a, a.name)()), rPlan)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column $name not found in ${p.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      lowerBound.map(attr(lPlan, _)))
    val joined = GraftBridge.ofRows(spark, node)
    // attribute-based projection (never by-name: both sides may share
    // column names): keep the left side as-is, drop the right key (it
    // equals the left key on matches), prefix the right payload
    val outCols = lPlan.output.map(a => GraftBridge.column(a)) ++
      rPlan.output.filterNot(_.name == key)
        .map(a => GraftBridge.column(a).as(prefix + a.name))
    joined.select(outCols: _*)
  }
}
