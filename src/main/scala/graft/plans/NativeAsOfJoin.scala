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
  * `leftTimeBound` (optional) is merge_asof's tolerance, pre-lowered by
  * [[AsOfJoinRewrite]] to a per-left-row expression of the right-time's
  * type (e.g. `cast(l.ts - interval as timestamp)`): a carried match is
  * emitted only when `r.t >= bound(l)` (backward — the bound is a lower
  * bound) or `r.t <= bound(l)` (forward — an upper bound); a null bound
  * never matches (SQL comparison semantics of the stock expansion's
  * tolerance conjunct). The merge still tracks a single candidate row —
  * tolerance only gates emission, so the pass stays O(|L|+|R|).
  *
  * `forward` flips the match rule to merge_asof's direction='forward':
  * the candidate is the FIRST right row with `r.t >= l.t` instead of
  * the last with `r.t <= l.t`. Same physical contract; the merge keeps
  * the candidate UNCONSUMED at the cursor head (a later left row with a
  * larger time may share it), consuming only rows strictly before the
  * probe. direction='nearest' stays unimplemented by design: with
  * equidistant prior/following rows the stock expansion's min_by tie
  * choice is implementation-arbitrary, so there is no semantics to be
  * faithful to.
  *
  * `strict` is merge_asof's allow_exact_matches=False: ties (`r.t ==
  * l.t`) never match — backward takes the last row STRICTLY before,
  * forward the first STRICTLY after, and a tolerance bound compares
  * strictly too (the stock expansion's strict conjuncts). Unlike
  * nearest, strict semantics are exact (no arbitrary tie), so the
  * merge implements them: the consume-through-ties rule just flips
  * sides — backward-strict stops AT ties like forward does, and
  * forward-strict consumes THROUGH them like backward does. Still one
  * O(|L|+|R|) pass.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTimeBound: Option[Expression] = None,
    forward: Boolean = false,
    strict: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNode {

  import org.apache.spark.sql.catalyst.expressions.{
    CreateNamedStruct, If, IsNull, Literal, Or}

  /** Multi-key `by` support: several key expressions compose into ONE
    * null-guarded struct key with POSITIONAL field names (`k0`, `k1`,
    * …) so the left and right structs get identical dataTypes
    * regardless of source column names. The null guard is the SQL
    * semantics the stock expansion's `AND` of equalities has and a
    * plain struct comparison does NOT: `struct(null, 1) = struct(null,
    * 1)` compares EQUAL under interpreted ordering, but an equality
    * conjunct over a null key matches nothing — so any null field
    * nulls the WHOLE key, and [[AsOfJoinExec]]'s null-key handling
    * (skip right rows, emit null payload for left rows) applies.
    */
  def structKey(fields: Seq[Expression]): Expression = {
    require(fields.nonEmpty, "as-of key needs at least one column")
    if (fields.size == 1) fields.head
    else {
      val named = CreateNamedStruct(fields.zipWithIndex.flatMap {
        case (f, i) => Seq(Literal(s"k$i"), f)
      })
      val anyNull = fields.map(IsNull(_): Expression).reduce(Or)
      If(anyNull, Literal.create(null, named.dataType), named)
    }
  }
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, lb, fwd, st) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lb, fwd,
        st) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    leftTimeBound: Option[Expression] = None,
    forward: Boolean = false,
    strict: Boolean = false) extends BinaryExecNode {

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
    val lBoundB = leftTimeBound.map(BindReferences.bindReference(_, left.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val out = output
    val nRight = right.output.size
    val fwd = forward
    val strictTies = strict
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
        var headKey: Any = null
        var headTime: Any = null
        if (lk != null && lt != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = rTimeB.eval(head)
            if (rk == null || rt == null) rBuf.next() // nulls never match
            else {
              val c = keyOrd.compare(rk, lk)
              // backward consumes THROUGH r.t == l.t and carries the last
              // consumed row; forward stops AT r.t >= l.t and leaves the
              // candidate unconsumed (a later left row may share it).
              // strict mode flips each side's tie handling: backward-
              // strict stops AT ties (the carry must be strictly before),
              // forward-strict consumes THROUGH them (the head must be
              // strictly after) — so consume-through-ties ⇔ fwd == strict
              val cmpT = if (c == 0) timeOrd.compare(rt, lt) else 0
              val within = c == 0 &&
                (if (fwd == strictTies) cmpT <= 0 else cmpT < 0)
              if (c < 0 || within) {
                val r = rBuf.next()
                if (!fwd) {
                  // backward carries the last consumed row; the forward
                  // candidate is always the UNCONSUMED cursor head, so
                  // carrying (and copying) here would be pure waste
                  lastKey = rk
                  lastTime = rt
                  lastRow = r.copy() // unsafe iterators reuse row objects
                }
              } else {
                headKey = rk
                headTime = rt
                advance = false
              }
            }
          }
        }
        val (candRow, candKey, candTime) =
          if (fwd) (if (rBuf.hasNext) rBuf.head else null, headKey, headTime)
          else (lastRow, lastKey, lastTime)
        var matched = lk != null && candRow != null && candKey != null &&
          keyOrd.compare(candKey, lk) == 0
        if (matched && lBoundB.isDefined) {
          // tolerance: the candidate must satisfy r.t >= lower bound
          // (backward) / r.t <= upper bound (forward) — both STRICT in
          // strict mode (the stock expansion's strict conjuncts); a
          // null bound never matches (conjunct comparison semantics)
          val bound = lBoundB.get.eval(l)
          val cmp = if (bound == null) -1
            else if (fwd) timeOrd.compare(bound, candTime)
            else timeOrd.compare(candTime, bound)
          matched = bound != null &&
            (if (strictTies) cmp > 0 else cmp >= 0)
        }
        toUnsafe(joined(l, if (matched) candRow else nullRight))
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

  /** `timeBound`: optional NAME of a precomputed left column holding
    * the per-row tolerance bound (e.g.
    * `.withColumn("lb", $"ts" - lit(5L))`) — typed by construction, so
    * no cross-type arithmetic happens here; matches require
    * `r.time >= bound` (backward) or `r.time <= bound` (forward). The
    * bound column still appears in the output's left half (drop it
    * afterwards if unwanted). `forward = true` matches the FIRST right
    * row at-or-after the probe time instead of the last at-or-before.
    * `strict = true` excludes exact-time ties (merge_asof's
    * allow_exact_matches=False) and makes the bound comparison strict.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      prefix: String = "r_",
      timeBound: Option[String] = None,
      forward: Boolean = false,
      strict: Boolean = false): DataFrame =
    asOfKeys(left, right, Seq(key), leftTime, rightTime, prefix,
      timeBound, forward, strict)

  /** Multi-key `by` (merge_asof's by=[k1, k2, …]): the keys compose
    * into one null-guarded struct ([[AsOfJoinNode.structKey]]), so a
    * row with ANY null key column matches nothing — the semantics of
    * the equivalent AND-of-equalities join condition.
    */
  def asOfKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      prefix: String = "r_",
      timeBound: Option[String] = None,
      forward: Boolean = false,
      strict: Boolean = false): DataFrame = {
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
    timeBound.foreach { tb =>
      val b = attr(lPlan, tb)
      val rt = attr(rPlan, rightTime)
      // fail misuse at construction with a clear message — a mismatched
      // bound type otherwise dies as a ClassCastException inside the
      // interpreted ordering at execution time (the Catalyst rewrite
      // path already checks b.dataType == rt.dataType; mirror it here)
      require(b.dataType == rt.dataType,
        s"timeBound column $tb has type ${b.dataType}, but the right " +
          s"time column $rightTime has type ${rt.dataType}; the bound " +
          "must be pre-cast to the right time's type")
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      AsOfJoinNode.structKey(keys.map(attr(lPlan, _))),
      AsOfJoinNode.structKey(keys.map(attr(rPlan, _))),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      timeBound.map(attr(lPlan, _)), forward, strict)
    val joined = GraftBridge.ofRows(spark, node)
    // attribute-based projection (never by-name: both sides may share
    // column names): keep the left side as-is, drop the right keys
    // (they equal the left keys on matches), prefix the right payload
    val outCols = lPlan.output.map(a => GraftBridge.column(a)) ++
      rPlan.output.filterNot(a => keys.contains(a.name))
        .map(a => GraftBridge.column(a).as(prefix + a.name))
    joined.select(outCols: _*)
  }
}
