package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{
  Add, And, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin, LogicalPlan}
import org.apache.spark.sql.types.DayTimeIntervalType

/** [[AsOfJoinRewrite]]: the stock `logical.AsOfJoin` node (what
  * pandas-on-Spark `merge_asof` builds) replans onto [[AsOfJoinExec]]
  * with results identical to the stock expansion's semantics —
  * duplicate-left collapse included — and every guarded shape
  * (strict inequality, tolerance, multi-key by, non-backward ordering)
  * stays on the stock pair-join path.
  */
class AsOfRewriteSpec extends SparkSpec {
  import spark.implicits._

  // duplicate left row ON PURPOSE: the stock expansion groups by
  // l.output, so (1, 10, "a") twice must collapse to ONE output row
  private def left = Seq(
    (1L, 10L, "a"), (1L, 10L, "a"), (1L, 5L, "b"),
    (2L, 7L, "c"), (3L, 50L, "d")).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 8L, "r8"), (1L, 10L, "r10"), (1L, 15L, "r15"),
    (3L, 49L, "r49")).toDF("k", "rt", "rv")

  /** Builds the exact node merge_asof builds: backward direction, and
    * allow_exact_matches toggling >= vs >; `by` = the k equality. */
  private def asOfNode(l: DataFrame, r: DataFrame, jt: JoinType,
      exactMatches: Boolean = true,
      tolerance: Option[Expression] = None,
      byCond: Option[(LogicalPlan, LogicalPlan) => Expression] = None,
      ordOf: Option[(Expression, Expression) => Expression] = None,
      asOfCondOf: Option[(Expression, Expression) => Expression] = None)
      : DataFrame = {
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
    val lt = attr(lp, "t"); val rt = attr(rp, "rt")
    val cond = byCond.map(f => f(lp, rp))
      .getOrElse(EqualTo(attr(lp, "k"), attr(rp, "k")))
    val asOfCond: Expression = asOfCondOf.map(f => f(lt, rt)).getOrElse(
      if (exactMatches) GreaterThanOrEqual(lt, rt) else GreaterThan(lt, rt))
    val ord = ordOf.map(f => f(lt, rt)).getOrElse(Subtract(lt, rt))
    GraftBridge.ofRows(spark,
      AsOfJoin(lp, rp, asOfCond, Some(cond), jt, ord, tolerance))
  }

  test("the stock as-of node replans onto AsOfJoinExec (no pair join)") {
    val plan = asOfNode(left, right, LeftOuter)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("LeftOuter results match stock semantics, duplicate lefts collapse") {
    val out = asOfNode(left, right, LeftOuter)
      .toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "tag", "rt", "rv")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().toSeq
    // one row per DISTINCT left row (the stock group-by-l.output rule)
    assert(out.size === 4)
    assert(out.toSet === Set(
      (1L, 10L, "a", Some(10L), Some("r10")), // exact match included, once
      (1L, 5L, "b", None, None), // no prior right row
      (2L, 7L, "c", None, None), // absent key
      (3L, 50L, "d", Some(49L), Some("r49"))))
  }

  test("Inner results drop unmatched lefts, keep the collapse") {
    val out = asOfNode(left, right, Inner)
      .toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "tag", "rt", "rv")
      .as[(Long, Long, String, Long, String)].collect().toSet
    assert(out === Set(
      (1L, 10L, "a", 10L, "r10"),
      (3L, 50L, "d", 49L, "r49")))
  }

  test("strict (allow_exact_matches=False) fires and excludes ties") {
    // backward strict: t=10 must match rt=8, never the tied rt=10
    val strict = asOfNode(left, right, LeftOuter, exactMatches = false)
    val plan = strict.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val rows = strict.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rt")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(rows === Set(
      (1L, 10L, Some(8L)), // tie excluded: strictly-before r8 wins
      (1L, 5L, None), (2L, 7L, None),
      (3L, 50L, Some(49L))))
    // forward strict: t=10 must match rt=15, never the tied rt=10
    val fwdStrict = asOfNode(left, right, LeftOuter,
      asOfCondOf = Some((lt, rt) => LessThan(lt, rt)),
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
    assert(fwdStrict.queryExecution.executedPlan.toString
      .contains("AsOfJoin"))
    val fRows = fwdStrict.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rt")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(fRows === Set(
      (1L, 10L, Some(15L)), // tie excluded: strictly-after r15 wins
      (1L, 5L, Some(8L)), (2L, 7L, None),
      (3L, 50L, None))) // r49 is before 50
    // strict tolerance: strict probe pairs with a STRICT bound; with
    // tolerance 2 the k=1 t=10 match (10-8=2) is excluded (8 > 10-2
    // is false), while k=3 t=50 keeps r49 (49 > 48)
    val strictTol = asOfNode(left, right, LeftOuter,
      exactMatches = false,
      tolerance = Some(GreaterThanOrEqual(Literal(2L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(GreaterThan(lt, rt),
        GreaterThan(rt, Subtract(lt, Literal(2L))))))
    assert(strictTol.queryExecution.executedPlan.toString
      .contains("AsOfJoin"))
    val tRows = strictTol.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rv")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(tRows === Set(
      (1L, 10L, None), (1L, 5L, None), (2L, 7L, None),
      (3L, 50L, Some("r49"))))
    // a MIXED pair — strict probe with an inclusive bound — is not a
    // merge_asof shape and stays stock
    val mixed = asOfNode(left, right, LeftOuter,
      exactMatches = false,
      tolerance = Some(GreaterThanOrEqual(Literal(2L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(GreaterThan(lt, rt),
        GreaterThanOrEqual(rt, Subtract(lt, Literal(2L))))))
    assert(!mixed.queryExecution.executedPlan.toString
      .contains("AsOfJoin"))
  }

  test("strict randomized parity with a first-principles reference") {
    val rnd = new scala.util.Random(31)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(120).toLong, i.toLong))
      .toDF("k", "t", "lid") // small time domain → ties are COMMON
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(120).toLong, i.toLong))
      .toDF("k", "rt", "rid")
    val got = asOfNode(l.repartition(7), r.repartition(5), LeftOuter,
      exactMatches = false)
      .toDF("k", "t", "lid", "k2", "rt", "rid")
      .select("k", "t", "lid", "rt")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val rRows = r.as[(Long, Long, Long)].collect()
    val want = l.as[(Long, Long, Long)].collect().map { case (k, t, lid) =>
      val prior = rRows.filter(x => x._1 == k && x._2 < t) // STRICT
      if (prior.isEmpty) (k, t, lid, None: Option[Long])
      else (k, t, lid, Some(prior.map(_._2).max))
    }.toSet
    assert(got === want)
    assert(got.exists(_._4.isDefined))
    // the fixture genuinely exercised ties: some left time equals some
    // same-key right time (otherwise strictness proved nothing)
    val lRows = l.as[(Long, Long, Long)].collect()
    assert(lRows.exists(lr =>
      rRows.exists(rr => rr._1 == lr._1 && rr._2 == lr._2)))
  }

  test("guarded shapes stay on the stock expansion") {
    // tolerance assertion folds to FALSE (negative tolerance): the rule
    // must NOT fire (firing would swallow the error) — the node stays
    // stock and CheckAnalysis raises the stock TOLERANCE_IS_NON_NEGATIVE
    val badTolEx = intercept[org.apache.spark.sql.AnalysisException] {
      asOfNode(left, right, LeftOuter,
        tolerance = Some(GreaterThanOrEqual(Literal(-5L), Literal(0L))),
        asOfCondOf = Some((lt, rt) => And(GreaterThanOrEqual(lt, rt),
          GreaterThanOrEqual(rt, Subtract(lt, Literal(-5L))))))
        .queryExecution.analyzed
    }
    assert(badTolEx.getMessage.contains("TOLERANCE_IS_NON_NEGATIVE"))

    // a NON-equality conjunct in the by condition: guarded out
    val nonEq = asOfNode(left, right, LeftOuter, byCond = Some((lp, rp) => {
      def a(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
      And(EqualTo(a(lp, "k"), a(rp, "k")),
        GreaterThan(a(lp, "k"), a(rp, "k")))
    }))
    assert(!nonEq.queryExecution.executedPlan.toString.contains("AsOfJoin"))

    // non-backward ordering expression: guarded out
    val fwdOrd = asOfNode(left, right, LeftOuter,
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
    assert(!fwdOrd.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("assertion-without-bound fires as no-tolerance (condition is authoritative)") {
    // a foldable-true assertion whose asOfCond carries NO bound conjunct
    // means no tolerance semantics — stock executes the condition as
    // given, so the rewrite fires and matches the bare-backward results
    val tol = asOfNode(left, right, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(Literal(5L), Literal(0L))))
    assert(tol.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = tol.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rv").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(out === Set((1L, 10L, Some("r10")), (1L, 5L, None),
      (2L, 7L, None), (3L, 50L, Some("r49"))))
  }

  test("timestamp as-of columns fire the rewrite (coerced SubtractTimestamps ord)") {
    // merge_asof's dominant case: the analyzer coerces the raw
    // Subtract(ts, ts) ordering into SubtractTimestamps; the rule must
    // still recognize it (the round-10 gap: only Long times fired)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2020-01-01 00:00:10"), "a"),
      (1L, ts("2020-01-01 00:00:03"), "b"),
      (2L, ts("2020-01-01 00:01:00"), "c")).toDF("k", "t", "tag")
    val r = Seq((1L, ts("2020-01-01 00:00:08"), "r8"),
      (2L, ts("2020-01-01 00:00:30"), "r30")).toDF("k", "rt", "rv")
    val df = asOfNode(l, r, LeftOuter)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val out = df.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "tag", "rv")
      .as[(Long, String, Option[String])].collect().toSet
    assert(out === Set((1L, "a", Some("r8")), (1L, "b", None),
      (2L, "c", Some("r30"))))
  }

  test("backward tolerance fires the rewrite and gates matches (Long times)") {
    // merge_asof(tolerance=3): nearest prior within 3 time units
    val df = asOfNode(left, right, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(Literal(3L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(GreaterThanOrEqual(lt, rt),
        GreaterThanOrEqual(rt, Subtract(lt, Literal(3L))))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val out = df.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "tag", "rt", "rv")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().toSet
    assert(out === Set(
      (1L, 10L, "a", Some(10L), Some("r10")), // exact, within tolerance
      (1L, 5L, "b", None, None),
      (2L, 7L, "c", None, None),
      (3L, 50L, "d", Some(49L), Some("r49")))) // 50-49=1 <= 3
    // tighter tolerance nulls out the k=3 match (50-49=1 > 0 is fine;
    // use tolerance 0: only exact matches survive)
    val zero = asOfNode(left, right, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(Literal(0L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(GreaterThanOrEqual(lt, rt),
        GreaterThanOrEqual(rt, Subtract(lt, Literal(0L))))))
    assert(zero.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val zeroOut = zero.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rv")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(zeroOut === Set(
      (1L, 10L, Some("r10")), (1L, 5L, None), (2L, 7L, None),
      (3L, 50L, None)))
  }

  test("timestamp tolerance (interval bound) fires and matches merge_asof semantics") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2020-01-01 00:00:10"), "a"),
      (1L, ts("2020-01-01 00:00:30"), "b")).toDF("k", "t", "tag")
    val r = Seq((1L, ts("2020-01-01 00:00:08"), "r8")).toDF("k", "rt", "rv")
    val tol = Literal.create(java.time.Duration.ofSeconds(5),
      DayTimeIntervalType())
    val df = asOfNode(l, r, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(tol, Literal.default(tol.dataType))),
      asOfCondOf = Some((lt, rt) => And(GreaterThanOrEqual(lt, rt),
        GreaterThanOrEqual(rt, Subtract(lt, tol)))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val out = df.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("tag", "rv").as[(String, Option[String])].collect().toSet
    // t=10s is 2s after r8 (within 5s); t=30s is 22s after (outside)
    assert(out === Set(("a", Some("r8")), ("b", None)))
  }

  test("multi-key by fires via the null-guarded struct key") {
    // two-key by: (k, g). The g split separates matches that a k-only
    // join would conflate, and a NULL g must match nothing (the AND-of-
    // equalities semantics the struct null guard exists to preserve).
    val l2 = Seq(
      (1L, Some("x"), 10L, "a"), (1L, Some("y"), 10L, "b"),
      (1L, None: Option[String], 10L, "c")).toDF("k", "g", "t", "tag")
    val r2 = Seq(
      (1L, Some("x"), 8L, "rx"), (1L, Some("y"), 9L, "ry"),
      (1L, None: Option[String], 5L, "rnull")).toDF("k", "g", "rt", "rv")
    val lp = l2.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def a(p: LogicalPlan, n: String) = p.output.find(_.name == n).get
    val df = GraftBridge.ofRows(spark, AsOfJoin(lp, rp,
      GreaterThanOrEqual(a(lp, "t"), a(rp, "rt")),
      Some(And(EqualTo(a(lp, "k"), a(rp, "k")),
        EqualTo(a(lp, "g"), a(rp, "g")))),
      LeftOuter, Subtract(a(lp, "t"), a(rp, "rt")), None))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val out = df.toDF("k", "g", "t", "tag", "k2", "g2", "rt", "rv")
      .select("tag", "rv").as[(String, Option[String])].collect().toSet
    assert(out === Set(
      ("a", Some("rx")), // (1, x) matches only the x row
      ("b", Some("ry")), // (1, y) matches only the y row
      ("c", None))) // null g: AND-of-equalities matches nothing
    // parity with the stock expansion on the same node shape: force
    // stock by adding a tautological non-equality conjunct
    val stock = GraftBridge.ofRows(spark, AsOfJoin(lp, rp,
      GreaterThanOrEqual(a(lp, "t"), a(rp, "rt")),
      Some(And(And(EqualTo(a(lp, "k"), a(rp, "k")),
        EqualTo(a(lp, "g"), a(rp, "g"))),
        GreaterThanOrEqual(a(lp, "k"), a(rp, "k")))),
      LeftOuter, Subtract(a(lp, "t"), a(rp, "rt")), None))
    assert(!stock.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val stockOut = stock.toDF("k", "g", "t", "tag", "k2", "g2", "rt", "rv")
      .select("tag", "rv").as[(String, Option[String])].collect().toSet
    assert(stockOut === out)
  }

  test("forward direction fires the rewrite: first right row at-or-after") {
    val df = asOfNode(left, right, LeftOuter,
      asOfCondOf = Some((lt, rt) => LessThanOrEqual(lt, rt)),
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val out = df.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rt", "rv")
      .as[(Long, Long, Option[Long], Option[String])].collect().toSet
    assert(out === Set(
      (1L, 10L, Some(10L), Some("r10")), // exact match, not r15
      (1L, 5L, Some(8L), Some("r8")), // next following
      (2L, 7L, None, None), // absent key
      (3L, 50L, None, None))) // r49 is BEFORE 50: no forward match
  }

  test("forward tolerance (upper bound) gates matches") {
    val df = asOfNode(left, right, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(Literal(3L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(LessThanOrEqual(lt, rt),
        LessThanOrEqual(rt, Add(lt, Literal(3L))))),
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val out = df.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rv")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(out === Set(
      (1L, 10L, Some("r10")), // 10 <= 13
      (1L, 5L, Some("r8")), // 8 <= 8
      (2L, 7L, None), (3L, 50L, None)))
    // a mismatched pair — forward probe with a LOWER bound — is not a
    // merge_asof shape and must stay stock
    val mismatched = asOfNode(left, right, LeftOuter,
      tolerance = Some(GreaterThanOrEqual(Literal(3L), Literal(0L))),
      asOfCondOf = Some((lt, rt) => And(LessThanOrEqual(lt, rt),
        GreaterThanOrEqual(rt, Subtract(lt, Literal(3L))))),
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
    assert(!mismatched.queryExecution.executedPlan.toString
      .contains("AsOfJoin"))
  }

  test("nearest direction stays stock (both exact-match variants)") {
    // merge_asof(direction='nearest') builds asOfCond = true (or
    // Not(l.t = r.t) when allow_exact_matches=False) and the two-sided
    // If ordering — its equidistant tie is implementation-arbitrary in
    // the stock expansion, so the rule must never claim the shape
    import org.apache.spark.sql.catalyst.expressions.{If, Not}
    def nearestOrd(lt: Expression, rt: Expression): Expression =
      If(GreaterThan(lt, rt), Subtract(lt, rt), Subtract(rt, lt))
    val exact = asOfNode(left, right, LeftOuter,
      asOfCondOf = Some((_, _) => Literal.TrueLiteral),
      ordOf = Some(nearestOrd))
    assert(!exact.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val strict = asOfNode(left, right, LeftOuter,
      asOfCondOf = Some((lt, rt) => Not(EqualTo(lt, rt))),
      ordOf = Some(nearestOrd))
    assert(!strict.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // and the stock path still computes nearest correctly: t=5 is
    // nearer to r8 (3) than to nothing prior — nearest picks r8
    val rows = exact.toDF("k", "t", "tag", "k2", "rt", "rv")
      .select("k", "t", "rv").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(rows.contains((1L, 5L, Some("r8"))))
  }

  test("forward randomized parity with a first-principles reference") {
    val rnd = new scala.util.Random(23)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(12).toLong, i.toLong * 2 + 1, i.toLong))
      .toDF("k", "rt", "rid")
    val got = asOfNode(l.repartition(7), r.repartition(5), LeftOuter,
      asOfCondOf = Some((lt, rt) => LessThanOrEqual(lt, rt)),
      ordOf = Some((lt, rt) => Subtract(rt, lt)))
      .toDF("k", "t", "lid", "k2", "rt", "rid")
      .select("k", "t", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val rRows = r.as[(Long, Long, Long)].collect()
    val want = l.as[(Long, Long, Long)].collect().map { case (k, t, lid) =>
      val following = rRows.filter(x => x._1 == k && x._2 >= t)
      if (following.isEmpty) (k, t, lid, None: Option[Long])
      else (k, t, lid, Some(following.minBy(_._2)._3))
    }.toSet
    assert(got === want)
    assert(got.exists(_._4.isDefined))
  }

  test("rewritten and stock paths agree on a randomized workload") {
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(12).toLong, i.toLong * 2 + 1, i.toLong))
      .toDF("k", "rt", "rid") // rt globally unique: tie-free reference
    val got = asOfNode(l.repartition(7), r.repartition(5), LeftOuter)
      .toDF("k", "t", "lid", "k2", "rt", "rid")
      .select("k", "t", "lid", "rid")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    // first-principles reference over the same rows (lefts unique by lid,
    // rt unique per (k, rt) is NOT needed: ties broken by max rid is not
    // assumed — instead assert the matched rt is the max prior rt)
    val rRows = r.as[(Long, Long, Long)].collect()
    val want = l.as[(Long, Long, Long)].collect().map { case (k, t, lid) =>
      val prior = rRows.filter(x => x._1 == k && x._2 <= t)
      if (prior.isEmpty) (k, t, lid, None: Option[Long])
      else {
        val best = prior.maxBy(_._2)
        (k, t, lid, Some(best._3))
      }
    }.toSet
    assert(got === want)
    assert(got.exists(_._4.isDefined))
  }
}
