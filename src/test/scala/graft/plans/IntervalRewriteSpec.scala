package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The optimizer rewrite: a user's ordinary inequality join — DataFrame
  * or SQL BETWEEN — must plan the native IntervalJoinExec with
  * unchanged results, while every guarded shape (multi-equality bucket
  * joins, strict bounds, hints) stays on the stock planner.
  */
class IntervalRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkViews(): Unit = {
    Seq((1L, 10L, 20L, "a"), (1L, 15L, 25L, "b"), (2L, 0L, 5L, "c"))
      .toDF("k", "lo", "hi", "tag").createOrReplaceTempView("iv")
    Seq((1L, 12L, "x"), (1L, 22L, "y"), (2L, 7L, "z"))
      .toDF("k", "t", "pv").createOrReplaceTempView("pt")
  }

  test("SQL BETWEEN join plans IntervalJoinExec, results exact") {
    mkViews()
    val df = spark.sql(
      "SELECT iv.tag, pt.pv FROM iv JOIN pt ON pt.k = iv.k " +
        "AND pt.t BETWEEN iv.lo AND iv.hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(df.as[(String, String)].collect().toSet ===
      Set(("a", "x"), ("b", "y")))
  }

  test("DataFrame inequality join is rewritten, either side order") {
    mkViews()
    val iv = spark.table("iv")
    val pt = spark.table("pt")
    // intervals as the LEFT side of the user's join
    val a = iv.join(pt, iv("k") === pt("k") && iv("lo") <= pt("t") &&
      pt("t") <= iv("hi")).select(col("tag"), col("pv"))
    // intervals as the RIGHT side — attribute order must be restored
    val b = pt.join(iv, iv("k") === pt("k") && iv("lo") <= pt("t") &&
      pt("t") <= iv("hi")).select(col("pv"), col("tag"))
    Seq(a.queryExecution.executedPlan.toString,
      b.queryExecution.executedPlan.toString).foreach { p =>
      assert(p.contains("IntervalJoin"), p)
    }
    val expect = Set(("a", "x"), ("b", "y"))
    assert(a.as[(String, String)].collect().toSet === expect)
    assert(b.as[(String, String)].collect().toSet === expect.map(_.swap))
  }

  test("guards: multi-equality, strict bounds, and outer joins untouched") {
    mkViews()
    // two equalities (the ops.RangeJoin bucket-join shape) — must keep
    // the stock equi-join plan
    val two = spark.sql(
      "SELECT iv.tag, pt.pv FROM iv JOIN pt ON pt.k = iv.k " +
        "AND iv.lo = pt.t AND pt.t <= iv.hi AND pt.t >= iv.lo")
    assert(!two.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
    // strict bound — not a closed interval, untouched
    val strict = spark.sql(
      "SELECT iv.tag, pt.pv FROM iv JOIN pt ON pt.k = iv.k " +
        "AND pt.t > iv.lo AND pt.t <= iv.hi")
    assert(!strict.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
    // outer join — untouched
    val outer = spark.sql(
      "SELECT iv.tag, pt.pv FROM iv LEFT JOIN pt ON pt.k = iv.k " +
        "AND pt.t BETWEEN iv.lo AND iv.hi")
    assert(!outer.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
  }

  test("rewritten SQL matches the stock plan's rows on random data") {
    val rnd = new scala.util.Random(11)
    val li = Seq.tabulate(200) { i =>
      val lo = rnd.nextInt(100).toLong
      (rnd.nextInt(10).toLong, lo, lo + rnd.nextInt(30).toLong, i.toLong)
    }
    val pt = Seq.tabulate(400)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(130).toLong, i.toLong))
    li.toDF("k", "lo", "hi", "lid").createOrReplaceTempView("riv")
    pt.toDF("k", "t", "pid").createOrReplaceTempView("rpt")
    val df = spark.sql("SELECT lid, pid FROM riv JOIN rpt " +
      "ON rpt.k = riv.k AND rpt.t BETWEEN riv.lo AND riv.hi")
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    val want = (for {
      (lk, lo, hi, lid) <- li
      (pk, t, pid) <- pt
      if lk == pk && lo <= t && t <= hi
    } yield (lid, pid)).toSet
    assert(df.as[(Long, Long)].collect().toSet === want)
  }
}
