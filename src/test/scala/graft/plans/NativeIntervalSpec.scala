package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The whole-operator interval join (custom LogicalPlan → Strategy →
  * SparkPlan): edge semantics (inclusive bounds, nulls, overlap,
  * nesting), row-parity with ops.RangeJoin's bin-bucketed form on the
  * events fixture, a randomized cross-check against a first-principles
  * Scala reference, and the physical contract (IntervalJoinExec fed by
  * exactly one hash exchange per side, no join node, no bins).
  */
class NativeIntervalSpec extends SparkSpec {
  import spark.implicits._

  private def intervals = Seq(
    (1L, 10L, 20L, "a"),   // plain
    (1L, 15L, 25L, "b"),   // overlaps a
    (1L, 12L, 14L, "c"),   // nested inside a
    (2L, 0L, 100L, "wide"),
    (3L, 5L, 6L, "nohit")).toDF("k", "lo", "hi", "tag")

  private def points = Seq(
    (1L, 10L, "p10"),  // == lo of a: inclusive
    (1L, 13L, "p13"),  // a + c
    (1L, 20L, "p20"),  // == hi of a: inclusive; + b
    (1L, 26L, "p26"),  // nothing
    (2L, 50L, "p50"),
    (4L, 1L, "p1")).toDF("k", "t", "pv")

  test("edge semantics: inclusive bounds, overlap, nesting, no-match keys") {
    val out = NativeIntervalJoin
      .intervalJoin(intervals, points, "k", "lo", "hi", "t")
      .select("k", "tag", "p_t", "p_pv")
      .as[(Long, String, Long, String)].collect().toSet
    assert(out === Set(
      (1L, "a", 10L, "p10"),
      (1L, "a", 13L, "p13"), (1L, "c", 13L, "p13"),
      (1L, "a", 20L, "p20"), (1L, "b", 20L, "p20"),
      (2L, "wide", 50L, "p50")))
  }

  test("null keys and bounds never match") {
    val li = Seq((Some(1L), Some(0L), Some(100L)),
      (None, Some(0L), Some(100L)), (Some(1L), None, Some(100L)),
      (Some(1L), Some(0L), None)).toDF("k", "lo", "hi")
    val pt = Seq((Some(1L), Some(5L)), (None, Some(5L)),
      (Some(1L), None)).toDF("k", "t")
    val out = NativeIntervalJoin.intervalJoin(li, pt, "k", "lo", "hi", "t")
      .collect()
    assert(out.length === 1) // only the fully-non-null pair
  }

  test("mismatched column types fail at construction, naming both sides") {
    // INT key vs BIGINT key: without the guard this is a per-row
    // ClassCastException inside the interpreted ordering mid-sweep
    val intPoints = points.withColumn("k", col("k").cast("int"))
    val e = intercept[IllegalArgumentException](NativeIntervalJoin
      .intervalJoin(intervals, intPoints, "k", "lo", "hi", "t"))
    assert(e.getMessage.contains("intervals.k") &&
      e.getMessage.contains("points.k") && e.getMessage.contains("int"))
    // lo typed differently from t
    val dblT = points.withColumn("t", col("t").cast("double"))
    val e2 = intercept[IllegalArgumentException](NativeIntervalJoin
      .intervalJoin(intervals, dblT, "k", "lo", "hi", "t"))
    assert(e2.getMessage.contains("intervals.lo") &&
      e2.getMessage.contains("points.t"))
  }

  test("plans IntervalJoinExec with one hash exchange per side, no join node") {
    val df = NativeIntervalJoin
      .intervalJoin(intervals, points, "k", "lo", "hi", "t")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 hash exchanges, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") &&
      !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("row-parity with ops.RangeJoin's bin-bucketed form on the fixture") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val errs = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"),
        (col("ems") - 3600000L).as("lo"), (col("ems") + 3600000L).as("hi"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ems"))
    val native = NativeIntervalJoin
      .intervalJoin(errs, purch, "user_id", "lo", "hi", "ems")
      .select("user_id", "event_id", "p_ems")
      .as[(Long, Long, Long)].collect()
    val binned = graft.ops.RangeJoin
      .rangeJoin(errs, purch, "user_id", "lo", "hi", "ems", 7200000L)
      .select("user_id", "event_id", "p_ems")
      .as[(Long, Long, Long)].collect()
    assert(native.nonEmpty)
    // multiset equality: the sweep must emit each pair exactly once
    assert(native.groupBy(identity).view.mapValues(_.length).toMap ===
      binned.groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("randomized parity with a first-principles reference") {
    val rnd = new scala.util.Random(7)
    val li = Seq.tabulate(300) { i =>
      val lo = rnd.nextInt(200).toLong
      (rnd.nextInt(15).toLong, lo, lo + rnd.nextInt(40).toLong, i.toLong)
    }
    val pt = Seq.tabulate(500)(i =>
      (rnd.nextInt(15).toLong, rnd.nextInt(240).toLong, i.toLong))
    val l = li.toDF("k", "lo", "hi", "lid").repartition(7)
    val p = pt.toDF("k", "t", "pid").repartition(5)
    val got = NativeIntervalJoin.intervalJoin(l, p, "k", "lo", "hi", "t")
      .select("lid", "p_pid").as[(Long, Long)].collect().toSet
    val want = (for {
      (lk, lo, hi, lid) <- li
      (pk, t, pid) <- pt
      if lk == pk && lo <= t && t <= hi
    } yield (lid, pid)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }
}
