package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def intervals = Seq(
    (1L, 100L, 10L, 30L), // i100: [10, 30]
    (1L, 101L, 25L, 45L), // i101: [25, 45] overlaps i100
    (2L, 102L, 0L, 5L)).toDF("k", "iid", "lo", "hi")

  private def points = Seq(
    (1L, 10L), (1L, 30L), (1L, 31L), (1L, 44L), (1L, 46L),
    (2L, 5L), (2L, 6L)).toDF("k", "t")

  test("pairs every interval with exactly the points in [lo, hi]") {
    val out = RangeJoin.rangeJoin(intervals, points, "k",
        "lo", "hi", "t", binSize = 10L)
      .select("iid", "p_t").as[(Long, Long)].collect().toSet
    assert(out === Set(
      (100L, 10L), (100L, 30L), // inclusive bounds both ends
      (101L, 30L), (101L, 31L), (101L, 44L), // overlapping interval
      (102L, 5L))) // hi bound inclusive; t=6 > hi=5 excluded
  }

  test("a point in an interval spanning many bins matches exactly once") {
    val wide = Seq((1L, 7L, 0L, 100L)).toDF("k", "iid", "lo", "hi")
    val pt = Seq((1L, 55L)).toDF("k", "t")
    val out = RangeJoin.rangeJoin(wide, pt, "k", "lo", "hi", "t", 10L)
    assert(out.count() === 1)
  }

  test("non-positive binSize fails loudly") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(intervals, points, "k", "lo", "hi", "t", 0L)
    }
    assert(e.getMessage.contains("binSize"))
  }

  test("plans an equi-join, never a nested loop or cartesian") {
    val plan = RangeJoin.rangeJoin(intervals, points, "k",
        "lo", "hi", "t", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }
}
