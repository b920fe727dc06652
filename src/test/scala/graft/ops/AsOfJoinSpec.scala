package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 5L, "p5"),
    (2L, 100L, "p100"),
    (3L, 50L, "p50")).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 8L, "r8"), (1L, 10L, "r10"), (1L, 15L, "r15"),
    (2L, 101L, "r101")).toDF("k", "rt", "rv")

  test("each left row gets the latest right row at-or-before its time") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt")
      .select("k", "t", "r_rt", "r_rv").as[(Long, Long, Option[Long], Option[String])]
      .collect().toSet
    assert(out === Set(
      (1L, 5L, None, None), // before any right row → left-outer null
      (1L, 10L, Some(10L), Some("r10")), // tie: t' == t IS matched
      (1L, 20L, Some(15L), Some("r15")), // most recent, not first
      (2L, 100L, None, None), // right row is strictly after
      (3L, 50L, None, None))) // key absent on right
  }

  test("payload fill is row-atomic (null payload fields don't mix rows)") {
    val r = Seq((1L, 8L, Option.empty[String], Some("b8")),
      (1L, 9L, Some("a9"), Option.empty[String]))
      .toDF("k", "rt", "a", "b")
    val l = Seq((1L, 10L)).toDF("k", "t")
    val out = AsOfJoin.asOf(l, r, "k", "t", "rt")
      .select("r_a", "r_b").as[(Option[String], Option[String])]
      .collect().toSeq
    // the row at rt=9 wins wholesale: its null b must NOT be backfilled
    // from the rt=8 row (a column-wise last(ignoreNulls) would do that)
    assert(out === Seq((Some("a9"), None)))
  }

  test("all left columns and rows are preserved") {
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt")
    assert(out.columns.toSeq === Seq("k", "t", "tag", "r_rt", "r_rv"))
    assert(out.count() === left.count())
  }

  test("reserved/colliding column names are rejected with a diagnostic") {
    val badLeft = Seq((1L, 10L, "x")).toDF("k", "t", "_side")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, right, "k", "t", "rt")
    }
    assert(e1.getMessage.contains("_side"))
    // a left column equal to prefix+rightCol is just as wrong
    val shadowLeft = Seq((1L, 10L, "x")).toDF("k", "t", "r_rv")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(shadowLeft, right, "k", "t", "rt")
    }
    assert(e2.getMessage.contains("r_rv"))
  }

  test("plans one exchange on the key, no nested-loop join") {
    val plan = AsOfJoin.asOf(left, right, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    // union-and-fill: partitioning by k for the window is the only exchange
    // of row data (plus AQE reads); no join node at all
    assert(!plan.contains("SortMergeJoin"))
  }
}
