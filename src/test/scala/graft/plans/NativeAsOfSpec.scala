package graft.plans

import graft.{SparkSpec, Tables}
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** The whole-operator as-of join (custom LogicalPlan → Strategy →
  * SparkPlan): exact semantic parity with the union-and-fill form on
  * hand-picked edges, row-identity on the real events fixture, a
  * randomized cross-check against a first-principles Scala reference,
  * and the physical contract (the plan IS AsOfJoinExec, fed by exactly
  * one hash exchange per side — EnsureRequirements honoring
  * requiredChildDistribution/Ordering).
  */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 5L, "p5"),
    (2L, 100L, "p100"),
    (3L, 50L, "p50")).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 8L, "r8"), (1L, 10L, "r10"), (1L, 15L, "r15"),
    (2L, 101L, "r101")).toDF("k", "rt", "rv")

  test("edge semantics: tie matched, strictly-after null, absent key null") {
    val out = NativeAsOf.asOf(left, right, "k", "t", "rt")
      .select("k", "t", "r_rt", "r_rv")
      .as[(Long, Long, Option[Long], Option[String])].collect().toSet
    assert(out === Set(
      (1L, 5L, None, None),
      (1L, 10L, Some(10L), Some("r10")), // t' == t IS matched
      (1L, 20L, Some(15L), Some("r15")),
      (2L, 100L, None, None),
      (3L, 50L, None, None)))
  }

  test("plans AsOfJoinExec with one hash exchange + sort per side") {
    val df = NativeAsOf.asOf(left, right, "k", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 hash exchanges, plan:\n$plan")
    assert(!plan.contains("Window"), "merge form must not plan a window")
  }

  test("row-identity with ops.AsOfJoin on the events fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val e = Tables.events(spark, sfDir)
    val l = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ems"), col("event_id"))
    val r = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ems").as("s_ems"))
    val native = NativeAsOf.asOf(l, r, "user_id", "ems", "s_ems")
      .select("user_id", "ems", "event_id", "r_s_ems")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    val unionFill = AsOfJoin.asOf(l, r, "user_id", "ems", "s_ems")
      .select("user_id", "ems", "event_id", "r_s_ems")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(native.nonEmpty)
    assert(native === unionFill)
  }

  test("randomized parity with a first-principles reference") {
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, i.toLong))
    val rRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, i.toLong))
    // contract: right unique per (key, time) — dedup keeping max payload
    val rUniq = rRows.groupBy(x => (x._1, x._2))
      .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toSeq
    val l = lRows.toDF("k", "t", "lid").repartition(7)
    val r = rUniq.toDF("k", "rt", "rid").repartition(5)
    val got = NativeAsOf.asOf(l, r, "k", "t", "rt")
      .select("k", "t", "lid", "r_rt", "r_rid")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    val byKey = rUniq.groupBy(_._1)
    val want = lRows.map { case (k, t, lid) =>
      byKey.getOrElse(k, Nil).filter(_._2 <= t)
        .sortBy(_._2).lastOption match {
        case Some((_, rt, rid)) => (k, t, lid, Some(rt), Some(rid))
        case None => (k, t, lid, None, None)
      }
    }.toSet
    assert(got === want)
  }

  test("self-join (shared lineage) re-aliases instead of mis-resolving") {
    val e = Seq((1L, 1L, 1.0), (1L, 5L, 2.0), (1L, 9L, 3.0))
      .toDF("k", "t", "v")
    val out = NativeAsOf.asOf(e, e.toDF("k", "t", "v"), "k", "t", "t")
      .select("k", "t", "r_v").as[(Long, Long, Option[Double])]
      .collect().toSet
    // each row as-of itself: the tie rule matches the row's own payload
    assert(out === Set((1L, 1L, Some(1.0)), (1L, 5L, Some(2.0)),
      (1L, 9L, Some(3.0))))
  }
}
