package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 event operators — properties the
  * DuckDB hash compare can't express (it checks value equality, not
  * meaning): SCD2 intervals must tile each user's timeline exactly,
  * attribution must agree with SCD2's first state, and the transition
  * matrix must account for every consecutive pair.
  */
class EventOpsInvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("ev_scd2: intervals tile the timeline, n_events sums to the total") {
    val scd = run("ev_scd2").cache()
    val events = Tables.events(spark, sfDir)

    // no user may be dropped (the checks below join through scd, so a
    // missing user would otherwise pass vacuously)
    assert(scd.select(col("user_id")).distinct().count() ===
      events.select(col("user_id")).distinct().count())

    // one open (is_current) interval per user, and it is the last run
    val open = scd.filter(col("is_current"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(open.count() === scd.select(col("user_id")).distinct().count())
    assert(open.filter(col("n") =!= 1).count() === 0)

    // per user: n_events sums to the user's event count
    val fromScd = scd.groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n"))
    val fromEvents = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(fromScd.join(fromEvents, "user_id")
      .filter(fromScd("n") =!= fromEvents("n")).count() === 0)

    // intervals chain: each non-final valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("run_id"))
    val chained = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull)
    assert(chained.filter(col("valid_to") =!= col("next_from")).count() === 0)

    // consecutive intervals never share a state (runs are maximal)
    val sameState = scd
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull &&
        col("state") === col("next_state"))
    assert(sameState.count() === 0)
  }

  test("ev_first_touch agrees with ev_scd2's first and last states") {
    val ft = run("ev_first_touch")
    val scd = run("ev_scd2")
    val first = scd.filter(col("run_id") === 1)
      .select(col("user_id"), col("state").as("scd_first"))
    val last = scd.filter(col("is_current"))
      .select(col("user_id"), col("state").as("scd_last"))
    val joined = ft.join(first, "user_id").join(last, "user_id")
    assert(joined.filter(col("first_touch") =!= col("scd_first")).count() === 0)
    assert(joined.filter(col("last_touch") =!= col("scd_last")).count() === 0)
  }

  test("ev_transitions accounts for every consecutive pair exactly once") {
    val t = run("ev_transitions")
    val events = Tables.events(spark, sfDir)
    val totalPairs = t.agg(sum(col("n"))).head.getLong(0)
    // pairs = events - users (each user's first event has no predecessor)
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(totalPairs === nEvents - nUsers)
    // per-row probabilities are sane and rows of the matrix sum to ~1
    assert(t.filter(col("p_milli") < 0 || col("p_milli") > 1000).count() === 0)
    val rowSums = t.groupBy(col("prev")).agg(sum(col("p_milli")).as("s"))
    // integer floor division loses < |next states| per row
    assert(rowSums.filter(col("s") < 990 || col("s") > 1000).count() === 0)
  }
}
