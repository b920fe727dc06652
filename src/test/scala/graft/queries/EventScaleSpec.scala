package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Generated-corpus scale smoke for the event-time family (the dd/sim/mm
  * precedent applied to events): 1M events over 10k users — 20× the
  * sf0.1 fixture — through the REAL scd2Intervals lineage, generated
  * distributed (no driver-side data).
  *
  * Events: user = id mod 10k (100 events/user), event time =
  * user-interleaved minutes (strictly increasing per user), state drawn
  * deterministically from 5 values with runs (state changes every ~3
  * events via integer hash). Asserts the conservation laws any interval
  * table must satisfy at any scale:
  *  1. Σ n_events over intervals = 1M exactly (every event in exactly
  *     one run);
  *  2. intervals TILE each user's timeline: runs alternate states and
  *     valid_to of run r equals valid_from of run r+1 (no gaps, no
  *     overlaps), checked corpus-wide with one window pass;
  *  3. exactly one open (is_current) interval per user.
  */
class EventScaleSpec extends SparkSpec {

  private val nEvents = 1000000L
  private val nUsers = 10000L

  private def corpus = spark.range(nEvents).select(
    col("id").as("event_id"),
    (col("id") % nUsers).as("user_id"),
    // per-user sequence number drives event time: strictly increasing
    expr(s"id div $nUsers").as("seq"))
    .withColumn("ems", lit(1700000000000L) + col("seq") * 60000L +
      col("user_id")) // per-user unique, strictly increasing in seq
    .withColumn("event_type",
      concat(lit("s"),
        (expr("hash(user_id, seq div 3)") % 5 + 5) % 5))
    .select(col("event_id"), col("user_id"), col("ems"), col("event_type"))

  test("1M-event SCD2: conservation, tiling, one open run per user") {
    val iv = Events.scd2Intervals(corpus).localCheckpoint()

    val agg = iv.agg(
      sum(col("n_events")).as("n"),
      sum(col("is_current").cast("long")).as("open"),
      count(lit(1)).as("runs")).head
    assert(agg.getLong(0) == nEvents, "every event in exactly one run")
    assert(agg.getLong(1) == nUsers, "exactly one open run per user")
    assert(agg.getLong(2) > nUsers, "state changes produced multiple runs")

    // tiling + alternation, one window pass over the interval table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("run_id"))
    val bad = iv
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_from").isNotNull)
      .filter(col("valid_to") =!= col("next_from") ||
        col("state") === col("next_state"))
      .count()
    assert(bad == 0L, s"$bad non-tiling or non-alternating interval pairs")
  }
}
