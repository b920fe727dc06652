package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (the ev_sessionize / q3 `user_id`
  * exposure at 100 TB: one viral user's events all land on one reducer).
  *
  * [[saltedAgg]] is the classic two-phase aggregation: phase 1 groups on
  * (key, salt) — salt derived deterministically from a tiebreaker column so
  * recomputation is stable — spreading a hot key over `buckets` reducers;
  * phase 2 merges the per-salt partials on the key alone. The phase-2
  * shuffle carries one row per (key, salt), independent of input skew.
  *
  * Works for aggregates with a decomposable merge (sum/count/min/max —
  * anything Spark itself partial-aggregates). AQE's skew-join handling
  * covers the join side; this covers aggregation, which AQE does not
  * re-balance when a single group is hot (partial aggregation already
  * collapses per-partition duplicates, but a single-key window function or
  * collect_list does not combine — those are the real consumers here).
  */
object Salt {

  /** Deterministic salt in [0, buckets) from a tiebreaker column. */
  def saltCol(tiebreaker: Column, buckets: Int): Column =
    pmod(hash(tiebreaker), lit(buckets))

  /** Two-phase salted aggregation.
    *
    * @param aggs phase-1 aggregates (run per (keys, salt))
    * @param merges phase-2 merges over the phase-1 column names — e.g.
    *   phase 1 `count(*) as n` merges as `sum(n) as n`
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], tiebreaker: Column,
      buckets: Int, aggs: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("__salt", saltCol(tiebreaker, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
}
