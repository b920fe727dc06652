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

  /** Skew-safe replicated equi-join — the JOIN-side complement of
    * [[saltedAgg]] for when AQE's runtime skew split is unavailable
    * (non-AQE paths, streaming joins) or insufficient (a single key too
    * hot for any post-shuffle split to help because the SHUFFLE WRITE of
    * that key already serializes): the big side salts its shuffle key
    * with a deterministic [0, buckets) tiebreaker hash; the small side
    * replicates each row `buckets`× (an explode of a literal range — rows
    * multiply by `buckets`, so this is for genuinely small dimension
    * sides that are still too big or too dynamic to broadcast). The join
    * then shuffles on (keys, salt): a hot key's rows spread over
    * `buckets` reducers instead of one. Inner/left-outer safe: every big
    * row meets exactly one replica of each matching small row, so
    * multiplicities are unchanged — a spec asserts salted ≡ naive
    * bit-for-bit.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      tiebreaker: Column, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    // fail loudly: buckets <= 0 would make saltCol NULL (pmod by zero) and
    // explode(array()) drop every small row — silently empty results
    require(buckets > 0, s"bad salt bucket count: $buckets")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin preserves multiplicity for inner/left only: $joinType")
    val bigS = big.withColumn("__salt", saltCol(tiebreaker, buckets))
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] with replication restricted to HOT keys — the form
    * that survives a LARGE dimension side: uniform replication multiplies
    * the whole small side `buckets`×, but skew lives in a handful of keys,
    * so only those need spreading. `hot` is the model-sized heavy-key set
    * (pre-identified — e.g. a count-min/heavy-hitters pass, or last run's
    * AQE skew stats); it broadcasts to flag both sides. Hot keys salt
    * into `buckets` reducers and replicate `buckets`×; cold keys keep
    * salt 0 and a single replica — total small-side inflation is
    * |hot|·buckets, not |small|·buckets. Multiplicity unchanged (each
    * big row still meets exactly one replica of each matching small row).
    */
  def saltedJoinHot(big: DataFrame, small: DataFrame, keys: Seq[String],
      tiebreaker: Column, buckets: Int, hot: DataFrame,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, s"bad salt bucket count: $buckets")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoinHot preserves multiplicity for inner/left only: $joinType")
    val hotB = broadcast(
      hot.select(keys.map(col): _*).distinct().withColumn("__hot", lit(true)))
    val bigS = big.join(hotB, keys, "left")
      .withColumn("__salt", when(col("__hot"),
        saltCol(tiebreaker, buckets)).otherwise(lit(0)))
      .drop("__hot")
    val smallS = small.join(hotB, keys, "left")
      .withColumn("__salt", explode(when(col("__hot"),
        sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0)))))
      .drop("__hot")
    bigS.join(smallS, keys :+ "__salt", joinType).drop("__salt")
  }
}
