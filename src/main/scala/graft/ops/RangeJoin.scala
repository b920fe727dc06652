package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–point range join: pair every interval `(key, lo, hi)` with
  * every point `(key, t)` satisfying `lo <= t <= hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin (or worse,
  * CartesianProduct) — O(|I|×|P|) pairs examined, fatal at scale. The
  * scalable form is BIN BUCKETING: intervals explode to the fixed-width
  * time bins they overlap, points map to exactly ONE bin, and the join is
  * a plain equi-join on `(key, bin)` followed by the exact range
  * predicate. Each candidate pair is generated exactly once (a point has
  * one bin), so no dedup pass is needed. Cost: one shuffle of
  * |points| + |intervals|×(avg span / binSize) rows — tune `binSize`
  * toward the typical interval length so the explosion factor stays
  * small while bins stay selective.
  */
object RangeJoin {

  /** @param intervals interval rows with `key`, `lo`, `hi` (integral
    *                  time units, e.g. epoch millis); all columns kept
    * @param points    point rows with `key` and `t` in the same units;
    *                  columns other than `key` are attached with `prefix`
    * @param binSize   bin width in time units (≈ typical interval span)
    */
  def rangeJoin(intervals: DataFrame, points: DataFrame, key: String,
      lo: String, hi: String, t: String, binSize: Long,
      prefix: String = "p_"): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val pCols = points.columns.filterNot(_ == key).toSeq
    // `div` = exact integer floor-division on longs (times are epoch-
    // positive); doubles would round above 2^53
    val binned = intervals.withColumn("_bin",
      explode(sequence(
        expr(s"$lo div ${binSize}L"), expr(s"$hi div ${binSize}L"))))
    val pts = points.select(
      col(key) +: (expr(s"$t div ${binSize}L").as("_bin")
        +: pCols.map(c => col(c).as(s"$prefix$c"))): _*)
    binned.join(pts, Seq(key, "_bin"))
      .filter(col(s"$prefix$t").between(col(lo), col(hi)))
      .drop("_bin")
  }
}
