package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native interval sweep at scale: 1M points against 100k intervals
  * with deliberate heavy overlap (the regime where the bin-bucketed
  * rewrite's candidate duplication explodes) — must complete with
  * active-set memory bounded by concurrent overlap, and its aggregate
  * match-count must equal an independent per-key closed form.
  */
class IntervalScaleSpec extends SparkSpec {

  test("1M-point sweep over 100k heavily-overlapping intervals") {
    val keys = 50L
    // intervals: per key, 2000 of them, each spanning 500 ticks with
    // staggered starts — ~100 concurrently active at any tick
    val li = spark.range(100000L).select(
      (col("id") % keys).as("k"),
      (expr(s"id div $keys") * 5).as("lo"),
      (expr(s"id div $keys") * 5 + 499).as("hi"),
      col("id").as("lid"))
    val pts = spark.range(1000000L).select(
      (col("id") % keys).as("k"),
      expr(s"id div $keys").as("t"),
      col("id").as("pid"))
    val joined = NativeIntervalJoin
      .intervalJoin(li, pts, "k", "lo", "hi", "t")
    val n = joined.count()
    // closed form, computed independently: for key k's point at time t,
    // matching intervals are those with lo in [t-499, t] on the 5-tick
    // grid and lo <= max grid start — count them driver-side for a
    // deterministic sample of (k, t) and extrapolate exactly over the
    // identical per-key structure
    val perKeyPoints = 1000000L / keys
    val perKeyIntervals = 100000L / keys
    def matches(t: Long): Long = {
      val loMin = math.max(0L, t - 499)
      val gridFirst = (loMin + 4) / 5 * 5
      val gridLast = math.min(t / 5 * 5, (perKeyIntervals - 1) * 5)
      if (gridLast < gridFirst) 0L else (gridLast - gridFirst) / 5 + 1
    }
    val expect = keys * (0L until perKeyPoints).map(matches).sum
    assert(n === expect, s"got $n expected $expect")
  }
}
