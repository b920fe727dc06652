package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributivity-decomposed skyline at 1M generated points — the
  * q26 family's scale smoke (one per operator family, the house rule):
  * the frontier must be a strict Pareto chain, dominate a large sample
  * of the input, and stay small enough to broadcast.
  */
class SkylineScaleSpec extends SparkSpec {

  test("1M-point two-level skyline is a strict Pareto chain that covers a sample") {
    val n = 1000000L
    // deterministic pseudo-random (price, size) — no Math.random in
    // lineage, recomputation-stable across partitionings
    val pts = spark.range(n).select(
      col("id").as("p_partkey"),
      concat(lit("pt"), col("id")).as("p_name"),
      (pmod(col("id") * 2654435761L, lit(1000000L)) / 100.0)
        .as("p_retailprice"),
      pmod(col("id") * 40503L + 7, lit(100000L)).cast("int").as("p_size"))
    val sky = Relational.paretoSkyline(pts, bucketWidth = 100)
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1))).sortBy(_._1)
    assert(sky.nonEmpty)
    // frontier must broadcast: output-sized, not data-sized
    assert(sky.length < 1000, s"frontier unexpectedly large: ${sky.length}")
    // strict Pareto chain: as price rises along the frontier, size must
    // strictly rise too (otherwise the cheaper point dominates)
    sky.sliding(2).foreach {
      case Array((pa, sa), (pb, sb)) =>
        assert(pa < pb && sa < sb, s"($pa,$sa) vs ($pb,$sb)")
      case _ => ()
    }
    // coverage: every sampled input point is weakly dominated by some
    // frontier point (cheaper-or-equal AND bigger-or-equal)
    val sample = pts.filter(col("p_partkey") % 997 === 0)
      .select(col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(sample.length > 500)
    sample.foreach { case (p, s) =>
      assert(sky.exists { case (fp, fs) => fp <= p && fs >= s },
        s"sample point ($p,$s) not covered by the frontier")
    }
  }
}
