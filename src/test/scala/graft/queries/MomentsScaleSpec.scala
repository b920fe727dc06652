package graft.queries

import graft.SparkSpec
import graft.streaming.StreamingMoments
import org.apache.spark.sql.functions._

/** Generated-corpus scale smoke for the moments-sketch family: 1M values
  * in 4 groups through the real sketch aggregation, generated distributed
  * (no driver-side data), with CLOSED-FORM expectations:
  *
  * group g = i mod 4; value = ((i div 4) mod 1000) · 0.512 — per group
  * every grid point b·0.512, b ∈ [0, 1000), appears exactly 250 times
  * (250k rows/group), a discrete uniform. So per group:
  *  - mean = 0.512·499.5 exactly (fxsum error ≤ the 1e-12 grid),
  *  - the integer-rank exact quantiles land on b = 499 (p50, rn·2 ≥ n)
  *    and b = 949 (p95, rn·20 ≥ 19n),
  *  - Cornish–Fisher on a uniform (skew 0, excess kurtosis −1.2) must
  *    track those within the expansion's accuracy class,
  * and the MERGE LAW must hold bitwise: folding 64-way-split partial
  * sketches equals folding one global aggregate.
  */
class MomentsScaleSpec extends SparkSpec {

  test("1M-value moments sketch: closed-form stats, bitwise merge law") {
    val n = 1000000L
    val corpus = spark.range(n).select(
      (col("id") % 4).as("g"),
      (expr("(id div 4) % 1000").cast("double") * lit(0.512)).as("value"),
      expr("id div 15625").as("shard")) // 64 shards of 15625 rows

    val aggs = StreamingMoments.sketchAggs(col("value"))
    val direct = StreamingMoments.quantiles(
      corpus.groupBy(col("g")).agg(aggs.head, aggs.tail: _*))
      .select(col("g"), col("n"), col("mean"), col("std"),
        col("q50_est"), col("q95_est"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(direct.size === 4)

    val meanExact = 0.512 * 499.5
    val q50Exact = 499 * 0.512
    val q95Exact = 949 * 0.512
    direct.values.foreach { r =>
      assert(r.getAs[Long]("n") === 250000L)
      assert(math.abs(r.getAs[Double]("mean") - meanExact) < 1e-9)
      // discrete-uniform std = 0.512·sqrt((1000²−1)/12)
      val stdExact = 0.512 * math.sqrt((1000.0 * 1000.0 - 1.0) / 12.0)
      assert(math.abs(r.getAs[Double]("std") - stdExact) < 1e-6)
      // CF on a symmetric platykurtic distribution: a few percent of range
      assert(math.abs(r.getAs[Double]("q50_est") - q50Exact) < 0.02 * 512)
      assert(math.abs(r.getAs[Double]("q95_est") - q95Exact) < 0.05 * 512)
    }

    // merge law at scale: 64-way partial sketches per group, merged by
    // addition, must fold to the SAME bits as the direct aggregate
    val merged = StreamingMoments.quantiles(
      StreamingMoments.merge(
        corpus.groupBy(col("g"), col("shard"))
          .agg(aggs.head, aggs.tail: _*),
        col("g")))
      .select(col("g"), col("n"), col("mean"), col("std"),
        col("q50_est"), col("q95_est"))
      .collect().map(r => r.getLong(0) -> r).toMap
    direct.foreach { case (g, r) =>
      val m = merged(g)
      Seq("mean", "std", "q50_est", "q95_est").foreach { c =>
        assert(m.getAs[Double](c) === r.getAs[Double](c),
          s"group $g column $c not bit-identical after merge")
      }
      assert(m.getAs[Long]("n") === r.getAs[Long]("n"))
    }
  }
}
