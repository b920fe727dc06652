package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  test("reduce increments one counter per depth row; grid is fixed-size") {
    val agg = new CountMinSketch(3, 8)
    var buf = agg.zero
    assert(buf.length === 24)
    buf = agg.reduce(buf, Seq(0, 5, 7))
    buf = agg.reduce(buf, Seq(0, 5, 7))
    buf = agg.reduce(buf, Seq(1, 5, 0))
    assert(buf(0) === 2L && buf(1) === 1L) // depth 0: buckets 0, 1
    assert(buf(8 + 5) === 3L) // depth 1: all three hit bucket 5
    assert(buf(16 + 7) === 2L && buf(16 + 0) === 1L) // depth 2
    assert(buf.sum === 9L) // 3 items x 3 depths
  }

  test("merge is element-wise addition") {
    val agg = new CountMinSketch(2, 4)
    val a = Array(1L, 0L, 2L, 0L, 0L, 3L, 0L, 1L)
    val b = Array(0L, 1L, 1L, 0L, 2L, 0L, 0L, 1L)
    assert(agg.merge(a.clone(), b).toSeq ===
      Seq(1L, 1L, 3L, 0L, 2L, 3L, 0L, 2L))
  }

  test("estimates never underestimate and are exact without collisions") {
    val d = 4; val w = 64
    val cm = udaf(new CountMinSketch(d, w))
    // skewed stream: token t_i appears i times, i = 1..30
    val items = (1 to 30).flatMap(i => Seq.fill(i)(s"t$i"))
    val tok = items.toDF("token")
    val grid = tok
      .select(CountMinSketch.bucketCols(col("token"), d, w).as("b"))
      .agg(cm(col("b")))
      .as[Seq[Long]].head()
    assert(grid.length === d * w)
    assert(grid.sum === items.length.toLong * d)
    val est = tok.distinct()
      .select(col("token"), CountMinSketch.estimate(
        typedLit(grid), col("token"), d, w).as("est"))
      .as[(String, Long)].collect().toMap
    (1 to 30).foreach { i =>
      assert(est(s"t$i") >= i, s"t$i underestimated") // CM never under
    }
    // 30 distinct keys in 64 buckets x 4 independent rows: the min over
    // depths is exact for the heavy hitter with overwhelming probability
    // under the deterministic md5 buckets (verified, not assumed)
    assert(est("t30") === 30L)
  }
}
