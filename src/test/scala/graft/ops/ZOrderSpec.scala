package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton math and the actual layout claim — a
  * point predicate on EITHER dimension prunes z-clustered partitions,
  * where a single-column sort prunes one dimension and scans every
  * partition for the other.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton values)") {
    // x=5 (101), y=3 (011): x bits land at even positions, y at odd ->
    // x0<<0 + y0<<1 + x1<<2 + y1<<3 + x2<<4 + y2<<5 = 1+2+0+8+16+0 = 27
    val got = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 3).as("z"))
      .as[Long].collect().toSeq
    assert(got === Seq(27L, 0L, 63L, 1L, 2L))
  }

  test("zValue matches its SQL mirror on a value grid") {
    val df = (0L until 64L).flatMap(x => (0L until 64L).map(y => (x, y)))
      .toDF("x", "y")
    val mismatches = df
      .withColumn("zc", ZOrder.zValue(col("x"), col("y"), 6))
      .withColumn("zs", expr(ZOrder.zValueSql("x", "y", 6)))
      .filter(col("zc") =!= col("zs")).count()
    assert(mismatches === 0)
  }

  test("point predicates on either dim prune z-partitions; x-sort can't") {
    val n = 1 << 14
    // deterministic pseudo-uniform grid points in [0,256)^2
    val pts = (0 until n).map { i =>
      ((i * 2654435761L >>> 8) & 255L, (i * 40503L >>> 4) & 255L)
    }.toDF("x", "y")
    // per-partition bounding boxes (the stand-in for parquet min/max stats)
    def boxes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.mapPartitions { it =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (rows.isEmpty) Iterator.empty
        else Iterator((rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).min, rows.map(_._2).max))
      }.collect().toSeq
    val zB = boxes(ZOrder.repartitionByZ(pts, col("x"), col("y"), 8, 16))
    val xB = boxes(
      pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")))
    def hitsY(b: Seq[(Long, Long, Long, Long)], v: Long) =
      b.count { case (_, _, lo, hi) => lo <= v && v <= hi }
    def hitsX(b: Seq[(Long, Long, Long, Long)], v: Long) =
      b.count { case (lo, hi, _, _) => lo <= v && v <= hi }
    // x-sort: x prunes hard, y scans everything
    assert(hitsX(xB, 200L) <= 3, s"x-sort should prune x: $xB")
    assert(hitsY(xB, 77L) >= 14, s"x-sort cannot prune y: $xB")
    // z-layout: BOTH dims prune (each partition is a bounded z-range =
    // a few curve quadrants, not a full-height stripe)
    assert(hitsX(zB, 200L) <= 10, s"z should prune x: $zB")
    assert(hitsY(zB, 77L) <= 10, s"z should prune y: $zB")
  }
}
