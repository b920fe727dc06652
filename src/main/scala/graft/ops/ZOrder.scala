package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the 100 TB answer to "queries
  * filter on TWO columns but files can only be sorted by one": interleave
  * the key bits so range-partitioning on the single z-value keeps every
  * partition tight in BOTH dimensions at once, and each file's min/max
  * footer statistics prune scans for predicates on either column (the
  * Delta/Iceberg OPTIMIZE ZORDER technique).
  *
  * The z-value is pure constant-unrolled bit arithmetic — `bits` shifts
  * and masks fused by codegen, no UDF — and deterministic, so it sits
  * under the DuckDB oracle gate (`q23_zorder`). The layout win (smaller
  * per-partition bounding boxes than any single-column sort) is asserted
  * quantitatively in ZOrderSpec.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `x` (even positions) and
    * `y` (odd positions). Inputs must be non-negative; values ≥ 2^bits
    * wrap (callers bucket first). bits ≤ 31.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits out of range: $bits")
    // cast to LONG first: on an INT column Spark's shift masks the count
    // mod 32, so interleaved positions ≥ 32 (bits ≥ 16) would silently
    // fold back onto low bits
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB mirror of [[zValue]] over SQL expressions `x`, `y`. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Lay `df` out along the z-curve of (xCol, yCol): range-partition on
    * the z-value, sort within partitions by it. One exchange (range
    * partitioning samples the z distribution) + per-partition sort — no
    * global sort barrier; downstream writes inherit the clustering, so
    * parquet row-group min/max stats become selective on BOTH columns.
    */
  def repartitionByZ(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(xCol, yCol, bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
