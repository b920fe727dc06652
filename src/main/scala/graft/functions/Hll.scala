package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog over the engine-standard 60-bit md5 hash, kept ENTIRELY in
  * integer arithmetic so the sketch and its estimate are bit-reproducible
  * in portable SQL (DuckDB mirrors in queries/Text and queries/Events):
  *
  *  - bucket  = h mod m
  *  - rho     = (leading zeros of the next 32 hash bits) + 1
  *            = 33 − bitlength(r), with bitlength(r) = len(bin(r)) — an
  *              identity both engines share (r = 0 ⇒ rho = 33)
  *  - register = max(rho) per (group, bucket) — a plain combinable max
  *  - raw estimate α·m²/Σ2^−reg as integers: S = Σ 2^(33−reg) with empty
  *    registers contributing 2^33, est_milli = (α₁₀₀₀·m²·2^33) div S
  *
  * The register table is m rows per group forever (the 100 TB contract);
  * the estimate is one more combinable aggregation over it. No small- or
  * large-range correction — this is the raw HLL estimator, documented as
  * such, and the exact count runs alongside wherever accuracy is graded.
  */
object Hll {

  /** α₁₀₀₀ for m = 64: 0.7213/(1 + 1.079/64) to 3 decimals. */
  val AlphaMilli64 = 709L

  /** HLL bias constant ×1000 for a given register count (Flajolet et al.:
    * fixed small-m values, 0.7213/(1 + 1.079/m) beyond). Pinned to
    * literals for the oracle-mirrored sizes so the SQL constants can't
    * drift from the Scala side.
    */
  def alphaMilli(m: Int): Long = m match {
    case 16 => 673L
    case 32 => 697L
    case 64 => AlphaMilli64
    case _ =>
      require(m >= 128 && (m & (m - 1)) == 0, s"m must be a power of 2: $m")
      math.round(1000.0 * 0.7213 / (1 + 1.079 / m))
  }

  /** 60-bit md5 prefix of an (arbitrary-typed) item, cast to string. */
  def hash(item: Column): Column =
    conv(substring(md5(item.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Register bucket of hash `h` for an m-register sketch. */
  def bucket(h: Column, m: Int): Column = pmod(h, lit(m.toLong))

  /** rho(h) = leading-zero count of the 32 post-bucket hash bits + 1. */
  def rho(h: Column, m: Int): Column = {
    val r = pmod(call_function("div", h, lit(m.toLong)), lit(1L << 32))
    when(r === 0, lit(33L)).otherwise(lit(33L) - length(bin(r)))
  }

  /** Fold a register table (groupCols*, "reg") down to the integer raw
    * estimate column `est_milli` per group: one combinable aggregation.
    */
  def estimate(regs: DataFrame, m: Int, groupCols: Column*): DataFrame =
    regs.groupBy(groupCols: _*)
      .agg((sum(call_function("shiftleft", lit(1L),
          (lit(33L) - col("reg")).cast("int"))) +
        (lit(m.toLong) - count(lit(1))) * lit(1L << 33)).as("s"))
      .withColumn("est_milli",
        call_function("div", lit(alphaMilli(m) * m * m * (1L << 33)),
          col("s")))
      .drop("s")
}
