package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the training-data answer to
  * `df.sample()`: membership is a pure function of the row key, so the
  * sample is identical across runs, engines, and recomputed partitions
  * (a rand()-based sample is none of those), and it composes with
  * incremental data (new rows don't reshuffle old membership).
  */
object Sampling {

  /** Last included 2-hex-digit md5 bucket for a fraction (256 buckets,
    * same quantization rule as Ingest.hashBucket).
    */
  private[graft] def hex2(fraction: Double): String = {
    val last = math.min(255L, math.round(fraction * 256) - 1)
    if (last < 0) "" else f"$last%02x"
  }

  /** Keep ≈`fraction` of rows per stratum. The hash key is
    * (stratum | key), so each stratum is sampled independently — a skewed
    * stratum can't starve the others, and per-stratum rates hold
    * regardless of relative stratum sizes. Narrow (a filter): no shuffle.
    */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      fraction: Double): DataFrame =
    df.filter(
      substring(md5(concat(stratum, lit("|"), key).cast("binary")), 1, 2)
        <= lit(hex2(fraction)))

  /** DuckDB mirror of [[stratified]]'s predicate. */
  private[graft] def stratifiedSql(stratumExpr: String, keyExpr: String,
      fraction: Double): String =
    s"substr(md5($stratumExpr || '|' || $keyExpr), 1, 2) <= '${hex2(fraction)}'"
}
