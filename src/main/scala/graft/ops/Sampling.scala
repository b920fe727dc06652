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

  /** Weighted Bernoulli sampling: keep a row with probability
    * min(1, weight / 2^log2Denom), deterministically — the 60-bit md5
    * prefix of the key is a uniform draw in [0, 2^60), kept iff below
    * `min(weight, 2^log2Denom) × 2^(60 - log2Denom)`. The weight is
    * clamped to the denominator FIRST (a heavier row already keeps with
    * probability 1, and an unclamped product would overflow long
    * arithmetic for weight > 2^(log2Denom+3)), so the threshold is EXACT
    * overflow-free long arithmetic (clamped weight ≤ 2^log2Denom ⇒
    * threshold ≤ 2^60) and both engines agree bit-wise for ANY weight.
    * Narrow (a filter), recomputation-stable, composes with incremental
    * data — the quality-weighted corpus sampling op ("prefer longer /
    * higher-scoring docs") in its deterministic form.
    *
    * @param weight    integral weight column (e.g. n_chars)
    * @param log2Denom keep probability = weight / 2^log2Denom
    */
  def weighted(df: DataFrame, key: Column, weight: Column,
      log2Denom: Int): DataFrame = {
    require(log2Denom > 0 && log2Denom < 60, s"bad log2Denom $log2Denom")
    // key → string → binary: both engines hash the decimal rendering
    df.filter(
      conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        < least(weight.cast("long"), lit(1L << log2Denom)) *
          lit(1L << (60 - log2Denom)))
  }

  /** DuckDB mirror of [[weighted]]'s predicate. */
  private[graft] def weightedSql(keyExpr: String, weightExpr: String,
      log2Denom: Int): String =
    s"""CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT)
        < LEAST(CAST($weightExpr AS BIGINT), ${1L << log2Denom})
          * ${1L << (60 - log2Denom)}"""
}
