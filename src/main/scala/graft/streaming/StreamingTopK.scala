package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-window trending top-k over an unbounded stream — the streaming
  * form of `ev_window_topk` ("what's trending right now" at any input
  * rate).
  *
  * The (window, item) count is a plain windowed aggregation that
  * Structured Streaming folds incrementally exactly like the batch
  * HashAggregate (count is sum-combinable — replay-safe under
  * retrigger), with the watermark evicting closed windows: state is
  * (open windows) × (distinct items per window), independent of rate.
  * The RANK cut is a second, window-partitioned aggregation — append
  * mode disallows chaining it onto the count — and its input is
  * aggregate-sized (|items| rows per closed window, never events), so
  * [[ranked]] runs it per micro-batch in `foreachBatch` or on the
  * read-back of the count sink: the standard two-level pattern (the
  * stream maintains counts, the batch side ranks).
  *
  * Batch ≡ streaming on every emitted (watermark-closed) window
  * (StreamingTopKSpec), the same parity contract as StreamingHll.
  */
object StreamingTopK {

  /** `events` must be a STREAMING DataFrame with an `itemCol` and a
    * `tsCol` timestamp. Returns (window, item, n) count rows; write with
    * `.writeStream.outputMode("append")` (watermark-gated).
    */
  def windowedCounts(events: DataFrame, itemCol: String, tsCol: String,
      windowDuration: String,
      watermarkDelay: String = "10 seconds"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      // NULL items form their own group, exactly as batch GROUP BY
      // retains NULL keys — the batch≡streaming parity contract holds
      // for null itemCol too (StreamingTopKSpec plants nulls to prove it)
      .groupBy(window(col(tsCol), windowDuration), col(itemCol))
      .agg(count(lit(1)).as("n"))

  /** Rank a (finalized) count frame to the top-k per window with the
    * deterministic (count desc, item asc) tie-break — the batch-side
    * half, for `foreachBatch` or the count-sink read-back.
    */
  def ranked(counts: DataFrame, itemCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window"))
      .orderBy(col("n").desc, col(itemCol).asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
