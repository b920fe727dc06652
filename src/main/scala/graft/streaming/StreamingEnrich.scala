package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the enrichment shape
  * (purchases ⋈ recent clicks) that completes the engine's streaming
  * surface: windowed aggregation (StreamingCrop/Events), watermark dedup
  * (StreamingDedup), custom state (StreamingSession), and now two-sided
  * joins.
  *
  * Both sides carry a watermark and the join condition carries BOTH time
  * bounds — that pair is what lets Spark evict state: a left row is held
  * only until the watermark passes `leftTs + upper`, a right row until
  * `rightTs + upper` relative to the left bound, so state is
  * O(rate × interval), not O(stream). An inner join without the time
  * bounds would be rejected (or hold state forever with them missing on
  * one side).
  *
  * Output columns: all of left, then all of right (caller pre-renames any
  * collisions besides the join keys).
  */
object StreamingEnrich {

  /** `right.rightTs ∈ [left.leftTs - lowerMs, left.leftTs + upperMs]`,
    * keys equal, both streams watermarked by `delay`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lowerMs: Long, upperMs: Long, delay: String): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lowerMs MILLISECONDS") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upperMs MILLISECONDS"),
        "inner")
}
