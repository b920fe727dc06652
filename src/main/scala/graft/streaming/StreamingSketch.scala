package graft.streaming

import graft.functions.CountMinSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed sketch aggregation over an unbounded stream: one count-min
  * grid per event-time tumbling window — approximate per-window item
  * frequencies with FIXED state per window, the streaming analytics
  * shape for "what's trending right now" at any input rate.
  *
  * Works because the CMS grid is a commutative, mergeable aggregation
  * state: Structured Streaming's incremental execution folds each
  * micro-batch's partial grids into the window's state exactly as the
  * batch HashAggregate would, and the watermark evicts finished windows
  * — so state is (open windows) × (depth·width longs), independent of
  * both rate and cardinality. Batch ≡ streaming bit-for-bit on bounded
  * input (StreamingSketchSpec), the same determinism contract as every
  * other sketch in the engine.
  */
object StreamingSketch {

  /** `events` must be a STREAMING DataFrame with an `itemCol` string and
    * a `tsCol` timestamp. Returns (window, grid) rows; write with
    * `.writeStream.outputMode("append")` (watermark-gated finalization).
    */
  def windowedCountMin(events: DataFrame, itemCol: String, tsCol: String,
      windowDuration: String, depth: Int, width: Int,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val cm = udaf(new CountMinSketch(depth, width))
    events
      .withWatermark(tsCol, watermarkDelay)
      // NULL items are dropped HERE (SQL-aggregate semantics): md5(null)
      // propagates null through the bucket columns, and a null array
      // element would die in the aggregator's Seq[Int] encoder
      .where(col(itemCol).isNotNull)
      .select(col(tsCol), CountMinSketch
        .bucketCols(col(itemCol), depth, width).as("b"))
      .groupBy(window(col(tsCol), windowDuration))
      .agg(cm(col("b")).as("grid"))
  }
}
