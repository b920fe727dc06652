package graft.streaming

import graft.functions.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed distinct-count estimation over an unbounded stream — the
  * streaming form of `ev_hll_window` ("unique visitors per window" at any
  * input rate).
  *
  * The register table is a plain windowed `max` aggregation, which
  * Structured Streaming folds incrementally exactly like the batch
  * HashAggregate (max is commutative/idempotent — replay-safe), with the
  * watermark evicting closed windows: state is (open windows) × m
  * registers, independent of rate AND of the true cardinality — the
  * whole point of the sketch. The estimate fold is a SECOND aggregation,
  * which append-mode streaming disallows chained; it is model-sized
  * (m rows per window), so [[estimated]] runs it per micro-batch in
  * `foreachBatch` — the standard two-level pattern (stream maintains
  * registers, batch-side folds them).
  *
  * Batch ≡ streaming bit-for-bit on bounded input (StreamingHllSpec),
  * the same determinism contract as StreamingSketch's count-min grids.
  */
object StreamingHll {

  /** `events` must be a STREAMING DataFrame with an `itemCol` and a
    * `tsCol` timestamp. Returns (window, bucket, reg) register rows;
    * write with `.writeStream.outputMode("append")` (watermark-gated).
    */
  def windowedRegisters(events: DataFrame, itemCol: String, tsCol: String,
      windowDuration: String, m: Int,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val h = Hll.hash(col(itemCol))
    events
      .withWatermark(tsCol, watermarkDelay)
      .where(col(itemCol).isNotNull) // SQL-aggregate null semantics
      .select(col(tsCol), Hll.bucket(h, m).as("bucket"),
        Hll.rho(h, m).as("rho"))
      .groupBy(window(col(tsCol), windowDuration), col("bucket"))
      .agg(max(col("rho")).as("reg"))
  }

  /** Fold a (finalized) register frame down to one integer raw estimate
    * per window — the batch-side half, for use in `foreachBatch` or on
    * the read-back of the register sink.
    */
  def estimated(registers: DataFrame, m: Int): DataFrame =
    Hll.estimate(registers, m, col("window"))
}
