package graft.streaming

import graft.ops.Dq
import org.apache.spark.sql.DataFrame

/** Continuous data-quality monitoring — the streaming form of the
  * `dq_expectations` batch gate: cumulative violation counters over an
  * unbounded ingest of lineitem-schema rows.
  *
  * The whole check list is `ops.Dq.checkAggs` — commutative conditional
  * sums — so Structured Streaming folds them incrementally with ONE ROW
  * of state regardless of rate; the referential probe is a stateless
  * stream-static broadcast LEFT OUTER against the orders dimension
  * (no watermark, no keyed state). Run with `outputMode("complete")`:
  * each micro-batch emits the up-to-date verdict row, which is exactly
  * what a freshness dashboard or a circuit-breaker (stop the ingest when
  * n_orphans jumps) consumes. The keyed PK-duplicate ledger is the one
  * check that needs per-key state and stays batch-side (the
  * dq_expectations form) — on a stream it is StreamingTopK's keyed-count
  * shape, deliberately not duplicated here.
  *
  * StreamingDqSpec proves the streamed final counters ≡ `Dq.monitored`
  * over the same rows as a batch frame, on clean AND doctored input.
  */
object StreamingDq {

  /** `stream` must be a STREAMING lineitem-schema DataFrame; `orders` a
    * static dimension. Returns the 1-row cumulative counter frame.
    */
  def totals(stream: DataFrame, orders: DataFrame): DataFrame =
    Dq.monitored(stream, orders)
}
