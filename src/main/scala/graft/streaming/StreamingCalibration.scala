package graft.streaming

import org.apache.spark.sql.DataFrame

/** Continuous model-calibration monitoring — the streaming form of the
  * `txt_calibration` reliability card: per-score-bucket (n, positives,
  * Σ predicted-milli) over an unbounded stream of scored examples, with
  * the trained model held FIXED (weights come from the batch trainer —
  * online monitoring watches a deployed model, it does not retrain it).
  *
  * The whole card is `queries.Text.calibrationOf` — commutative
  * conditional sums over the ≤100 compile-time centi-buckets — so
  * Structured Streaming folds it incrementally with AT MOST 100 ROWS of
  * state regardless of rate, in `outputMode("complete")`: each
  * micro-batch emits the up-to-date reliability card, which is what a
  * drift dashboard consumes (a production score distribution sliding
  * away from its observed positive rate is THE retrain signal; the
  * batch card's gap_milli is that signal's column).
  *
  * StreamingCalibrationSpec proves the streamed final card ≡ the batch
  * card over the same rows under an arbitrary micro-batch slicing, and
  * that it coincides with txt_calibration itself when fed the fixture
  * scores.
  */
object StreamingCalibration {

  /** `scored` must be a STREAMING frame carrying (yy ∈ {0,1}, s_milli).
    * Returns the ≤100-row cumulative reliability card.
    */
  def card(scored: DataFrame): DataFrame =
    graft.queries.Text.calibrationOf(scored)
}
