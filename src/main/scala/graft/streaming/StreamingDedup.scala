package graft.streaming

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup: keep the first-seen document per normalized-text
  * hash over an unbounded stream — the streaming form of `dd_exact`.
  *
  * `dropDuplicatesWithinWatermark` bounds the dedup state: a hash is
  * remembered only until the watermark passes its event time, i.e. exact
  * dedup within the reordering window, which is the only state-bounded
  * guarantee an infinite stream admits (unbounded exact dedup would grow
  * state forever — the batch `dd_exact` covers that case).
  */
object StreamingDedup {

  /** `docs` must be a STREAMING DataFrame with (doc_id, text, event_time
    * TIMESTAMP). Emits the surviving (first-seen) rows.
    */
  def apply(docs: DataFrame, watermarkDelay: String = "10 seconds"): DataFrame =
    docs
      .withColumn("text_hash",
        md5(concat_ws(" ", TextOps.tokens(col("text"))).cast("binary")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
}
