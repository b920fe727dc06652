package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Stream-static (lookup/dimension) join — the remaining streaming join
  * mode after stream-stream (StreamingEnrich): each micro-batch of the
  * stream joins a STATIC dimension table. No watermark and no join state
  * are needed — the static side is not a stream, so nothing is ever held
  * waiting for it; Spark re-plans the join per micro-batch, which also
  * means a dimension table backed by a mutable source (a Delta/parquet
  * dir being rewritten) is re-read and picked up between batches.
  *
  * The dimension side is explicitly `broadcast()`: in the per-batch plan
  * the stream side then never shuffles — the exact analog of the batch
  * star-join discipline (q2/q8), and the only sane shape at production
  * rates (shuffling every micro-batch on the join key would put the
  * shuffle on the latency path).
  */
object StreamingLookup {

  /** Inner-join `stream` to broadcast `dim` on equal `key`. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "inner")
}
