package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous crawl-frontier monitoring — the streaming form of the
  * `web_host_frontier` batch card, fed by the `warc` table's own
  * MICRO_BATCH_READ path (sources.WarcSource): shards land in the
  * archive dir, the stream ingests their records incrementally, and
  * the per-host URL/byte counters fold with ≤|hosts| rows of state at
  * any rate (every column of the shared `Web.hostAgg` reduction is a
  * commutative, combinable sum over the host key).
  *
  * Run with `outputMode("complete")`: each micro-batch emits the
  * up-to-date frontier, which is what a crawl scheduler polls. The
  * batch card's `share_pm` column needs the 1-row corpus total crossed
  * against the per-host rows — a second streaming aggregate over an
  * aggregate, which Structured Streaming correctly refuses — so the
  * streamed card carries the politeness columns only and the share is
  * the consumer's one division (documented, not worked around).
  *
  * StreamingFrontierSpec proves the streamed final card ≡ the batch
  * reduction over the same shards, including shards that land
  * mid-stream.
  */
object StreamingFrontier {

  /** `stream` must be a STREAMING warc-schema frame. Returns the
    * per-host frontier with the fetch-round politeness column.
    */
  def perHost(stream: DataFrame): DataFrame = {
    val batchSize = graft.queries.Web.PoliteBatch
    graft.queries.Web.hostAgg(stream)
      .select(col("host"), col("n_urls"), col("total_bytes"),
        expr(s"(n_urls + ${batchSize - 1}) div $batchSize")
          .as("fetch_rounds"))
  }
}
