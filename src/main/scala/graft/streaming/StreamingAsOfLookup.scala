package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static TEMPORAL lookup — the as-of join's streaming form:
  * enrich each event with the dimension version that was valid AT THE
  * EVENT'S TIME (the SCD2 probe: "what tier was this user on when the
  * event happened"), not whatever version is current when the batch
  * runs. Completes the streaming join surface next to the equi-key
  * [[StreamingLookup]] and the stream-stream [[StreamingEnrich]], and
  * is the online twin of the native batch operator
  * ([[graft.plans.NativeAsOf]] — StreamingAsOfLookupSpec proves row
  * parity against it).
  *
  * Shape: the dimension compacts ONCE into a per-key array of versions
  * sorted newest-first ([[versionIndex]] — one batch-side aggregate,
  * model-sized output: Σ versions, the dimension's own size), and every
  * micro-batch then enriches with a broadcast hash join plus a NARROW
  * first-match array probe — no shuffle on the stream side, no window,
  * no per-batch sort, nothing on the latency path but the probe. The
  * stream side stays stateless (no watermark, no join state): a version
  * valid at the event's time is already in the index, so late events
  * enrich exactly like on-time ones — which is also why the result is
  * invariant to micro-batch slicing (spec-proven on a shuffled replay).
  *
  * At production scale the index is dimension-sized (users × versions),
  * exactly what the batch star-join broadcasts; a dimension too big to
  * broadcast is the cue to fall back to the batch native as-of merge on
  * a schedule instead of enriching on the stream.
  */
object StreamingAsOfLookup {

  /** Compact a dimension-version table into the broadcastable as-of
    * index: one row per `key` with `versions` = array of
    * struct(vf, p=struct(all dim columns)) sorted by `validFrom`
    * DESCENDING, so the first entry with vf ≤ event time is the match.
    * `validFrom` must be unique per key (version tables are — it's
    * their primary key); the key column is emitted as `__k` so the
    * probe side never collides with stream column names.
    */
  def versionIndex(dim: DataFrame, key: String, validFrom: String)
      : DataFrame = {
    val payload = struct(dim.columns.map(col): _*)
    dim.groupBy(col(key).as("__k"))
      .agg(sort_array(collect_list(struct(col(validFrom).cast("long")
        .as("vf"), payload.as("p"))), asc = false).as("versions"))
  }

  /** Enrich a (possibly streaming) frame: left-join the broadcast index
    * on the key, then take the NEWEST version with vf ≤ `eventTs` as a
    * `version` struct column (null when no version predates the event —
    * the as-of left-outer semantics). `get(…, 0)` rather than
    * `element_at(…, 1)`: get returns null on an empty filter result
    * under ANSI mode too, which is exactly the no-match case.
    */
  def enrich(stream: DataFrame, index: DataFrame, key: String,
      eventTs: String): DataFrame =
    stream.join(broadcast(index), col(key) === col("__k"), "left")
      .withColumn("version",
        get(filter(col("versions"),
          v => v.getField("vf") <= col(eventTs).cast("long")), lit(0))
          .getField("p"))
      .drop("__k", "versions")
}
