package graft.streaming

import graft.functions.BloomSketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Bloom-filter accumulation: maintain one membership bitset
  * over an unbounded stream of keys (the incremental form of
  * `dd_bloom_decontam`'s build side — how a decontamination filter keeps
  * up with a training corpus that is still being ingested).
  *
  * Each micro-batch aggregates its keys' bit positions into a batch-local
  * bitset DISTRIBUTED (one combinable aggregation per batch, the same
  * plan as the batch build), and `foreachBatch` ORs that 128 KB result
  * into the running filter. Because Bloom insertion is idempotent and
  * commutative, at-least-once `foreachBatch` semantics give exactly the
  * correct filter — a replayed batch re-ORs bits that are already set.
  * That idempotency is the whole reason this needs no state store: the
  * accumulated filter IS the state, bounded at `words × 8` bytes forever.
  */
final class StreamingBloom(k: Int, bits: Int) extends Serializable {
  require(bits % 64 == 0, s"bits must be a multiple of 64: $bits")
  private val words = bits / 64
  private val agg = new BloomSketch(words)
  // the running filter; foreachBatch callbacks run serially per query,
  // synchronized only for cross-thread reads via `snapshot`
  private val filter = new Array[Long](words)

  /** Current contents of the filter (copy). */
  def snapshot: Array[Long] = synchronized(filter.clone())

  /** Start accumulating `itemCol` of the streaming frame `items` into
    * this filter; `onUpdate` observes the filter after each batch.
    */
  def build(items: DataFrame, itemCol: String,
      onUpdate: Array[Long] => Unit = _ => ()): StreamingQuery = {
    val bl = udaf(agg)
    items.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch
          .select(BloomSketch.positions(col(itemCol), k, bits).as("pos"))
          .agg(bl(col("pos")).as("bloom"))
          .collect()
        if (rows.nonEmpty && !rows(0).isNullAt(0)) {
          val batchBits = rows(0).getSeq[Long](0)
          synchronized {
            var i = 0
            while (i < words) { filter(i) |= batchBits(i); i += 1 }
            onUpdate(filter.clone())
          }
        }
        ()
      }
      .start()
  }
}
