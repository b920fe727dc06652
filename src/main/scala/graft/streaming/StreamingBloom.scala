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
  *
  * Idempotent replay alone only covers a single driver lifetime: with a
  * durable `checkpointLocation`, a restarted driver resumes the source
  * PAST already-committed offsets while an in-memory bitset would reset
  * to zero — permanent false negatives, the one thing a decontamination
  * filter must never produce. So the accumulated filter itself is
  * persisted: when `persistPath` is set, each batch atomically rewrites
  * the OR'd bitset (write-temp + rename, any Hadoop filesystem) AFTER
  * folding it in, and construction reloads it before the query starts.
  * Persist-then-commit ordering means a crash between the two replays
  * the batch into an already-updated filter — idempotent, still exact.
  * Without `persistPath` the filter is memory-only and the query must
  * re-read the source from scratch on restart (no durable checkpoint).
  */
final class StreamingBloom(k: Int, bits: Int,
    persistPath: Option[String] = None) extends Serializable {
  require(bits % 64 == 0, s"bits must be a multiple of 64: $bits")
  private val words = bits / 64
  private val agg = new BloomSketch(words)
  // the running filter; foreachBatch callbacks run serially per query,
  // synchronized only for cross-thread reads via `snapshot`
  private val filter = new Array[Long](words)
  persistPath.foreach(loadPersisted)

  private def loadPersisted(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    // Crash-point analysis of persist(): the main file is deleted only
    // AFTER the tmp is completely written and closed, so if the main
    // file is missing the tmp (when present) is a complete, valid
    // filter — never a half-written one (a crash mid-tmp-write leaves
    // the main file untouched).
    val src = if (fs.exists(p)) Some(p)
      else if (fs.exists(tmp)) Some(tmp)
      else None
    src.foreach { f =>
      val in = new java.io.DataInputStream(fs.open(f))
      try {
        val kk = in.readInt()
        require(kk == k,
          s"persisted filter at $f was built with k=$kk, expected k=$k " +
            "(membership under a different probe count has false negatives)")
        val n = in.readInt()
        require(n == words,
          s"persisted filter at $f has $n words, expected $words")
        var i = 0
        while (i < words) { filter(i) = in.readLong(); i += 1 }
      } finally in.close()
    }
  }

  private def persist(path: String,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val fs = p.getFileSystem(conf)
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try {
      out.writeInt(k)
      out.writeInt(words)
      var i = 0
      while (i < words) { out.writeLong(filter(i)); i += 1 }
    } finally out.close()
    // HDFS rename won't overwrite, so the main file is deleted first;
    // the delete→rename gap is covered by loadPersisted's tmp fallback
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not persist bloom filter to $path")
  }

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
          // null keys contribute nothing (their md5 positions are null,
          // which would die in the aggregator's Seq[Int] encoder)
          .where(col(itemCol).isNotNull)
          .select(BloomSketch.positions(col(itemCol), k, bits).as("pos"))
          .agg(bl(col("pos")).as("bloom"))
          .collect()
        if (rows.nonEmpty && !rows(0).isNullAt(0)) {
          val batchBits = rows(0).getSeq[Long](0)
          synchronized {
            var i = 0
            while (i < words) { filter(i) |= batchBits(i); i += 1 }
            persistPath.foreach(persist(_, batch.sparkSession
              .sparkContext.hadoopConfiguration))
            onUpdate(filter.clone())
          }
        }
        ()
      }
      .start()
  }
}
