package graft.streaming

import graft.queries.MultimodalQ
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming perceptual-hash asset dedup against a growing dHash index —
  * the online form of `mm_dhash_neardup`, and the media twin of
  * `StreamingIndexDedup`: assets arriving on a stream are admitted only
  * if no already-indexed asset sits within hamming ≤ 3 of their 60-bit
  * difference hash.
  *
  * Unlike the MinHash case, admission cannot be a stateless stream-side
  * anti-join: block collision alone is a CANDIDATE signal, and the exact
  * `bit_count(xor)` check needs the colliding index hash on the same
  * row. So the decision runs in `foreachBatch` — the production
  * delta-vs-index shape (`dd_incremental_lsh`'s discipline): per
  * micro-batch, one narrow hash projection, an equi-join of the delta's
  * block rows against the index layout (broadcast or storage-joined;
  * cost is O(|delta| × bucket), never corpus²), the exact hamming filter,
  * and an anti-join back on asset_id. Admitted assets append to the
  * output AND their block rows append to the index, so a later clone of
  * an admitted asset is rejected — the index grows with the stream.
  *
  * Replay semantics (at-least-once foreachBatch): output appends BEFORE
  * the index update. A crash between the two replays the batch against
  * an index that does NOT yet contain it, so its assets are re-admitted
  * and re-appended — exact duplicates by asset_id, removed by the
  * standard idempotent-consumer read (`dropDuplicates("asset_id")`).
  * The reverse order would be worse: index-first + crash would make the
  * replay reject its own assets and LOSE admissions permanently.
  * Hash/block layouts are [[MultimodalQ.dhash]]/`dhashBlockStructs` —
  * the same definitions the batch query uses, so online ≡ offline by
  * construction (StreamingAssetDedupSpec asserts it).
  */
object StreamingAssetDedup {

  /** (asset_id, dhash, blk, bv) block-bucket index layout of an asset
    * table carrying (asset_id, payload). In production this is a table
    * partitioned/bucketed by (blk, bv).
    */
  def blockedIndex(assets: DataFrame): DataFrame =
    assets
      .select(col("asset_id"),
        MultimodalQ.dhash(substring(col("payload"), 1,
          MultimodalQ.DhashThumb)).as("dhash"))
      .select(col("asset_id"), col("dhash"),
        explode(MultimodalQ.dhashBlockStructs(col("dhash"))).as("e"))
      .select(col("asset_id"), col("dhash"),
        col("e.blk").as("blk"), col("e.bv").as("bv"))

  /** Batch admission: the subset of `batch` (asset_id, payload, …) with
    * no indexed asset within hamming ≤ [[MultimodalQ.DhashMaxHamming]].
    * Exact by the same pigeonhole as the batch query: a rejectable pair
    * always shares a block, so the equi-join candidates are complete.
    */
  def novel(batch: DataFrame, index: DataFrame): DataFrame = {
    val hashed = batch.withColumn("__dhash",
      MultimodalQ.dhash(substring(col("payload"), 1,
        MultimodalQ.DhashThumb)))
    val blocked = hashed.select(col("asset_id"), col("__dhash"),
        explode(MultimodalQ.dhashBlockStructs(col("__dhash"))).as("e"))
      .select(col("asset_id"), col("__dhash"),
        col("e.blk").as("blk"), col("e.bv").as("bv"))
    val dupIds = blocked
      .join(index.select(col("blk"), col("bv"),
        col("dhash").as("__h_idx")), Seq("blk", "bv"))
      .filter(bit_count(col("__dhash").bitwiseXOR(col("__h_idx"))) <=
        MultimodalQ.DhashMaxHamming)
      .select(col("asset_id")).distinct()
    hashed.join(dupIds, Seq("asset_id"), "left_anti").drop("__dhash")
  }

  /** Run the stream: admitted assets append to `outPath` (parquet), and
    * the in-memory index (lineage-truncated per batch) grows by each
    * admitted batch's block rows. foreachBatch callbacks run serially
    * per query, so the index swap needs no lock.
    */
  def run(stream: DataFrame, initialIndex: DataFrame, outPath: String,
      checkpointDir: String): StreamingQuery = {
    @volatile var index = initialIndex.localCheckpoint()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val admitted = novel(batch, index).localCheckpoint()
        admitted.write.mode("append").parquet(outPath)
        index = index
          .unionByName(blockedIndex(admitted.select(col("asset_id"),
            col("payload"))))
          .localCheckpoint()
      }
      .start()
  }
}
