package graft.streaming

import graft.queries.MultimodalQ
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming perceptual-hash asset dedup against a growing dHash index —
  * the online form of `mm_dhash_neardup`, and the media twin of
  * `StreamingIndexDedup`: assets arriving on a stream are admitted only
  * if no already-indexed asset (and no lower-id asset in the SAME
  * micro-batch) sits within hamming ≤ 3 of their 60-bit difference hash.
  *
  * Unlike the MinHash case, admission cannot be a stateless stream-side
  * anti-join: block collision alone is a CANDIDATE signal, and the exact
  * `bit_count(xor)` check needs the colliding hash on the same row. So
  * the decision runs in `foreachBatch` — the production delta-vs-index
  * shape (`dd_incremental_lsh`'s discipline): per micro-batch, one
  * narrow hash projection, an intra-batch block self-join (lower
  * asset_id wins — admission must not depend on how the source slices
  * batches), an equi-join of the delta's block rows against the index
  * layout (cost O(|delta| × bucket), never corpus²), the exact hamming
  * filter, and an anti-join back on asset_id. Admitted assets append to
  * the output AND their block rows append to the index, so a later
  * clone of an admitted asset is rejected — the index grows with the
  * stream.
  *
  * Restart/replay semantics (at-least-once foreachBatch): on start the
  * index is rebuilt as initialIndex ∪ blockedIndex(previous admitted
  * output), so a driver restart from the checkpoint — which skips
  * already-committed batches — does not forget their admissions. Within
  * a run, output appends BEFORE the index update: a crash between the
  * two replays the batch against an index that does not yet contain it,
  * re-admitting and re-appending the same rows — exact duplicates by
  * asset_id, removed by the standard idempotent-consumer read
  * (`dropDuplicates("asset_id")`). The reverse order would be worse:
  * index-first + crash would make the replay reject its own assets and
  * LOSE admissions permanently. Hash/block layouts are
  * [[MultimodalQ.dhash]]/`dhashBlockStructs` — the same definitions the
  * batch query uses (StreamingAssetDedupSpec asserts the equivalence).
  */
object StreamingAssetDedup {

  /** (asset_id, dhash) of an asset table carrying (asset_id, payload) —
    * the single hash pass; everything downstream derives from it.
    */
  private def hashed(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"),
      MultimodalQ.dhash(assets.sparkSession,
        substring(col("payload"), 1, MultimodalQ.DhashThumb)).as("dhash"))

  /** (asset_id, dhash) → one (blk, bv) row per block. */
  private def blocked(h: DataFrame): DataFrame =
    h.select(col("asset_id"), col("dhash"),
        explode(MultimodalQ.dhashBlockStructs(col("dhash"))).as("e"))
      .select(col("asset_id"), col("dhash"),
        col("e.blk").as("blk"), col("e.bv").as("bv"))

  /** (asset_id, dhash, blk, bv) block-bucket index layout of an asset
    * table carrying (asset_id, payload). In production this is a table
    * partitioned/bucketed by (blk, bv).
    */
  def blockedIndex(assets: DataFrame): DataFrame = blocked(hashed(assets))

  /** Batch admission: the subset of `batch` (asset_id, payload, …) with
    * no indexed asset — and no LOWER-id near-dup in the batch itself —
    * within hamming ≤ [[MultimodalQ.DhashMaxHamming]]. Exact by the same
    * pigeonhole as the batch query: a rejectable pair always shares a
    * block, so the equi-join candidates are complete. Intra-batch
    * rejection is transitive through chains (B near A, A near the index
    * ⇒ both rejected), matching the components-clustering treatment of
    * near-dup chains.
    */
  def novel(batch: DataFrame, index: DataFrame): DataFrame = {
    val h = hashed(batch).localCheckpoint() // one hash pass, many readers
    val b = blocked(h)
    val ham = MultimodalQ.DhashMaxHamming
    // intra-batch: drop any asset with a lower-id near-dup in the batch
    val intraDup = b.select(col("blk"), col("bv"),
        col("asset_id").as("__a"), col("dhash").as("__ha"))
      .join(b.select(col("blk"), col("bv"),
        col("asset_id").as("__b"), col("dhash").as("__hb")), Seq("blk", "bv"))
      .filter(col("__a") < col("__b") &&
        bit_count(col("__ha").bitwiseXOR(col("__hb"))) <= ham)
      .select(col("__b").as("asset_id")).distinct()
    // vs index: drop any asset within hamming of an indexed hash
    val idxDup = b
      .join(index.select(col("blk"), col("bv"), col("dhash").as("__h_idx")),
        Seq("blk", "bv"))
      .filter(bit_count(col("dhash").bitwiseXOR(col("__h_idx"))) <= ham)
      .select(col("asset_id")).distinct()
    batch.join(intraDup.unionByName(idxDup).distinct(),
      Seq("asset_id"), "left_anti")
  }

  /** Run the stream: admitted assets append to `outPath` (parquet), and
    * the in-memory index (lineage-truncated per batch) grows by each
    * admitted batch's block rows. On start, admissions already committed
    * to `outPath` by a previous incarnation rejoin the index — restart
    * safety. foreachBatch callbacks run serially per query, so the index
    * swap needs no lock.
    */
  def run(stream: DataFrame, initialIndex: DataFrame, outPath: String,
      checkpointDir: String): StreamingQuery = {
    val spark = stream.sparkSession
    val recovered =
      try blockedIndex(spark.read.parquet(outPath)
        .select(col("asset_id"), col("payload")))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.emptyDataFrame // no prior output — fresh start
      }
    @volatile var index =
      (if (recovered.columns.isEmpty) initialIndex
       else initialIndex.unionByName(recovered)).localCheckpoint()
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
