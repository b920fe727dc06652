package graft.streaming

import graft.queries.MultimodalQ
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming video near-dup against a growing frame-fingerprint index —
  * the online form of `mm_video_neardup` (the upload-moderation path: a
  * recording arrives and its duplicates must surface NOW, against
  * everything already ingested), and the temporal-alignment sibling of
  * [[StreamingAssetDedup]]'s growing-index discipline.
  *
  * Per micro-batch ([[pairsForBatch]]): one fingerprint pass (the SAME
  * [[MultimodalQ.videoFrames]] definition the batch query gates — a
  * planted trimmed twin is caught here for the same reason), then
  * alignment votes from (a) batch frames → indexed frames via the
  * hash-bucketed equi-join and (b) batch frames → same-batch frames
  * (pair emission must not depend on how the source slices batches),
  * folded through the batch query's own packed-integer max (most votes,
  * then smallest offset) and the ≥ [[MultimodalQ.VideoMinAlign]] gate.
  * A pair is emitted exactly once — when its LATER recording arrives,
  * at which point both full fingerprint sequences exist, so the votes
  * are the batch votes.
  *
  * The contract (spec-proven): with no index cap, the streamed pair set
  * over ANY slicing equals the UNCAPPED batch alignment's — unlike the
  * ER linker's refinement-only guarantee, alignment evidence never
  * depends on arrival order. The batch DF cap has no slicing-stable
  * online equivalent (a hash can be cold when early pairs form and hot
  * later; the batch query judges df globally), so the cap is an
  * explicit `maxDf` PROBE bound here instead: a hash that is already
  * hot in the index stops generating candidates — per-batch probe cost
  * stays O(|batch frames| × maxDf) and a shared intro slate cannot go
  * quadratic (spec-planted), at the documented price of early-pair
  * divergence from the capped batch output.
  *
  * Restart safety is the StreamingEntityRes rule, split across two
  * stores: pairs append to `outPath` BEFORE the batch's frames append
  * to `indexPath`, so an at-least-once replay re-probes a pre-batch
  * index and re-emits the same rows (removed by the standard
  * idempotent-consumer `dropDuplicates`); index recovery dedups on
  * (rec_id, frame) so a replayed frame append can never double votes.
  */
object StreamingVideoNearDup {

  /** The index layout: one row per (recording, frame) fingerprint. */
  private val indexCols = Seq("rec_id", "nf", "frame", "h")

  private val indexSchema = org.apache.spark.sql.types.StructType(
    indexCols.map(n => org.apache.spark.sql.types.StructField(n,
      org.apache.spark.sql.types.LongType)))

  /** An empty index (schema-only). */
  def emptyIndex(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)

  /** Near-dup pairs completed by this batch: batch→index probes plus
    * intra-batch pairs, identical output columns to mm_video_neardup.
    * `batchFrames` must be in index layout; `maxDf` ≤ 0 disables the
    * probe bound.
    */
  def pairsForBatch(batchFrames: DataFrame, index: DataFrame,
      maxDf: Long = 0L): DataFrame = {
    val fb = batchFrames.localCheckpoint() // one fingerprint pass, 3 readers
    val probed =
      if (maxDf <= 0L) index
      else {
        // hot hashes stop generating candidates — the index-side probe
        // bound (see scaladoc: NOT the batch df cap's semantics)
        val cold = index.groupBy(col("h"))
          .agg(countDistinct(col("rec_id")).as("df"))
          .filter(col("df") <= maxDf)
          .select(col("h"))
        index.join(cold, Seq("h"))
      }
    // cross edges oriented a < b regardless of arrival order
    val cross = fb.select(col("h"), col("rec_id").as("nr"),
        col("frame").as("nfr"), col("nf").as("nnf"))
      .join(probed.select(col("h"), col("rec_id").as("ir"),
        col("frame").as("ifr"), col("nf").as("inf")), Seq("h"))
      .filter(col("nr") =!= col("ir"))
      .select(
        least(col("nr"), col("ir")).as("rec_a"),
        greatest(col("nr"), col("ir")).as("rec_b"),
        when(col("nr") < col("ir"), col("nfr") - col("ifr"))
          .otherwise(col("ifr") - col("nfr")).as("d"),
        when(col("nr") < col("ir"), col("nnf")).otherwise(col("inf"))
          .as("nf_a"),
        when(col("nr") < col("ir"), col("inf")).otherwise(col("nnf"))
          .as("nf_b"))
    val intra = fb.select(col("h"), col("rec_id").as("__a"),
        col("frame").as("__fa"), col("nf").as("__na"))
      .join(fb.select(col("h"), col("rec_id").as("__b"),
        col("frame").as("__fb"), col("nf").as("__nb")), Seq("h"))
      .filter(col("__a") < col("__b"))
      .select(col("__a").as("rec_a"), col("__b").as("rec_b"),
        (col("__fa") - col("__fb")).as("d"),
        col("__na").as("nf_a"), col("__nb").as("nf_b"))
    cross.unionByName(intra)
      .groupBy(col("rec_a"), col("rec_b"), col("d"),
        col("nf_a"), col("nf_b"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("rec_a"), col("rec_b"), col("nf_a"), col("nf_b"))
      .agg(max(col("n") * 1024 + (lit(512L) - col("d"))).as("pack"))
      .select(col("rec_a"), col("rec_b"),
        expr("pack div 1024").as("n_aligned"),
        (lit(512L) - expr("pack % 1024")).as("best_offset"),
        expr("(pack div 1024) * 1000 div least(nf_a, nf_b)")
          .as("containment_milli"))
      .filter(col("n_aligned") >= MultimodalQ.VideoMinAlign)
  }

  /** Run the stream of documents (doc_id, text): each batch fingerprints
    * through the batch lineage, emits the pairs it completes to
    * `outPath`, then grows the index at `indexPath` (the recovery
    * image). foreachBatch callbacks run serially, so the index swap
    * needs no lock.
    */
  def run(stream: DataFrame, outPath: String, indexPath: String,
      checkpointDir: String, maxDf: Long = 0L): StreamingQuery = {
    val spark = stream.sparkSession
    val recovered =
      try spark.read.parquet(indexPath)
        .select(indexCols.map(col): _*)
        .dropDuplicates("rec_id", "frame") // replayed appends can't double votes
      catch { case _: org.apache.spark.sql.AnalysisException =>
        emptyIndex(spark) // no prior index — fresh start
      }
    @volatile var index = recovered.localCheckpoint()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val frames = MultimodalQ.videoFrames(batch.sparkSession, batch)
          .select(indexCols.map(col): _*).localCheckpoint()
        pairsForBatch(frames, index, maxDf)
          .write.mode("append").parquet(outPath)
        frames.write.mode("append").parquet(indexPath)
        index = index.unionByName(frames).localCheckpoint()
      }
      .start()
  }
}
