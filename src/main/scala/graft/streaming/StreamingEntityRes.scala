package graft.streaming

import graft.queries.EntityRes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming entity resolution against a growing linked-record index —
  * the online form of the `er_*` family (the MDM ingest path: records
  * arrive from source systems continuously; each must be assigned an
  * entity id NOW, not at the next batch re-link), and the
  * record-linkage twin of [[StreamingAssetDedup]]'s growing-index
  * discipline.
  *
  * Per micro-batch ([[linkBatch]]): one narrow normalize+block pass
  * (the SAME [[EntityRes.keyed]] definition the batch family gates),
  * then match edges from (a) batch records → indexed records via the
  * blocked equi-join + levenshtein ≤ 1 (cost O(|delta| × block), never
  * corpus²) and (b) batch records → LOWER-id batch records (assignment
  * must not depend on how the source slices batches), resolved together
  * by the bounded [[graft.ops.Components]] min-label propagation — the
  * batch family's own clustering, run over the delta-sized edge set.
  * Matched records take the smallest reachable entity id; unmatched
  * records mint their own (entity_id = rec_id).
  *
  * The contract an online first-come assignment CAN honor (and the spec
  * proves): (1) REFINEMENT — two records sharing a streamed entity
  * always share a batch er_entities cluster, under ANY slicing: every
  * streamed edge is a batch edge, so a streamed entity can split a
  * batch cluster (a bridging record may arrive after both sides formed
  * separate entities — the index is never rewritten) but can never glue
  * two batch clusters; (2) on an id-ordered replay, records whose match
  * edges all point to LOWER ids land in their cluster-minimum's entity —
  * for the er fixture synthesis, every non-every-5th customer's three
  * variants share one entity. Restart safety = the StreamingAssetDedup
  * rule: the index is rebuilt from the committed output on start, and
  * output appends BEFORE the index grows, so an at-least-once replay
  * re-links against a pre-batch index and re-appends the same rows
  * (removed by the standard idempotent-consumer `dropDuplicates`).
  *
  * BLOCKING-KEY CONTRACT under a growing corpus (r15 verdict task 6):
  * the batch family's default key is the corpus-SCALED one
  * ([[EntityRes.scaledKeyed]] — digit-count grows with corpus size),
  * but this streaming path deliberately runs the FIXED
  * [[EntityRes.keyed]]. A scaled key is a function of n_corpus; in a
  * stream the corpus GROWS, so at every digit-threshold crossing every
  * previously-assigned block id becomes stale — and an APPEND-ONLY
  * first-come index cannot re-block without rewriting committed
  * history (the one thing this design promises never to do). The
  * consequences, pinned by StreamingEntityResSpec's crossing test:
  *   - assignments are STABLE across a crossing (batch-1 rows keep
  *     their entities no matter how large the corpus grows);
  *   - refinement holds against the batch FIXED-key lineage at any
  *     corpus size (streamed edges use exactly the fixed-key blocked
  *     predicate);
  *   - past a crossing the batch SCALED-key clustering can be strictly
  *     finer: a pair sharing the fixed 2-digit block at distance ≤ 1
  *     but differing in the 3rd digit streams into one entity while
  *     the scaled batch keeps them apart. A deployment therefore picks
  *     this path's key selectivity A PRIORI for the expected final
  *     corpus (more digits / composite fields), or bounds per-block
  *     cost with the capped lineage — it never re-keys a live index.
  */
object StreamingEntityRes {

  /** The index layout: (rec_id, norm, bk, entity_id). */
  private val indexCols = Seq("rec_id", "norm", "bk", "entity_id")

  private val indexSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("rec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("norm",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("bk",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("entity_id",
      org.apache.spark.sql.types.LongType)))

  /** An empty index (schema-only — built without touching the stream:
    * any batch operation on the streaming frame would be rejected at
    * analysis).
    */
  def emptyIndex(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)

  /** Link one batch of records against the index: returns the batch in
    * index layout with every record assigned an entity id.
    */
  def linkBatch(batch: DataFrame, index: DataFrame): DataFrame = {
    val kb = EntityRes.keyed(batch)
      .select(col("rec_id"), col("norm"), col("bk"))
      .localCheckpoint() // one normalize pass, three readers
    val idxEdges = kb
      .join(index.select(col("bk"), col("norm").as("__inorm"),
        col("entity_id")), Seq("bk"))
      // thresholded levenshtein (banded DP): -1 means "past 1", so
      // ≥ 0 IS the ≤ 1 decision — the scorer never pays full O(n·m)
      .filter(levenshtein(col("norm"), col("__inorm"), 1) >= 0)
      .select(col("rec_id").as("doc_a"), col("entity_id").as("doc_b"))
    val intra = kb.select(col("bk"), col("rec_id").as("__a"),
        col("norm").as("__na"))
      .join(kb.select(col("bk"), col("rec_id").as("__b"),
        col("norm").as("__nb")), Seq("bk"))
      .filter(col("__a") < col("__b") &&
        levenshtein(col("__na"), col("__nb"), 1) >= 0)
      .select(col("__a").as("doc_a"), col("__b").as("doc_b"))
    val labels = graft.ops.Components
      .label(idxEdges.unionByName(intra), rounds = 3)
      .withColumnRenamed("doc_id", "rec_id")
    kb.join(labels, Seq("rec_id"), "left")
      .withColumn("entity_id", coalesce(col("cluster_id"), col("rec_id")))
      .select(indexCols.map(col): _*)
  }

  /** Run the stream: every record's (rec_id, norm, bk, entity_id)
    * assignment appends to `outPath` (parquet) — which doubles as the
    * recovery image of the index — and the in-memory index grows by
    * each linked batch. foreachBatch callbacks run serially, so the
    * index swap needs no lock.
    */
  def run(stream: DataFrame, outPath: String, checkpointDir: String)
      : StreamingQuery = {
    val spark = stream.sparkSession
    val recovered =
      try spark.read.parquet(outPath).select(indexCols.map(col): _*)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        emptyIndex(spark) // no prior output — fresh start
      }
    @volatile var index = recovered.localCheckpoint()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val linked = linkBatch(batch, index).localCheckpoint()
        linked.write.mode("append").parquet(outPath)
        index = index.unionByName(linked).localCheckpoint()
      }
      .start()
  }
}
