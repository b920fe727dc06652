package graft.streaming

import graft.similarity.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online vector retrieval: a STREAM of probe embeddings served top-k
  * nearest neighbors from a STATIC IVF-assigned corpus — the streaming
  * form of `sim_knn_ivf` (the "embed the query, hit the vector index"
  * serving path, as a Spark job instead of a vector store).
  *
  * Statelessness is the design point, exactly as in StreamingIndexDedup:
  * every stage is per-row or stream-static, so there is NO watermark and
  * NO state store at any stream length —
  *   1. quantization is a narrow projection (VectorOps fixed-point),
  *   2. coarse assignment runs against the LITERAL centroid model
  *      (driver-collected, model-sized — the sim_kmeans discipline), an
  *      argmin in a single projection with no join,
  *   3. candidate generation is one stream-static equi-join on
  *      centroid_id — per micro-batch the probe side is batch-sized and
  *      only the probed inverted lists of the index are touched.
  * The per-probe top-k cut is a window, which append-mode streams
  * disallow — and does not need: a probe lives in exactly ONE
  * micro-batch, so the per-batch cut IS the global answer. [[ranked]]
  * therefore runs in `foreachBatch` (the StreamingTopK two-level
  * pattern); [[scored]] alone is the unbounded-safe transform.
  *
  * Batch ≡ streaming by construction: [[scored]] is pure column ops +
  * a stream-static join, so the same function applied to a batch frame
  * is the batch lineage (asserted in StreamingAnnSpec).
  */
object StreamingAnn {

  /** The literal coarse-quantizer model from an `assignIvf` index: the
    * DISTINCT centroid_id values joined back to their own index rows
    * (vec_id = centroid_id) for q/n2. NOT `vec_id === centroid_id`
    * self-assignment — a centroid exactly colinear with a lower-id
    * centroid is assigned away from itself by the tie-break, and
    * filtering on self-assignment would silently drop it from the
    * model, making its inverted list unreachable to probes. Model-sized
    * driver collect (|centroids| rows), same discipline as the PQ
    * codebook and k-means centroid literals.
    */
  def centroidModel(index: DataFrame): Seq[(Long, Array[Long], Long)] = {
    val cids = index.select(col("centroid_id").as("cid")).distinct()
    index.join(cids, col("vec_id") === col("cid"))
      .select(col("vec_id"), col("q"), col("n2"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .toSeq
  }

  /** Score a probe stream against the static index. `probes` has
    * (probe_id, embedding ARRAY<FLOAT>); `index` is an `assignIvf`
    * output (vec_id, centroid_id, q, n2). Returns one row per (probe,
    * in-list candidate) with the exact integer-derived cosine —
    * unbounded-safe (stateless); cut to top-k per batch with [[ranked]].
    */
  def scored(probes: DataFrame, index: DataFrame,
      centroids: Seq[(Long, Array[Long], Long)]): DataFrame = {
    val d = VectorOps.dotFn(index)
    def litVec(v: Array[Long]) = array(v.map(lit(_)).toIndexedSeq: _*)
    // argmax cosine via struct-min over (negated cosine, centroid_id):
    // IEEE negation is exact, so the (cos desc, id asc) order matches
    // assignIvf's row_number tie-break bit-for-bit. cosineAssign (not
    // cosine) so a zero-norm probe or centroid scores -∞ in BOTH paths
    // instead of a NaN that batch and streaming order differently.
    val quantized = probes.select(col("probe_id"),
      VectorOps.quantizeFn(probes)(col("embedding")).as("pq"))
      .withColumn("pn2", d(col("pq"), col("pq")))
    val assigned = quantized.withColumn("centroid_id",
      array_min(array(centroids.map { case (cid, cq, cn2) =>
        struct(
          (-VectorOps.cosineAssign(d(col("pq"), litVec(cq)), col("pn2"),
            lit(cn2))).as("negcos"),
          lit(cid).as("cid"))
      }: _*)).getField("cid"))
    assigned.join(index, Seq("centroid_id"))
      .withColumn("cosine",
        VectorOps.cosine(d(col("pq"), col("q")), col("pn2"), col("n2")))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("centroid_id"), col("cosine"))
  }

  /** Per-probe top-k with the deterministic (cosine desc, neighbor asc)
    * tie-break — the batch-side half, for `foreachBatch` or a batch
    * frame.
    */
  def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
