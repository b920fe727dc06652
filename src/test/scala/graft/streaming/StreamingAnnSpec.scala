package graft.streaming

import graft.{SparkSpec, Tables}
import graft.similarity.VectorOps
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Online ANN serving over a static IVF index: a stream of probe
  * embeddings scored + ranked per micro-batch, asserted exactly equal to
  * the same lineage run in batch, stateless (no watermark, no state
  * store), and in-list only (every neighbor shares the probe's assigned
  * centroid).
  */
class StreamingAnnSpec extends SparkSpec {
  import spark.implicits._

  test("probe stream → IVF bucket join → per-batch top-k ≡ batch; " +
      "stateless and in-list") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = Tables.sharded(spark, sfDir, "embeddings")
    // corpus = the lower vec_ids; probes = the top 10, kept OUT of the
    // index so the serving path (external query vectors) is what's tested
    val maxId = emb.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val index = VectorOps.assignIvf(
      emb.filter(col("vec_id") <= maxId - 10), 25).localCheckpoint()
    val centroids = StreamingAnn.centroidModel(index)
    assert(centroids.nonEmpty && centroids.size <= 25) // model-sized
    val probes = emb.filter(col("vec_id") > maxId - 10)
      .select(col("vec_id").as("probe_id"), col("embedding"))

    val dir = Files.createTempDirectory("ann_in").toString
    val ckpt = Files.createTempDirectory("ann_ckpt").toString
    probes.filter(col("probe_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    probes.filter(col("probe_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(probes.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val scoredStream = StreamingAnn.scored(stream, index, centroids)
    assert(!scoredStream.queryExecution.analyzed.toString
      .contains("EventTimeWatermark")) // stateless by construction
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Int)]
    val q = scoredStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // a probe lives in exactly one micro-batch → per-batch cut is
        // the global top-k (the StreamingTopK two-level pattern)
        sink.synchronized {
          sink ++= StreamingAnn.ranked(batch, 3)
            .select(col("probe_id"), col("neighbor_id"), col("cosine"),
              col("rank"))
            .as[(Long, Long, Double, Int)].collect()
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = sink.toSet
    val batch = StreamingAnn.ranked(
      StreamingAnn.scored(probes, index, centroids), 3)
      .select(col("probe_id"), col("neighbor_id"), col("cosine"),
        col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
    assert(streamed.map(_._1) === probes.select(col("probe_id"))
      .as[Long].collect().toSet) // every probe answered

    // in-list contract: every neighbor shares its probe's centroid
    val scoredBatch = StreamingAnn.scored(probes, index, centroids)
    val offList = scoredBatch
      .join(index.select(col("vec_id").as("neighbor_id"),
        col("centroid_id").as("idx_cent")), "neighbor_id")
      .filter(col("centroid_id") =!= col("idx_cent"))
    assert(offList.count() === 0)
  }

  test("centroidModel covers every centroid_id in the index, including a " +
      "centroid assigned away from itself") {
    // centroid 7 is colinear with lower-id centroid 3, so assignIvf's
    // (cos desc, id asc) tie-break assigned 7's own row to 3 — but
    // vector 11 sits in 7's inverted list. Deriving the model from
    // self-assigned rows (vec_id === centroid_id) would drop 7 and make
    // vector 11 unreachable; the distinct-centroid_id derivation keeps it.
    val index = Seq(
      (3L, 3L, Seq(1000L, 0L), 1000000L),
      (7L, 3L, Seq(2000L, 0L), 4000000L),
      (11L, 7L, Seq(0L, 500L), 250000L)
    ).toDF("vec_id", "centroid_id", "q", "n2")
    val model = StreamingAnn.centroidModel(index)
    assert(model.map(_._1).toSet === Set(3L, 7L))
    val m7 = model.find(_._1 == 7L).get
    assert(m7._2.toSeq === Seq(2000L, 0L) && m7._3 === 4000000L)
  }

  test("zero-norm probe coarse-assigns identically in batch and streaming " +
      "(guarded -inf beats NaN order divergence)") {
    // Unguarded, a zero vector's cosine to every centroid is NaN, which
    // a batch `ccos DESC` row_number sorts FIRST and the streaming
    // struct-min sorts LAST. cosineAssign maps zero-norm to -inf in both
    // paths, so both fall through to the centroid_id-asc tie-break.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.8f, 0.3f)),
      (5L, Seq(0.0f, 1.0f)), (6L, Seq(0.1f, 0.9f)), (7L, Seq(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val index = VectorOps.assignIvf(emb, 5) // centroids: 0 and 5
    val batchAssign = index.filter(col("vec_id") === 7L)
      .select(col("centroid_id")).as[Long].collect()
    assert(batchAssign.toSeq === Seq(0L)) // -inf tie → lowest centroid id

    val centroids = StreamingAnn.centroidModel(index.localCheckpoint())
    val probe = Seq((7L, Seq(0.0f, 0.0f))).toDF("probe_id", "embedding")
    val streamAssign = StreamingAnn.scored(probe, index, centroids)
      .select(col("centroid_id")).distinct().as[Long].collect()
    assert(streamAssign.toSeq === Seq(0L)) // same centroid as batch
  }
}
