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
}
