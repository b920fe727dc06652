package graft.streaming

import graft.SparkSpec
import graft.pipeline.Samples
import java.nio.file.Files
import org.apache.spark.sql.functions.col

class StreamingCropSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("filename", "label", "dataset", "frame_per_sec",
    "frame_total", "timestamp_ms")

  // v1: 4 frames over 2 s; v2: 2 frames over 1 s (same fixture as SamplesSpec)
  private def batchFrames = Seq(
    ("v1.mp4", "en", "train", 2.0, 4.0, 0L),
    ("v1.mp4", "en", "train", 2.0, 4.0, 500L),
    ("v1.mp4", "en", "train", 2.0, 4.0, 1000L),
    ("v1.mp4", "en", "train", 2.0, 4.0, 1500L),
    ("v2.mp4", "fr", "test", 2.0, 2.0, 0L),
    ("v2.mp4", "fr", "test", 2.0, 2.0, 500L)).toDF(cols: _*)

  test("batch ≡ streaming: crop_video emits identical windows (append mode)") {
    val inDir = Files.createTempDirectory("stream_in").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    // first file: the real frames
    batchFrames.coalesce(1).write.parquet(s"$inDir/batch0")

    val stream = spark.readStream
      .schema(batchFrames.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
    val windows = StreamingCrop(stream, Seq("timestamp_ms"),
      sequenceLengthMs = 1000, periodMs = 500, watermarkDelay = "1 second")

    val q = windows.writeStream
      .format("memory")
      .queryName("crop_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // append mode only finalizes windows once the watermark passes them:
      // a late sentinel frame (whose own windows fail the validity rule and
      // vanish) pushes the watermark far past every real window
      Seq(("zz_sentinel.mp4", "zz", "train", 2.0, 1.0, 3600000L))
        .toDF(cols: _*).coalesce(1).write.parquet(s"$inDir/batch1")
      q.processAllAvailable()
      // one more microbatch so the advanced watermark takes effect
      Seq(("zz_sentinel.mp4", "zz", "train", 2.0, 1.0, 3601000L))
        .toDF(cols: _*).coalesce(1).write.parquet(s"$inDir/batch2")
      q.processAllAvailable()

      val streamed = spark.table("crop_stream")
        .filter(!col("filename").startsWith("zz_"))
        .select("window_start", "window_end", "filename", "timestamp_ms")
        .as[(Long, Long, String, Seq[Long])].collect().toSet
      val batch = Samples.cropVideo(batchFrames, Seq("timestamp_ms"),
        sequenceLengthMs = 1000, periodMs = 500)
        .select("window_start", "window_end", "filename", "timestamp_ms")
        .as[(Long, Long, String, Seq[Long])].collect().toSet

      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
