package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class VideoFrameSourceSpec extends SparkSpec {
  import spark.implicits._

  private def mkCorpus(): String = {
    val dir = Files.createTempDirectory("vfsrc").toString
    Seq("a.mp4", "b.mkv", "c.avi", "notes.txt", "d.webm").foreach { n =>
      Files.writeString(java.nio.file.Path.of(dir, n), s"fake-$n")
    }
    dir
  }

  test("reads one row per synthetic frame; non-video files filtered") {
    val dir = mkCorpus()
    val df = spark.read.format("videoframes").load(dir)
    val byFile = df.groupBy("filename").count()
      .as[(String, Long)].collect().toMap
    // only .mp4/.mkv/.avi listed; frame count = decoder's hash-derived n
    assert(byFile.keySet.map(_.split('/').last) === Set("a.mp4", "b.mkv", "c.avi"))
    byFile.foreach { case (f, n) =>
      val expected = 1 + java.lang.Math.floorMod(f.hashCode, 7)
      assert(n === expected, f)
    }
  }

  test("rows match the flatMap form (pipeline.Frames) frame-for-frame") {
    val dir = mkCorpus()
    val v2 = spark.read.format("videoframes").load(dir)
      .select("filename", "timestamp_ms", "frame_per_sec", "frame_total")
      .as[(String, Long, Double, Double)].collect().toSet
    val listed = v2.map(_._1).toSeq.distinct.sorted
    val flatMapForm = graft.pipeline.Frames.extract(
        listed.toDF("filename")
          .withColumn("label", lit("x")).withColumn("dataset", lit("y")),
        new graft.pipeline.SyntheticFrameDecoder(), 500L)
      .toDF().select("filename", "timestamp_ms", "frame_per_sec", "frame_total")
      .as[(String, Long, Double, Double)].collect().toSet
    assert(v2 === flatMapForm)
  }

  test("column pruning pushes into the decoder: no image -> no pixel work") {
    val dir = mkCorpus()
    // metadata-only query: image column never referenced
    VideoFrameSource.pixelDecodes.set(0)
    val n = spark.read.format("videoframes").load(dir)
      .groupBy("filename").agg(count(lit(1))).count()
    assert(n > 0)
    assert(VideoFrameSource.pixelDecodes.get() === 0,
      "pruned scan must not decode pixels")
    // pruned schema is visible in the plan
    val plan = spark.read.format("videoframes").load(dir)
      .select("filename", "timestamp_ms")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("image"))

    // and a query that DOES read image decodes exactly the frame count
    VideoFrameSource.pixelDecodes.set(0)
    val withPixels = spark.read.format("videoframes").load(dir)
      .select(size(col("image")).as("px")).as[Int].collect()
    assert(withPixels.forall(_ === 8 * 8 * 3))
    assert(VideoFrameSource.pixelDecodes.get() === withPixels.length)
  }
}
