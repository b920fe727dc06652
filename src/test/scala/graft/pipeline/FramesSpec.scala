package graft.pipeline

import graft.SparkSpec

/** Records the content-byte lengths a probe decoder observes (JVM-static so
  * executor-side task copies report into the same queue under local mode).
  */
object ContentProbeSink {
  val lengths = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}

class ContentProbe extends FrameDecoder {
  override def decode(filename: String, content: Array[Byte],
      sampleRateMs: Long): Iterator[DecodedFrame] = {
    ContentProbeSink.lengths.add(if (content == null) -1 else content.length)
    Iterator.empty
  }
}

class FramesSpec extends SparkSpec {
  import spark.implicits._

  test("O7 synthetic decode is deterministic across calls") {
    val d = new SyntheticFrameDecoder(height = 4, width = 4, maxFrames = 5)
    val a = d.decode("v/l/s/x.mp4", null, 500).toSeq
    val b = d.decode("v/l/s/x.mp4", null, 500).toSeq
    assert(a.size === b.size)
    a.zip(b).foreach { case (fa, fb) =>
      assert(fa.timestampMs === fb.timestampMs)
      assert(fa.image.sameElements(fb.image))
    }
  }

  test("O7 frame cadence: timestamps step by sampleRateMs, fps derived") {
    val d = new SyntheticFrameDecoder(maxFrames = 7)
    val frames = d.decode("v/l/s/y.mkv", null, 250).toSeq
    assert(frames.map(_.timestampMs) === frames.indices.map(_ * 250L))
    assert(frames.forall(_.framePerSec === 4.0)) // 1000/250
    assert(frames.forall(_.frameTotal === frames.size.toDouble))
  }

  test("O7 Frames.extract expands files 1→N with context carried through") {
    val files = Seq(
      ("v/en/s/a.mp4", "en", "train"),
      ("v/fr/s/b.mp4", "fr", "test")).toDF("filename", "label", "dataset")
    val frames = Frames.extract(files,
      new SyntheticFrameDecoder(height = 2, width = 2), 500)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.image.length === 2 * 2 * 3))
    assert(rows.forall(r => r.image.forall(p => p >= 0f && p < 1f)))
    val byFile = rows.groupBy(_.filename)
    assert(byFile.keySet === Set("v/en/s/a.mp4", "v/fr/s/b.mp4"))
    byFile.foreach { case (_, fs) =>
      assert(fs.map(_.timestamp_ms).sorted.toSeq ===
        fs.indices.map(_ * 500L))
      assert(fs.forall(_.frame_total == fs.length.toDouble))
    }
    assert(rows.filter(_.filename.contains("a.mp4")).forall(_.label == "en"))
  }

  test("O7 binary content reaches the decoder when present") {
    ContentProbeSink.lengths.clear()
    val files = Seq(("v/l/s/a.mp4", "l", "train", Array[Byte](1, 2, 3, 4)))
      .toDF("filename", "label", "dataset", "content")
    Frames.extract(files, new ContentProbe, 500).collect()
    import scala.jdk.CollectionConverters._
    assert(ContentProbeSink.lengths.asScala.toSeq === Seq(4))
    // and without a content column the decoder receives null
    ContentProbeSink.lengths.clear()
    Frames.extract(files.drop("content"), new ContentProbe, 500).collect()
    assert(ContentProbeSink.lengths.asScala.toSeq === Seq(-1))
  }

  test("O7 production decoder without its runtime fails loudly") {
    // the graceful path is FfmpegFrameDecoder.orSynthetic()
    // (LoadIfPresentSpec); the HARD path must still fail with an
    // actionable message rather than decode nothing
    val e = intercept[IllegalArgumentException] {
      new FfmpegFrameDecoder().decode("x.mp4", null, 500)
    }
    assert(e.getMessage.contains("JavaCV"))
  }
}
