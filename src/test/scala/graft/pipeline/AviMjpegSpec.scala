package graft.pipeline

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** [[AviMjpegFrameDecoder]]: REAL decode of a COMPRESSED codec, provable
  * offline — MJPEG-in-AVI fixtures are generated in-test (JVM JPEG
  * encoder + the hand-rolled RIFF writer), the produced RGB floats are
  * checked against the JVM JPEG decoder run directly on the raw payload
  * (container parsing proven exact) and against planted solid colors
  * (compression round-trip proven tight). This is the compressed-codec
  * evidence the FFmpeg smoke (which cancels offline) cannot provide; the
  * y4m twin covers the raw-planar rung.
  */
class AviMjpegSpec extends SparkSpec {

  private def solidRgb(r: Float, g: Float, b: Float,
      w: Int = 4, h: Int = 4): Array[Float] =
    Array.tabulate(w * h * 3)(i => (i % 3: @unchecked) match {
      case 0 => r
      case 1 => g
      case 2 => b
    })

  private def aviOf(frames: Seq[Array[Float]], w: Int = 4, h: Int = 4,
      fps: (Long, Long) = (2L, 1L)): Array[Byte] =
    AviMjpegFrameDecoder.write(w, h, fps._1, fps._2,
      frames.map(AviMjpegFrameDecoder.encodeJpeg(_, w, h)))

  test("container parse is exact: decoded RGB ≡ ImageIO on the raw JPEG") {
    // a non-trivial gradient, so per-pixel equality means something
    val grad = Array.tabulate(4 * 4 * 3)(i => (i * 5 % 256) / 255f)
    val jpeg = AviMjpegFrameDecoder.encodeJpeg(grad, 4, 4)
    val avi = AviMjpegFrameDecoder.write(4, 4, 2, 1, Seq(jpeg))
    val got = new AviMjpegFrameDecoder().decode("t.avi", avi, 500).toSeq
    assert(got.size === 1)
    // reference: the JVM's own decoder on the SAME bytes, no container —
    // byte-identical payload + same decoder ⇒ the floats must be equal
    // exactly, or the RIFF walk corrupted an offset
    val img = ImageIO.read(new ByteArrayInputStream(jpeg))
    val want = for {
      y <- 0 until 4; x <- 0 until 4; shift <- Seq(16, 8, 0)
    } yield ((img.getRGB(x, y) >> shift) & 0xff) / 255f
    assert(got.head.image.toSeq === want)
    assert(got.head.height === 4 && got.head.width === 4)
  }

  test("solid colors survive REAL JPEG compression within 3/255") {
    val avi = aviOf(Seq(solidRgb(0f, 0f, 0f), solidRgb(1f, 1f, 1f),
      solidRgb(0.5f, 0.5f, 0.5f)))
    val fs = new AviMjpegFrameDecoder().decode("t.avi", avi, 500).toSeq
    assert(fs.size === 3)
    // solid blocks are DC-only in JPEG: near-exact after the round trip
    fs(0).image.foreach(v => assert(v < 3f / 255f, s"black leaked to $v"))
    fs(1).image.foreach(v => assert(v > 1f - 3f / 255f, s"white fell to $v"))
    fs(2).image.foreach(v =>
      assert(math.abs(v - 0.5f) < 3f / 255f, s"mid-gray drifted to $v"))
  }

  test("tick sampling matches the ffmpeg-path contract") {
    // 2 native frames at 2 fps (one per 500 ms), sampled every 250 ms:
    // ticks 0,250,500,750 cover frames 0,0,1,1; tick 1000 is past the end
    val avi = aviOf(Seq(solidRgb(0.2f, 0.2f, 0.2f),
      solidRgb(0.8f, 0.8f, 0.8f)))
    val frames = new AviMjpegFrameDecoder().decode("t.avi", avi, 250).toSeq
    assert(frames.map(_.timestampMs) === Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.frameTotal == 4.0))
    assert(frames.forall(_.framePerSec == 4.0)) // 1000/250
    assert(frames(0).image(0) === frames(1).image(0)) // same native frame
    assert(frames(2).image(0) === frames(3).image(0))
    assert(frames(2).image(0) > frames(0).image(0) + 0.3f)
  }

  test("decodeMeta never touches the JPEG decoder") {
    val dec = new AviMjpegFrameDecoder()
    val good = aviOf(Seq(solidRgb(0.5f, 0.5f, 0.5f),
      solidRgb(0.2f, 0.2f, 0.2f)))
    val meta = dec.decodeMeta("t.avi", good, 500).toSeq
    val full = dec.decode("t.avi", good, 500).toSeq
    assert(meta.map(f => (f.timestampMs, f.frameTotal, f.height, f.width)) ===
      full.map(f => (f.timestampMs, f.frameTotal, f.height, f.width)))
    assert(meta.forall(_.image.isEmpty))
    assert(full.forall(_.image.nonEmpty))
    // the proof: an AVI whose payloads are NOT JPEGs still walks fine on
    // the metadata path (container structure is intact), while the pixel
    // path fails loudly — pixels are demonstrably never decoded on meta
    val corrupt = AviMjpegFrameDecoder.write(4, 4, 2, 1,
      Seq(Array.tabulate[Byte](64)(_.toByte)))
    val metaOnly = dec.decodeMeta("c.avi", corrupt, 500).toSeq
    assert(metaOnly.size === 1 && metaOnly.head.width === 4)
    val e = intercept[IllegalArgumentException](
      dec.decode("c.avi", corrupt, 500).toSeq)
    assert(e.getMessage.contains("not a JPEG"))
  }

  test("malformed containers fail loudly") {
    val dec = new AviMjpegFrameDecoder()
    intercept[IllegalArgumentException](
      dec.decode("x", "garbage, not RIFF".getBytes, 500))
    // a truncated stream: the last chunk overruns its parent
    val truncated = aviOf(Seq(solidRgb(0.5f, 0.5f, 0.5f))).dropRight(3)
    intercept[IllegalArgumentException](dec.decode("x", truncated, 500).toSeq)
  }

  test("AutoFrameDecoder routes AVI by content magic, not extension") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    val avi = aviOf(Seq(solidRgb(1f, 0f, 0f)))
    // AVI content under a LYING .y4m extension still real-decodes
    val real = auto.decode("clip.y4m", avi, 500).toSeq
    assert(real.size === 1)
    assert(real.head.image(0) > 0.9f && real.head.image(1) < 0.25f)
    // and y4m routing is untouched: non-AVI, non-y4m falls back
    val fake = auto.decode("clip.avi", Array[Byte](1, 2, 3), 500).toSeq
    assert(fake.head.width === 8) // synthetic's fixed shape
  }

  test("O7→O20 end-to-end on COMPRESSED decoded bytes (MJPEG AVI)") {
    import graft.Main
    import graft.tfrecord.TFRecords
    // three "videos" whose single distinguishing feature is their actual
    // compressed pixel content; labels come from the path layout. The
    // extensions LIE (.mp4) — routing is by RIFF magic
    def listing(g: Float): org.apache.spark.sql.DataFrame = {
      val rows = Seq(
        ("file:/corpus/catA/clips/v1.mp4",
          aviOf(Seq(solidRgb(g, 0.1f, 0.9f)))),
        ("file:/corpus/catA/clips/v2.mp4",
          aviOf(Seq(solidRgb(0f, 0f, 0f), solidRgb(1f, 1f, 1f)))),
        ("file:/corpus/catB/clips/v3.mp4",
          aviOf(Seq(solidRgb(0.5f, 0.5f, 0.5f)))))
      import spark.implicits._
      rows.toDF("filename", "content")
    }
    val out = java.nio.file.Files.createTempDirectory("avi_e2e").toString
    Main.run(listing(0.3f), out, Main.Config(mode = Main.FullVideo,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back = TFRecords.read(spark, out,
      Main.sampleSchema(Main.FullVideo))
      .selectExpr("filename", "label", "timestamp_ms",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getSeq[Long](2), r.getDouble(3))).sortBy(_._1)
    assert(back.map(_._1).toSeq === Seq("file:/corpus/catA/clips/v1.mp4",
      "file:/corpus/catA/clips/v2.mp4", "file:/corpus/catB/clips/v3.mp4"))
    assert(back.map(_._2).toSeq === Seq("catA", "catA", "catB"))
    assert(back(0)._3 === Seq(0L)) // 1 native frame at 2 fps, 500 ms ticks
    assert(back(1)._3 === Seq(0L, 500L))
    // the embeddings derive from the DECODED COMPRESSED PIXELS: rerun
    // with one fixture's color shifted past a JPEG quantization step —
    // that file's logits move, the byte-identical others' don't
    val out2 = java.nio.file.Files.createTempDirectory("avi_e2e2").toString
    Main.run(listing(0.4f), out2, Main.Config(mode = Main.FullVideo,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back2 = TFRecords.read(spark, out2,
      Main.sampleSchema(Main.FullVideo))
      .selectExpr("filename",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(back2(0)._2 !== back(0)._4) // v1: pixels changed → logits moved
    assert(back2(1)._2 === back(1)._4) // v2, v3: byte-identical content
    assert(back2(2)._2 === back(2)._4)
  }
}
