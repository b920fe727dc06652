package graft.pipeline

import graft.SparkSpec

/** [[Y4MFrameDecoder]]: REAL pixel decoding, provable offline — fixture
  * y4m streams are generated in-test and the produced RGB floats are
  * checked against hand-computed BT.601 values (not against the decoder's
  * own arithmetic). This is the non-synthetic decode evidence the
  * FFmpeg smoke (which cancels offline) cannot provide.
  */
class Y4MDecodeSpec extends SparkSpec {

  private def y4m420(w: Int, h: Int, frames: Seq[(Int, Int, Int)],
      cs: String = "420mpeg2", fps: (Long, Long) = (2L, 1L)): Array[Byte] = {
    // each frame filled with one constant (Y, U, V)
    val planes = frames.map { case (y, u, v) =>
      val f = new Array[Byte](w * h + 2 * (w / 2) * (h / 2))
      java.util.Arrays.fill(f, 0, w * h, y.toByte)
      java.util.Arrays.fill(f, w * h, w * h + (w / 2) * (h / 2), u.toByte)
      java.util.Arrays.fill(f, w * h + (w / 2) * (h / 2), f.length, v.toByte)
      f
    }
    Y4MFrameDecoder.write(w, h, fps._1, fps._2, cs, planes)
  }

  test("limited-range BT.601 goldens: black, white, and the classic red") {
    val bytes = y4m420(2, 2, Seq((16, 128, 128), (235, 128, 128),
      (82, 90, 240)))
    val frames = new Y4MFrameDecoder().decode("t.y4m", bytes, 500).toSeq
    assert(frames.size === 3)
    val Seq(black, white, red) = frames
    // Y=16 U=V=128 → exact black
    assert(black.image.forall(_ == 0f))
    // Y=235 → 1.164383·219 = 254.99988 → 0.99999952
    white.image.foreach(v => assert(math.abs(v - 1.0f) < 1e-4))
    // Y=82 U=90 V=240 (the standard 75% red test triplet):
    // R = 1.164383·66 + 1.596027·112          = 255.60 → clamps to 1
    // G = 1.164383·66 − 0.391762·(−38) − 0.812968·112 = 0.6844 → 0.002684
    // B = 1.164383·66 + 2.017232·(−38)        = 0.185  → 0.000727
    assert(red.image.grouped(3).forall { case Array(r, g, b) =>
      r == 1.0f && math.abs(g - 0.002684f) < 1e-4 && math.abs(b - 0.000727f) < 1e-4
    })
    assert(red.height === 2 && red.width === 2 && red.image.length === 12)
  }

  test("full-range C420jpeg: mid-gray stays mid-gray") {
    val bytes = y4m420(2, 2, Seq((128, 128, 128)), cs = "420jpeg")
    val f = new Y4MFrameDecoder().decode("t.y4m", bytes, 500).toSeq.head
    // full range: Y=128 → 128/255 exactly, no 16..235 rescale
    f.image.foreach(v => assert(math.abs(v - 128f / 255f) < 1e-6))
  }

  test("Cmono and C444 colorspaces decode") {
    val mono = {
      val f = new Array[Byte](4); java.util.Arrays.fill(f, 200.toByte)
      Y4MFrameDecoder.write(2, 2, 25, 1, "mono", Seq(f))
    }
    val fm = new Y4MFrameDecoder().decode("m.y4m", mono, 500).toSeq.head
    // 1.164383·184 = 214.25 → 0.84017
    fm.image.foreach(v => assert(math.abs(v - 0.84017f) < 1e-4))

    // C444: per-pixel chroma — pixel 0 red-ish V, pixel 3 blue-ish U
    val f444 = new Array[Byte](12)
    java.util.Arrays.fill(f444, 0, 4, 128.toByte) // Y plane
    java.util.Arrays.fill(f444, 4, 8, 128.toByte) // U plane
    java.util.Arrays.fill(f444, 8, 12, 128.toByte) // V plane
    f444(8) = 240.toByte // V of pixel 0 only
    val c444 = Y4MFrameDecoder.write(2, 2, 25, 1, "444", Seq(f444))
    val fc = new Y4MFrameDecoder().decode("c.y4m", c444, 500).toSeq.head
    val px = fc.image.grouped(3).toSeq
    assert(px(0)(0) > px(1)(0) + 0.3f) // pixel 0 much redder than pixel 1
    assert(math.abs(px(1)(0) - px(1)(2)) < 1e-4) // pixel 1 neutral
  }

  test("tick sampling matches the ffmpeg-path contract") {
    // 2 native frames at F2:1 (one per 500 ms), sampled every 250 ms:
    // ticks 0,250,500,750 cover frames 0,0,1,1; tick 1000 is past the end
    val bytes = y4m420(2, 2, Seq((100, 128, 128), (200, 128, 128)),
      fps = (2L, 1L))
    val frames = new Y4MFrameDecoder().decode("t.y4m", bytes, 250).toSeq
    assert(frames.map(_.timestampMs) === Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.frameTotal == 4.0))
    assert(frames.forall(_.framePerSec == 4.0)) // 1000/250
    // frames 0-1 carry native frame 0 (Y=100), 2-3 native frame 1 (Y=200)
    assert(frames(0).image(0) === frames(1).image(0))
    assert(frames(2).image(0) === frames(3).image(0))
    assert(frames(2).image(0) > frames(0).image(0))
  }

  test("decodeMeta: same cadence, no pixels") {
    val bytes = y4m420(4, 4, Seq((50, 128, 128), (60, 128, 128)))
    val meta = new Y4MFrameDecoder().decodeMeta("t.y4m", bytes, 500).toSeq
    val full = new Y4MFrameDecoder().decode("t.y4m", bytes, 500).toSeq
    assert(meta.map(f => (f.timestampMs, f.frameTotal, f.height, f.width)) ===
      full.map(f => (f.timestampMs, f.frameTotal, f.height, f.width)))
    assert(meta.forall(_.image.isEmpty))
    assert(full.forall(_.image.nonEmpty))
  }

  test("malformed streams fail loudly, unsupported colorspace named") {
    val dec = new Y4MFrameDecoder()
    intercept[IllegalArgumentException](
      dec.decode("x", "not a stream".getBytes, 500))
    val truncated = y4m420(2, 2, Seq((16, 128, 128))).dropRight(1)
    intercept[IllegalArgumentException](dec.decode("x", truncated, 500).toSeq)
    val bad411 = Y4MFrameDecoder.write(4, 4, 25, 1, "411",
      Seq(new Array[Byte](24)))
    val e = intercept[IllegalArgumentException](dec.decode("x", bad411, 500))
    assert(e.getMessage.contains("C411"))
  }

  test("AutoFrameDecoder routes by content magic, not extension") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    val y4mBytes = y4m420(2, 2, Seq((82, 90, 240)))
    // y4m content under a LYING extension still real-decodes
    val real = auto.decode("clip.avi", y4mBytes, 500).toSeq
    assert(real.size === 1 && real.head.image(0) === 1.0f)
    // non-y4m content falls back (synthetic: 8x8, hash-derived count)
    val fake = auto.decode("clip.avi", Array[Byte](1, 2, 3), 500).toSeq
    assert(fake.head.width === 8)
  }

  test("file-path probe: full 16-byte head, tiny files route clean, failures observable") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    // a real on-disk y4m (magic spans 9 bytes — a short single read()
    // would misroute it): the loop-read probe must route it for real
    val dir = java.nio.file.Files.createTempDirectory("probe")
    val y4mPath = dir.resolve("clip.mp4") // lying extension, as ever
    java.nio.file.Files.write(y4mPath, y4m420(2, 2, Seq((82, 90, 240))))
    val real = auto.decode(y4mPath.toString, null, 500).toSeq
    assert(real.size === 1 && real.head.image(0) === 1.0f)
    // a file SHORTER than the probe is not a failure — it reads to EOF
    // and routes to the fallback without incrementing the counter
    val tiny = dir.resolve("tiny.avi")
    java.nio.file.Files.write(tiny, Array[Byte](1, 2, 3))
    val f0 = AutoFrameDecoder.probeFailures.sum()
    assert(auto.decode(tiny.toString, null, 500).toSeq.head.width === 8)
    assert(AutoFrameDecoder.probeFailures.sum() === f0)
    // an UNREADABLE path still falls through to the fallback (it owns
    // the error/synthetic decision) but is counted — never silent
    val missing = dir.resolve("nope.avi").toString
    assert(auto.decode(missing, null, 500).toSeq.head.width === 8)
    assert(AutoFrameDecoder.probeFailures.sum() === f0 + 1)
  }

  test("O7→O20 end-to-end on REAL decoded bytes (no synthetic pixels)") {
    import graft.Main
    import graft.tfrecord.TFRecords
    // three one-frame "videos" whose single distinguishing feature is
    // their actual pixel content; labels come from the path layout
    def listing(redY: Int): org.apache.spark.sql.DataFrame = {
      val rows = Seq(
        ("file:/corpus/catA/clips/v1.avi", y4m420(4, 4, Seq((redY, 90, 240)))),
        ("file:/corpus/catA/clips/v2.avi",
          y4m420(4, 4, Seq((16, 128, 128), (235, 128, 128)))),
        ("file:/corpus/catB/clips/v3.avi", y4m420(4, 4, Seq((128, 128, 128)))))
      import spark.implicits._
      rows.toDF("filename", "content")
    }
    val out = java.nio.file.Files.createTempDirectory("y4m_e2e").toString
    Main.run(listing(82), out, Main.Config(mode = Main.FullVideo,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back = TFRecords.read(spark, out,
      Main.sampleSchema(Main.FullVideo))
      .selectExpr("filename", "label", "timestamp_ms",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getSeq[Long](2), r.getDouble(3))).sortBy(_._1)
    assert(back.map(_._1).toSeq === Seq("file:/corpus/catA/clips/v1.avi",
      "file:/corpus/catA/clips/v2.avi", "file:/corpus/catB/clips/v3.avi"))
    // O5 labels from the real paths; O10 timestamps from the real streams
    assert(back.map(_._2).toSeq === Seq("catA", "catA", "catB"))
    assert(back(0)._3 === Seq(0L)) // 1 native frame at 2fps, 500ms ticks
    assert(back(1)._3 === Seq(0L, 500L))
    // the embeddings derive from the DECODED PIXELS: rerun with one
    // fixture's luma changed — that file's logits move, the others' don't
    val out2 = java.nio.file.Files.createTempDirectory("y4m_e2e2").toString
    Main.run(listing(90), out2, Main.Config(mode = Main.FullVideo,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back2 = TFRecords.read(spark, out2,
      Main.sampleSchema(Main.FullVideo))
      .selectExpr("filename",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(back2(0)._2 !== back(0)._4) // v1: pixels changed → logits changed
    assert(back2(1)._2 === back(1)._4) // v2, v3: byte-identical pixels
    assert(back2(2)._2 === back(2)._4)
  }
}
