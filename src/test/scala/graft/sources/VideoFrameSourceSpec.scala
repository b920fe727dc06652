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

  test("filename filters push into the LISTING: pruned files never decode") {
    val dir = mkCorpus()
    // file-scoped read: only a.mp4 survives listing; b/c never reach a
    // decoder (filesDecoded counts every file whose frames are produced)
    VideoFrameSource.filesDecoded.set(0)
    val one = spark.read.format("videoframes").load(dir)
      .filter(col("filename").endsWith("/a.mp4"))
      .select("filename").distinct().as[String].collect()
    assert(one.map(_.split('/').last).toSeq === Seq("a.mp4"))
    assert(VideoFrameSource.filesDecoded.get() === 1,
      "filtered-out files must not be decoded")
    // the pushed filter is visible in the plan
    val plan = spark.read.format("videoframes").load(dir)
      .filter(col("filename").endsWith("/a.mp4"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("a.mp4"), plan)

    // prefix + contains compose (top-level conjunction)
    VideoFrameSource.filesDecoded.set(0)
    val two = spark.read.format("videoframes").load(dir)
      .filter(col("filename").startsWith(dir) &&
        (col("filename").contains(".mp4") || col("filename").contains(".mkv")))
      .select("filename").distinct().as[String].collect()
    assert(two.map(_.split('/').last).toSet === Set("a.mp4", "b.mkv"))
    assert(VideoFrameSource.filesDecoded.get() === 2)

    // an unsupported shape must NOT wrongly prune (residual handles it)
    val odd = spark.read.format("videoframes").load(dir)
      .filter(length(col("filename")) > 0)
      .select("filename").distinct().count()
    assert(odd === 3)
  }

  test("real y4m and MJPEG-AVI files REAL-decode through the source") {
    import graft.pipeline.{AviMjpegFrameDecoder, Y4MFrameDecoder}
    val dir = Files.createTempDirectory("vfsrc_real").toString
    // a real y4m (75%-red constant frame) under a LYING .mp4 extension,
    // a real MJPEG-AVI (solid mid-gray), and a fake-content video name
    val redFrame = {
      val f = new Array[Byte](2 * 2 + 2 * 1)
      java.util.Arrays.fill(f, 0, 4, 82.toByte)
      f(4) = 90.toByte; f(5) = 240.toByte
      f
    }
    Files.write(java.nio.file.Path.of(dir, "red.mp4"),
      Y4MFrameDecoder.write(2, 2, 2, 1, "420mpeg2", Seq(redFrame)))
    val gray = Array.fill(4 * 4 * 3)(0.5f)
    Files.write(java.nio.file.Path.of(dir, "gray.avi"),
      AviMjpegFrameDecoder.write(4, 4, 2, 1,
        Seq(AviMjpegFrameDecoder.encodeJpeg(gray, 4, 4))))
    Files.writeString(java.nio.file.Path.of(dir, "fake.mkv"), "not a video")
    val rows = spark.read.format("videoframes").load(dir)
      .select(col("filename"), col("height"), col("width"),
        element_at(col("image"), 1).as("r0"))
      .as[(String, Int, Int, Float)].collect()
      .map(t => (t._1.split('/').last, t._2, t._3, t._4)).sortBy(_._1)
    // fake content falls back to the synthetic decoder's 8x8 shape;
    // the real containers carry their REAL dimensions and pixels
    assert(rows.map(_._1).distinct.toSeq === Seq("fake.mkv", "gray.avi",
      "red.mp4"))
    val gray0 = rows.find(_._1 == "gray.avi").get
    assert(gray0._2 === 4 && gray0._3 === 4)
    assert(math.abs(gray0._4 - 0.5f) < 3f / 255f) // JPEG round-trip
    val red0 = rows.find(_._1 == "red.mp4").get
    assert(red0._2 === 2 && red0._3 === 2)
    assert(red0._4 === 1.0f) // BT.601 75%-red clamps R to 1 (the golden)
    assert(rows.find(_._1 == "fake.mkv").get._2 === 8)
    // and the pruned path still decodes ZERO pixels on real files
    val before = VideoFrameSource.pixelDecodes.get()
    spark.read.format("videoframes").load(dir)
      .select("filename", "height").collect()
    assert(VideoFrameSource.pixelDecodes.get() === before)
  }

  test("a real ISO-BMFF mp4 REAL-decodes through the source (round 14)") {
    import graft.pipeline.{AviMjpegFrameDecoder, Mp4FrameDecoder}
    val dir = Files.createTempDirectory("vfsrc_mp4").toString
    // a genuine MJPEG-in-mp4 (solid blue) under a LYING .mkv extension —
    // routing is by ftyp magic, exactly as the other containers
    val blue = Array.tabulate(4 * 4 * 3)(i =>
      if (i % 3 == 2) 0.9f else 0.05f)
    Files.write(java.nio.file.Path.of(dir, "blue.mkv"),
      Mp4FrameDecoder.write(4, 4, 2, 1,
        Seq(AviMjpegFrameDecoder.encodeJpeg(blue, 4, 4))))
    val rows = spark.read.format("videoframes").load(dir)
      .select(col("height"), col("width"),
        element_at(col("image"), 1).as("r0"),
        element_at(col("image"), 3).as("b0"))
      .as[(Int, Int, Float, Float)].collect()
    assert(rows.length === 1)
    assert(rows.head._1 === 4 && rows.head._2 === 4)
    assert(rows.head._3 < 0.15f) // dark red channel
    assert(rows.head._4 > 0.8f) // bright blue channel — real pixels
  }

  test("filenamePredicate compiles only exactly-evaluable shapes") {
    import org.apache.spark.sql.sources._
    def p(f: Filter) = VideoFrameSource.filenamePredicate(f)
    assert(p(EqualTo("filename", "x")).exists(_("x")))
    assert(p(Not(StringContains("filename", "a"))).exists(!_("abc")))
    // Not over an unsupported operand must not compile (an over-
    // inclusive approximation would flip into a wrong exclusion)
    assert(p(Not(EqualTo("timestamp_ms", 0L))).isEmpty)
    assert(p(And(StringStartsWith("filename", "/d"),
      EqualTo("timestamp_ms", 0L))).isEmpty)
    assert(p(Or(StringEndsWith("filename", ".mp4"),
      StringEndsWith("filename", ".mkv"))).exists(_("x.mkv")))
    assert(p(GreaterThan("timestamp_ms", 5L)).isEmpty)
  }
}
