package graft.pipeline

import graft.SparkSpec

/** PNG through the frame-decode seam: an image corpus rides the SAME
  * O7→O20 pipeline as video — content-magic routing (extensions lie),
  * one frame at t=0 with the true dimensions and real pixels, a
  * metadata path that parses the IHDR without ever inflating the
  * DEFLATE stream, and the full listing→decode→embed→TFRecord e2e on
  * real compressed image bytes.
  */
class PngFrameSpec extends SparkSpec {

  private def px(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 7) % 256) << 16 | 40 << 8 | 200)

  test("AutoFrameDecoder routes PNG by magic; one frame, true dims, real pixels") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    val bytes = PngCodec.encode(6, 4, px(6, 4))
    // lying extension, in-memory content
    val frames = auto.decode("photo.mp4", bytes, 500).toSeq
    assert(frames.size === 1)
    val f = frames.head
    assert((f.width, f.height, f.timestampMs, f.frameTotal) === ((6, 4, 0L, 1.0)))
    assert(f.image.length === 6 * 4 * 3)
    assert(f.image(0) === 0.0f) // pixel 0: r = 0
    assert(math.abs(f.image(1) - 40 / 255.0f) < 1e-6) // g
    assert(math.abs(f.image(2) - 200 / 255.0f) < 1e-6) // b
    assert(math.abs(f.image(3) - 7 / 255.0f) < 1e-6) // pixel 1: r = 7
  }

  test("metadata path parses IHDR only: a corrupt IDAT walks fine on meta, fails on pixels") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    val good = PngCodec.encode(6, 4, px(6, 4))
    // corrupt one IDAT payload byte, then repair that chunk's CRC so the
    // stream still parses structurally — only decompression can object
    val bad = good.clone()
    val idatAt = { // signature(8) + IHDR(12+13) = 33
      33
    }
    val len = ((bad(idatAt) & 0xff) << 24) | ((bad(idatAt + 1) & 0xff) << 16) |
      ((bad(idatAt + 2) & 0xff) << 8) | (bad(idatAt + 3) & 0xff)
    bad(idatAt + 8 + len / 2) = (bad(idatAt + 8 + len / 2) ^ 0x7f).toByte
    val crc = new java.util.zip.CRC32()
    crc.update(bad, idatAt + 4, 4 + len)
    val cv = crc.getValue.toInt
    bad(idatAt + 8 + len) = (cv >> 24).toByte
    bad(idatAt + 9 + len) = (cv >> 16).toByte
    bad(idatAt + 10 + len) = (cv >> 8).toByte
    bad(idatAt + 11 + len) = cv.toByte
    // meta: IHDR only — dimensions come back, DEFLATE never runs
    val meta = auto.decodeMeta("photo.avi", bad, 500).toSeq
    assert(meta.size === 1 && meta.head.width === 6 && meta.head.height === 4)
    assert(meta.head.image.isEmpty)
    // pixels: the corrupt stream must fail loudly, never fabricate
    intercept[Exception](auto.decode("photo.avi", bad, 500).toSeq)
  }

  test("O7→O20 e2e: an image corpus through the video pipeline on real PNG bytes") {
    import graft.Main
    import graft.tfrecord.TFRecords
    import spark.implicits._
    def listing(r0: Int) = Seq(
      ("file:/corpus/cats/imgs/img1.mp4", PngCodec.encode(4, 4,
        Array.tabulate(16)(i => (r0 + i) << 16))),
      ("file:/corpus/dogs/imgs/img2.mp4", PngCodec.encode(4, 4,
        Array.tabulate(16)(i => 90 << 16 | i << 8))))
      .toDF("filename", "content")
    val out = java.nio.file.Files.createTempDirectory("png_e2e").toString
    Main.run(listing(10), out, Main.Config(mode = Main.SingleFrame,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back = TFRecords.read(spark, out, Main.sampleSchema(Main.SingleFrame))
      .selectExpr("filename", "label",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(back.map(_._1).toSeq ===
      Seq("file:/corpus/cats/imgs/img1.mp4", "file:/corpus/dogs/imgs/img2.mp4"))
    assert(back.map(_._2).toSeq === Seq("cats", "dogs")) // O5 labels
    // embeddings derive from the DECODED pixels: shift one image's red
    // channel — its logits move, the other's don't
    val out2 = java.nio.file.Files.createTempDirectory("png_e2e2").toString
    Main.run(listing(11), out2, Main.Config(mode = Main.SingleFrame,
      embeddingDim = 8), decoder = new AutoFrameDecoder())
    val back2 = TFRecords.read(spark, out2, Main.sampleSchema(Main.SingleFrame))
      .selectExpr("filename",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(back2(0)._2 !== back(0)._3)
    assert(back2(1)._2 === back(1)._3)
  }
}
