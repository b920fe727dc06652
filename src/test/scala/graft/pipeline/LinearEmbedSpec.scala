package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** [[LinearEmbedder]] + [[Npy]]: REAL model inference, provable offline —
  * weights round-trip through the public .npy format and the forward
  * pass is golden-checked against hand-computed matrix math, then the
  * zero-stub pipeline (y4m real decode → real matmul embed → TFRecord)
  * runs end-to-end. The offline counterpart of the ONNX smoke that
  * cancels without runtime jars.
  */
class LinearEmbedSpec extends SparkSpec {

  test("NPY round-trips and rejects the unsupported loudly") {
    val data = Array.tabulate(12)(_ * 0.5f)
    val bytes = Npy.write(Seq(3, 4), data)
    val (shape, back) = Npy.read(bytes)
    assert(shape === Seq(3, 4) && back.toSeq === data.toSeq)
    // 1-D writes the spec's one-tuple form "(n,)"
    val (s1, b1) = Npy.read(Npy.write(Seq(5), Array.fill(5)(1f)))
    assert(s1 === Seq(5) && b1.forall(_ == 1f))
    // header is 64-byte aligned as the spec prescribes
    assert((10 + ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8))) % 64 === 0)

    intercept[IllegalArgumentException](Npy.read("junk".getBytes))
    intercept[IllegalArgumentException](Npy.read(bytes.dropRight(1)))
    val asF = Npy.write(Seq(3, 4), data)
    val hdr = new String(asF, "ISO-8859-1")
      .replace("'fortran_order': False", "'fortran_order': True ")
      .getBytes("ISO-8859-1")
    intercept[IllegalArgumentException](Npy.read(hdr))
  }

  test("golden forward pass: hand-computed dense -> ReLU -> dense") {
    val dir = Files.createTempDirectory("lin_golden").toString
    val F = LinearEmbedder.Features
    // hidden=1: the single unit reads ONLY feature 0 (R-channel mean)
    val w1 = new Array[Float](F); w1(0) = 1f
    Files.write(java.nio.file.Path.of(dir, "W1.npy"), Npy.write(Seq(F, 1), w1))
    Files.write(java.nio.file.Path.of(dir, "b1.npy"),
      Npy.write(Seq(1), Array(0f)))
    Files.write(java.nio.file.Path.of(dir, "W2.npy"),
      Npy.write(Seq(1, 2), Array(2f, -1f)))
    Files.write(java.nio.file.Path.of(dir, "b2.npy"),
      Npy.write(Seq(2), Array(0.5f, 0f)))
    val e = new LinearEmbedder(dir, dim = 2)
    e.setup()
    // constant mid-gray image: R mean = 0.5 → h = relu(0.5) = 0.5
    // → out = (0.5·2 + 0.5, 0.5·(−1) + 0) = (1.5, −0.5)
    val img = Array.fill(2 * 2 * 3)(0.5f)
    val out = e.embed(Seq(img)).head
    assert(out.toSeq === Seq(1.5f, -0.5f))
    // negative pre-activation clamps: an all-zero image → h = relu(0) = 0
    val dark = e.embed(Seq(Array.fill(12)(0f))).head
    assert(dark.toSeq === Seq(0.5f, 0f)) // just the biases
  }

  test("features are deterministic and shape-agnostic in dimension") {
    val a = LinearEmbedder.features(Array.tabulate(4 * 4 * 3)(_ * 0.01f))
    val b = LinearEmbedder.features(Array.tabulate(7 * 3 * 3)(_ * 0.01f))
    assert(a.length === LinearEmbedder.Features)
    assert(b.length === LinearEmbedder.Features)
    val a2 = LinearEmbedder.features(Array.tabulate(4 * 4 * 3)(_ * 0.01f))
    assert(a.toSeq === a2.toSeq)
    intercept[IllegalArgumentException](
      LinearEmbedder.features(Array(1f, 2f))) // not a multiple of 3
  }

  test("Embed.run with real weights: partition-invariant, singleton setup") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lin_weights").toString
    LinearEmbedder.writeWeights(dir, hidden = 8, dim = 4, seed = 7L)
    val dec = new SyntheticFrameDecoder()
    val rows = Seq.tabulate(40) { i =>
      dec.decode(s"corp/l$i/s/v$i.mp4", null, 500).map(f =>
        FrameRow(s"corp/l$i/s/v$i.mp4", s"l$i", "train", f.timestampMs,
          f.framePerSec, f.frameTotal, f.height, f.width, f.image)).toSeq
    }.flatten
    def logitsOf(parts: Int): Map[(String, Long), Seq[Float]] =
      Embed.run(spark.createDataset(rows).repartition(parts),
          new LinearEmbedder(dir, dim = 4), batchSize = 16)
        .collect().map(r =>
          (r.filename, r.timestamp_ms) -> r.logits.toSeq).toMap
    val one = logitsOf(1)
    val many = logitsOf(7)
    assert(one.nonEmpty && one === many) // batch slicing never changes math
    assert(one.values.forall(_.size === 4))
    // real math responds to real pixels: distinct images → distinct logits
    assert(one.values.toSet.size > 1)
  }

  test("ZERO-STUB pipeline: y4m real decode -> real matmul -> TFRecord") {
    import graft.Main
    import graft.tfrecord.TFRecords
    import spark.implicits._
    def gray(y: Int): Array[Byte] = {
      val f = new Array[Byte](4 * 4 + 2 * 4); java.util.Arrays.fill(f, y.toByte)
      java.util.Arrays.fill(f, 16, 24, 128.toByte)
      f
    }
    val clips = Seq(
      ("file:/zs/catA/c/v1.avi",
        Y4MFrameDecoder.write(4, 4, 2, 1, "420mpeg2", Seq(gray(60)))),
      ("file:/zs/catB/c/v2.avi",
        Y4MFrameDecoder.write(4, 4, 2, 1, "420mpeg2",
          Seq(gray(120), gray(200)))))
    val wDir = Files.createTempDirectory("lin_zs").toString
    LinearEmbedder.writeWeights(wDir, hidden = 8, dim = 6, seed = 11L)
    val out = Files.createTempDirectory("zs_out").toString
    Main.run(clips.toDF("filename", "content"), out,
      Main.Config(mode = Main.FullVideo, embeddingDim = 6),
      decoder = new Y4MFrameDecoder,
      embedder = Some(new LinearEmbedder(wDir, dim = 6)))
    val back = TFRecords.read(spark, out, Main.sampleSchema(Main.FullVideo))
      .selectExpr("filename", "label", "size(logits) AS nf",
        "aggregate(flatten(logits), 0D, (a, x) -> a + x) AS lsum")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).sortBy(_._1)
    assert(back.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      ("file:/zs/catA/c/v1.avi", "catA", 1),
      ("file:/zs/catB/c/v2.avi", "catB", 2)))
    // different real pixels through real weights → different embeddings
    assert(back(0)._4 !== back(1)._4)
    // and different WEIGHTS change the embeddings of the same pixels:
    // the logits demonstrably come from the loaded model, not the input
    val wDir2 = Files.createTempDirectory("lin_zs2").toString
    LinearEmbedder.writeWeights(wDir2, hidden = 8, dim = 6, seed = 12L)
    val out2 = Files.createTempDirectory("zs_out2").toString
    Main.run(clips.toDF("filename", "content"), out2,
      Main.Config(mode = Main.FullVideo, embeddingDim = 6),
      decoder = new Y4MFrameDecoder,
      embedder = Some(new LinearEmbedder(wDir2, dim = 6)))
    val sum2 = TFRecords.read(spark, out2, Main.sampleSchema(Main.FullVideo))
      .selectExpr("aggregate(flatten(logits), 0D, (a, x) -> a + x) AS s")
      .as[Double].collect().sorted
    assert(sum2.toSeq !== back.map(_._4).sorted.toSeq)
  }
}
