package graft.pipeline

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.SparkSpec

/** [[MkvFrameDecoder]]: REAL decode of the reference filter's FIRST
  * extension (`.mkv`, preprocess.py:320-323) — previously the only
  * admitted container with zero pure-JVM path. Fixtures are generated
  * in-test by the hand-rolled EBML writer; container parsing is
  * checked exact against ImageIO on the raw payloads; all four lacing
  * modes are proven equal to the unlaced layout; a real-codec CodecID
  * (`V_MPEG4/ISO/AVC`) serves codec-free METADATA and routes PIXELS to
  * the env-gated fallback seam; WebM (same container, DocType `webm`)
  * falls out free; hostile forms fail typed.
  */
class MkvFrameSpec extends SparkSpec {

  private def solidRgb(r: Float, g: Float, b: Float,
      w: Int = 4, h: Int = 4): Array[Float] =
    Array.tabulate(w * h * 3)(i => (i % 3: @unchecked) match {
      case 0 => r
      case 1 => g
      case 2 => b
    })

  private def jpegs(levels: Seq[Float], w: Int = 4, h: Int = 4) =
    levels.map(v => AviMjpegFrameDecoder.encodeJpeg(solidRgb(v, v, v,
      w, h), w, h))

  private def findPat(hay: Array[Byte], pat: Array[Byte],
      from: Int = 0): Int =
    (from until hay.length - pat.length).find(i =>
      pat.indices.forall(j => hay(i + j) == pat(j))).getOrElse(-1)

  test("container parse is exact: decoded RGB ≡ ImageIO on the raw JPEG") {
    val grad = Array.tabulate(4 * 4 * 3)(i => (i * 5 % 256) / 255f)
    val jpeg = AviMjpegFrameDecoder.encodeJpeg(grad, 4, 4)
    val mkv = MkvFrameDecoder.write(4, 4, 2, 1, Seq(jpeg))
    val got = new MkvFrameDecoder().decode("t.mkv", mkv, 500).toSeq
    assert(got.size === 1)
    val img = ImageIO.read(new ByteArrayInputStream(jpeg))
    val want = for {
      y <- 0 until 4; x <- 0 until 4; shift <- Seq(16, 8, 0)
    } yield ((img.getRGB(x, y) >> shift) & 0xff) / 255f
    assert(got.head.image.toSeq === want)
    assert(got.head.height === 4 && got.head.width === 4)
  }

  test("all four lacing modes decode identically to the unlaced layout") {
    val levels = Seq(0.1f, 0.3f, 0.5f, 0.7f, 0.9f, 0.25f)
    val frames = jpegs(levels)
    val dec = new MkvFrameDecoder()
    val want = dec.decode("plain.mkv",
      MkvFrameDecoder.write(4, 4, 2, 1, frames, framesPerCluster = 1),
      500).toSeq
    assert(want.size === 6)
    for (lace <- 1 to 3) {
      // fixed-size lacing (2) needs equal frame lengths: re-encode one
      // frame and repeat it so sizes match, comparing only timestamps
      val fs = if (lace == 2) Seq.fill(6)(frames.head) else frames
      val laced = MkvFrameDecoder.write(4, 4, 2, 1, fs,
        framesPerCluster = 3, lacing = lace)
      val got = dec.decode(s"lace$lace.mkv", laced, 500).toSeq
      assert(got.map(_.timestampMs) === want.map(_.timestampMs),
        s"lacing mode $lace timestamps")
      if (lace != 2)
        got.zip(want).foreach { case (g, w) =>
          assert(g.image.toSeq === w.image.toSeq, s"lacing mode $lace")
        }
      else assert(got.forall(_.image.toSeq === want.head.image.toSeq))
    }
  }

  test("tick sampling matches the decoder-family contract; BlockGroup/" +
      "Block decodes identically to SimpleBlock") {
    val mkv = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.8f)))
    val frames = new MkvFrameDecoder().decode("t.mkv", mkv, 250).toSeq
    assert(frames.map(_.timestampMs) === Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.frameTotal == 4.0))
    assert(frames.forall(_.framePerSec == 4.0))
    assert(frames(2).image(0) > frames(0).image(0) + 0.3f)

    // the other block form the spec admits: BlockGroup→Block
    val grouped = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.8f)), blockGroups = true)
    val got = new MkvFrameDecoder().decode("g.mkv", grouped, 250).toSeq
    assert(got.map(_.timestampMs) === frames.map(_.timestampMs))
    got.zip(frames).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }
  }

  test("decodeMeta is codec-free: a V_MPEG4/ISO/AVC track yields " +
      "timestamps/fps/frame_total; pixels route to the fallback seam") {
    val payload = Array.tabulate[Byte](48)(_.toByte)
    val avc = MkvFrameDecoder.write(6, 4, 2, 1,
      Seq(payload, payload, payload), codecId = "V_MPEG4/ISO/AVC")
    val dec = new MkvFrameDecoder(fallback = new SyntheticFrameDecoder())
    val meta = dec.decodeMeta("clip.mkv", avc, 500).toSeq
    assert(meta.map(_.timestampMs) === Seq(0L, 500L, 1000L))
    assert(meta.forall(f => f.width == 6 && f.height == 4 &&
      f.frameTotal == 3.0))
    assert(meta.forall(_.image.isEmpty))
    // pixels: MUST not touch the payload bytes — the synthetic fallback
    // (stand-in for JavaCV) answers instead
    val px = dec.decode("clip.mkv", avc, 500).toSeq
    assert(px.nonEmpty && px.head.width === 8) // synthetic's 8x8
  }

  test("WebM is the same container: DocType webm parses identically") {
    val webm = MkvFrameDecoder.write(4, 4, 2, 1, jpegs(Seq(0.4f, 0.6f)),
      codecId = "V_VP9", docType = "webm")
    val dec = new MkvFrameDecoder(fallback = new SyntheticFrameDecoder())
    val meta = dec.decodeMeta("clip.webm", webm, 500).toSeq
    assert(meta.map(_.timestampMs) === Seq(0L, 500L))
    assert(meta.forall(f => f.width == 4 && f.frameTotal == 2.0))
  }

  test("unknown-size Segment (the live-streaming layout) parses; an " +
      "unknown-size Cluster with a following sibling fails typed, " +
      "never silently drops frames") {
    val good = MkvFrameDecoder.write(4, 4, 2, 1, jpegs(Seq(0.3f, 0.7f)))
    val segIdAt = findPat(good, Array(0x18, 0x53, 0x80.toByte, 0x67))
    assert(segIdAt > 0)
    // replace the Segment's size VINT with the 1-byte all-ones form
    val szFirst = good(segIdAt + 4) & 0xff
    val szLen = java.lang.Integer.numberOfLeadingZeros(szFirst) - 23
    val streaming = good.take(segIdAt + 4) ++ Array(0xff.toByte) ++
      good.drop(segIdAt + 4 + szLen)
    val dec = new MkvFrameDecoder()
    val got = dec.decode("stream.mkv", streaming, 500).toSeq
    val want = dec.decode("plain.mkv", good, 500).toSeq
    assert(got.map(_.timestampMs) === want.map(_.timestampMs))
    got.zip(want).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }

    // r17 (r16 verdict task 3): an unknown-size Cluster FOLLOWED BY A
    // SIBLING — the live-capture layout (RFC 8794 §6.3 bounds it at the
    // first non-child element). First the hand-mutated form: two
    // clusters, FIRST rewritten to unknown size inside an unknown-size
    // Segment (shrinking a child without re-deriving the parent's size
    // would otherwise fail on the parent). Must decode identically to
    // the untouched layout — the second cluster's frames were exactly
    // what the pre-r17 typed failure refused to silently lose.
    val two = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.4f, 0.6f, 0.8f)), framesPerCluster = 2)
    val seg2At = findPat(two, Array(0x18, 0x53, 0x80.toByte, 0x67))
    val seg2SzLen = java.lang.Integer.numberOfLeadingZeros(
      two(seg2At + 4) & 0xff) - 23
    val twoStream = two.take(seg2At + 4) ++ Array(0xff.toByte) ++
      two.drop(seg2At + 4 + seg2SzLen)
    val c1 = findPat(twoStream, Array(0x1f, 0x43, 0xb6.toByte, 0x75))
    assert(c1 > 0)
    val c1szLen = java.lang.Integer.numberOfLeadingZeros(
      twoStream(c1 + 4) & 0xff) - 23
    val mixed = twoStream.take(c1 + 4) ++ Array(0xff.toByte) ++
      twoStream.drop(c1 + 4 + c1szLen)
    val wantTwo = dec.decode("plain2.mkv", two, 500).toSeq
    assert(wantTwo.size === 4)
    val gotMixed = dec.decode("mixed.mkv", mixed, 500).toSeq
    assert(gotMixed.map(_.timestampMs) === wantTwo.map(_.timestampMs))
    gotMixed.zip(wantTwo).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }
  }

  test("live-capture layout: EVERY Cluster unknown-size (writer flag), " +
      "each bounded by its next sibling and the last by the Segment — " +
      "decode ≡ the known-size layout, both block forms") {
    val dec = new MkvFrameDecoder()
    for (groups <- Seq(false, true)) {
      val frames = jpegs(Seq(0.15f, 0.35f, 0.55f, 0.75f, 0.95f))
      val known = MkvFrameDecoder.write(4, 4, 2, 1, frames,
        framesPerCluster = 2, blockGroups = groups)
      val live = MkvFrameDecoder.write(4, 4, 2, 1, frames,
        framesPerCluster = 2, blockGroups = groups,
        unknownSizeClusters = true)
      assert(!java.util.Arrays.equals(known, live))
      val want = dec.decode("known.mkv", known, 500).toSeq
      val got = dec.decode("live.mkv", live, 500).toSeq
      assert(want.size === 5)
      assert(got.map(_.timestampMs) === want.map(_.timestampMs))
      got.zip(want).foreach { case (g, w) =>
        assert(g.image.toSeq === w.image.toSeq)
      }
      // metadata path sees the same frame table
      val meta = dec.decodeMeta("live.mkv", live, 500).toSeq
      assert(meta.map(_.timestampMs) === want.map(_.timestampMs))
      assert(meta.forall(_.frameTotal == 5.0))
    }
    // the bound still refuses what it cannot resolve: an id that is
    // neither a Cluster child nor a Segment-level sibling after an
    // unknown-size Cluster's last block fails typed (never guesses).
    // Segment made unknown-size so the appended junk lands INSIDE it,
    // in the last cluster's bound scan.
    val live = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.8f)), framesPerCluster = 2,
      unknownSizeClusters = true)
    val segAt = findPat(live, Array(0x18, 0x53, 0x80.toByte, 0x67))
    val segSzLen = java.lang.Integer.numberOfLeadingZeros(
      live(segAt + 4) & 0xff) - 23
    val garbage = live.take(segAt + 4) ++ Array(0xff.toByte) ++
      live.drop(segAt + 4 + segSzLen) ++
      Array[Byte](0x42, 0x42, 0x42, 0x42)
    val e = intercept[IllegalArgumentException](
      dec.decode("junk.mkv", garbage, 500).toSeq)
    assert(e.getMessage.contains("cannot bound"), e.getMessage)
  }

  test("hostile forms fail typed: garbage, rewinding cluster timestamps, " +
      "lace sizes overrunning the block, lying element sizes") {
    val dec = new MkvFrameDecoder(fallback = new SyntheticFrameDecoder())
    intercept[IllegalArgumentException](
      dec.decode("x.mkv", "not matroska at all".getBytes, 500).toSeq)

    // rewind: 2 clusters; zero out the SECOND cluster's timestamp
    val two = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.4f, 0.6f, 0.8f)), framesPerCluster = 2)
    val c1 = findPat(two, Array(0x1f, 0x43, 0xb6.toByte, 0x75))
    val c2 = findPat(two, Array(0x1f, 0x43, 0xb6.toByte, 0x75), c1 + 4)
    assert(c2 > c1)
    // cluster payload: id(4) + size VINT, then E7 (ClusterTs) size+payload
    val szLen = java.lang.Integer.numberOfLeadingZeros(
      two(c2 + 4) & 0xff) - 23
    val tsAt = c2 + 4 + szLen
    assert((two(tsAt) & 0xff) === 0xe7)
    val tsPayloadLen = (two(tsAt + 1) & 0xff) - 0x80
    val rewound = two.clone()
    for (j <- 0 until tsPayloadLen) rewound(tsAt + 2 + j) = 0
    val eR = intercept[IllegalArgumentException](
      dec.decode("rewind.mkv", rewound, 500).toSeq)
    assert(eR.getMessage.contains("rewind"))

    // Xiph lace whose explicit sizes overrun the block end: locate the
    // block body via its distinctive head [trackVINT=81][relTs=0,0]
    // [flags=keyframe|Xiph=0x82][count=2], then inflate a size byte
    val laced = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.3f, 0.5f, 0.7f)), framesPerCluster = 3, lacing = 1)
    val headAt = findPat(laced,
      Array[Byte](0x81.toByte, 0x00, 0x00, 0x82.toByte, 0x02))
    assert(headAt > 0)
    val overrun = laced.clone()
    // inflate the COUNT byte to 255 → 256 claimed frames: the 255
    // explicit Xiph size chains either run past the block end or sum
    // far beyond its remainder — both the typed table-guard failure.
    // (Mutating size bytes directly is unreliable: a 4x4 JPEG exceeds
    // 255 bytes, so those bytes are already 0xff continuations.)
    overrun(headAt + 4) = 0xff.toByte
    val eL = intercept[IllegalArgumentException](
      dec.decode("lace.mkv", overrun, 500).toSeq)
    assert(eL.getMessage.contains("lace") ||
      eL.getMessage.contains("overrun"))

    // lying element size: Tracks claiming bytes past its parent
    val good = MkvFrameDecoder.write(4, 4, 2, 1, jpegs(Seq(0.5f)))
    val trAt = findPat(good, Array(0x16, 0x54, 0xae.toByte, 0x6b))
    val lying = good.clone()
    lying(trAt + 4) = 0xfe.toByte // size 126 ≫ actual payload
    val eS = intercept[IllegalArgumentException](
      dec.decode("lying.mkv", lying, 500).toSeq)
    assert(eS.getMessage.contains("past its parent") ||
      eS.getMessage.contains("runs past"))
  }

  test("a SINGLE-frame laced block (lace count byte 0) is spec-legal: " +
      "no explicit sizes, the frame is the whole remainder — all three " +
      "laced modes decode it identically to the unlaced form") {
    val frames = jpegs(Seq(0.3f, 0.7f))
    val dec = new MkvFrameDecoder()
    val want = dec.decode("plain.mkv",
      MkvFrameDecoder.write(4, 4, 2, 1, frames), 500).toSeq
    for (lace <- 1 to 3) {
      // framesPerCluster = 1 → each block carries ONE frame but still
      // sets the lacing flag and a 0 count byte
      val laced = MkvFrameDecoder.write(4, 4, 2, 1, frames,
        framesPerCluster = 1, lacing = lace)
      val got = dec.decode(s"one$lace.mkv", laced, 500).toSeq
      assert(got.map(_.timestampMs) === want.map(_.timestampMs),
        s"lacing $lace")
      got.zip(want).foreach { case (g, w) =>
        assert(g.image.toSeq === w.image.toSeq, s"lacing $lace pixels")
      }
    }
  }

  test("V_UNCOMPRESSED/I420 real-decodes raw planar YUV — pixel-" +
      "identical to the same frame bytes in a y4m wrapper") {
    // two 4x4 I420 frames: distinguishable luma, fixed neutral chroma
    def i420(luma: Int): Array[Byte] = {
      val f = new Array[Byte](4 * 4 + 2 * (2 * 2))
      java.util.Arrays.fill(f, 0, 16, luma.toByte)
      java.util.Arrays.fill(f, 16, 24, 128.toByte)
      f
    }
    val frames = Seq(i420(60), i420(190))
    val mkv = MkvFrameDecoder.write(4, 4, 2, 1, frames,
      codecId = "V_UNCOMPRESSED", colourSpace = "I420")
    val y4m = Y4MFrameDecoder.write(4, 4, 2, 1, "420mpeg2", frames)
    val dec = new MkvFrameDecoder(fallback = new SyntheticFrameDecoder())
    val got = dec.decode("t.mkv", mkv, 500).toSeq
    val want = new Y4MFrameDecoder().decode("t.y4m", y4m, 500).toSeq
    assert(got.size === 2)
    assert(got.map(_.timestampMs) === want.map(_.timestampMs))
    got.zip(want).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }
    assert(got(1).image(0) > got(0).image(0) + 0.3f)
    // a V_UNCOMPRESSED track with an UNSUPPORTED fourcc still routes
    // pixels to the seam instead of mis-decoding; a wrong-size frame
    // under I420 fails typed
    val odd = MkvFrameDecoder.write(4, 4, 2, 1, frames,
      codecId = "V_UNCOMPRESSED", colourSpace = "YUY2")
    assert(dec.decode("o.mkv", odd, 500).toSeq.head.width === 8) // synth
    val short = MkvFrameDecoder.write(4, 4, 2, 1,
      Seq(Array.tabulate[Byte](10)(_.toByte)),
      codecId = "V_UNCOMPRESSED", colourSpace = "I420")
    val e = intercept[IllegalArgumentException](
      dec.decode("s.mkv", short, 500).toSeq)
    assert(e.getMessage.contains("I420 frame"))
  }

  test("a Cluster Timestamp AFTER its blocks fails typed (frames would " +
      "be silently mis-based on cluster time zero)") {
    // 2 frames in cluster 2 (ts=1000): swap the ClusterTs element and
    // the first block within the cluster payload — sizes unchanged, so
    // the container stays structurally valid but the blocks now precede
    // their timestamp
    val two = MkvFrameDecoder.write(4, 4, 2, 1,
      jpegs(Seq(0.2f, 0.4f, 0.6f, 0.8f)), framesPerCluster = 2)
    val c2 = {
      val c1 = findPat(two, Array(0x1f, 0x43, 0xb6.toByte, 0x75))
      findPat(two, Array(0x1f, 0x43, 0xb6.toByte, 0x75), c1 + 4)
    }
    val szLen = java.lang.Integer.numberOfLeadingZeros(
      two(c2 + 4) & 0xff) - 23
    val tsAt = c2 + 4 + szLen
    assert((two(tsAt) & 0xff) === 0xe7)
    val tsLen = 2 + ((two(tsAt + 1) & 0xff) - 0x80) // id + size + payload
    val blockAt = tsAt + tsLen
    assert((two(blockAt) & 0xff) === 0xa3)
    val blkSzFirst = two(blockAt + 1) & 0xff
    val blkSzLen = java.lang.Integer.numberOfLeadingZeros(blkSzFirst) - 23
    val blkPayload = {
      var v = (blkSzFirst & (0xff >>> blkSzLen)).toLong
      for (j <- 1 until blkSzLen)
        v = (v << 8) | (two(blockAt + 1 + j) & 0xff)
      v.toInt
    }
    val blkLen = 1 + blkSzLen + blkPayload
    val swapped = two.take(tsAt) ++
      two.slice(blockAt, blockAt + blkLen) ++
      two.slice(tsAt, tsAt + tsLen) ++
      two.drop(blockAt + blkLen)
    assert(swapped.length === two.length)
    val dec = new MkvFrameDecoder(fallback = new SyntheticFrameDecoder())
    val e = intercept[IllegalArgumentException](
      dec.decode("swap.mkv", swapped, 500).toSeq)
    // the block-first guard fires (a block with NO preceding Timestamp);
    // the symmetric late-Timestamp guard backs it up
    assert(e.getMessage.contains("block before any Timestamp"))
    // and a cluster MISSING its Timestamp entirely fails the same way:
    // drop the ts element instead of swapping it (sizes re-derived by
    // shrinking the cluster and segment size VINTs is fiddly — simplest
    // correct form is a 1-byte Void element 0xEC in its place)
    val voided = two.clone()
    voided(tsAt) = 0xec.toByte // Void element: id EC, same size byte
    val e2 = intercept[IllegalArgumentException](
      dec.decode("void.mkv", voided, 500).toSeq)
    assert(e2.getMessage.contains("block before any Timestamp"))
  }

  test("AutoFrameDecoder routes mkv by EBML magic, not extension") {
    val auto = new AutoFrameDecoder(fallback = new SyntheticFrameDecoder())
    val mkv = MkvFrameDecoder.write(4, 4, 2, 1, jpegs(Seq(0.9f)))
    // mkv content under a LYING .mp4 extension still real-decodes
    val real = auto.decode("clip.mp4", mkv, 500).toSeq
    assert(real.size === 1)
    assert(real.head.image(0) > 0.8f && real.head.width === 4)
    // and the file-path (content == null) probe sniffs from disk
    val dir = java.nio.file.Files.createTempDirectory("mkvroute")
    val p = dir.resolve("lying.avi")
    java.nio.file.Files.write(p, mkv)
    val viaPath = auto.decode(p.toString, null, 500).toSeq
    assert(viaPath.size === 1 && viaPath.head.width === 4)
  }

  test("O7 end-to-end on REAL mkv bytes through Frames.extract") {
    val s = spark
    import s.implicits._
    val mkv = MkvFrameDecoder.write(4, 4, 2, 1, jpegs(Seq(0.2f, 0.7f)))
    val df = Seq(("gs://bucket/train/cats/clip.mkv", "cats", "train",
      mkv)).toDF("filename", "label", "dataset", "content")
    val frames = Frames.extract(df,
      new AutoFrameDecoder(fallback = new SyntheticFrameDecoder()), 500)
      .collect().toSeq
    assert(frames.map(_.timestamp_ms) === Seq(0L, 500L))
    assert(frames.forall(f => f.width == 4 && f.height == 4))
    assert(frames.head.image(0) < 0.3f && frames(1).image(0) > 0.6f)
  }
}
