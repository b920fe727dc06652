package graft.pipeline

import graft.SparkSpec

/** The fragmented-mp4 reader's OTHER addressing/flag forms — the ones
  * `Mp4FrameDecoder.writeFragmented` (default-base-is-moof, tfhd
  * default duration, per-size trun) does not emit, hand-assembled here
  * so every §8.8 flag path the parser claims is actually walked:
  *   - explicit tfhd base-data-offset (u64) instead of moof-relative,
  *   - per-sample durations AND composition-time offsets in trun,
  *   - first-sample-flags present,
  *   - TWO truns in one traf (the second continuing the data cursor),
  *   - sample size falling through tfhd to the trex DEFAULT.
  * Reference output is the progressive layout of the same frames.
  */
class Mp4FragmentFormsSpec extends SparkSpec {

  private def be32(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
  private def fullBox(typ: String, flags: Int,
      payload: Array[Byte]): Array[Byte] =
    box(typ, Array[Byte](0, (flags >> 16).toByte, (flags >> 8).toByte,
      flags.toByte) ++ payload)

  private def solid(v: Float) = Array.fill(4 * 4 * 3)(v)
  private def jpeg(v: Float) =
    AviMjpegFrameDecoder.encodeJpeg(solid(v), 4, 4)

  test("explicit base-data-offset, per-sample durations + cto, " +
      "first-sample-flags, two truns per traf, trex-default sizes") {
    // 4 frames at uniform duration 1 unit @ 2 units/s — but delivered
    // as per-sample durations (1,1 | 1,1) split across TWO truns
    val frames = Seq(jpeg(0.15f), jpeg(0.35f), jpeg(0.65f), jpeg(0.85f))
    val progressive = Mp4FrameDecoder.write(4, 4, 2, 1, frames)

    // prefix (ftyp + moov with empty tables + mvex/trex) comes from the
    // library writer; its trex carries default duration. For the
    // trex-default-SIZE case all frames must be equal-sized, so re-use
    // frame 0's bytes everywhere in that variant (below).
    val template = Mp4FrameDecoder.writeFragmented(4, 4, 2, 1, frames)
    val moofAt = {
      val pat = "moof".getBytes("US-ASCII")
      (0 until template.length - 4).find(i => pat.indices.forall(j =>
        template(i + j) == pat(j))).get - 4
    }
    val prefix = template.take(moofAt)

    // -- variant A: explicit base + per-sample duration/cto + fsf +
    //    two truns (sizes per sample) ------------------------------------
    def buildA(base: Long): Array[Byte] = {
      // tfhd: flags = base-data-offset(0x1); payload: track_id, base
      val tfhd = fullBox("tfhd", 0x000001, be32(1) ++ be64(base))
      val tfdt = fullBox("tfdt", 0, be32(0)) // decode time 0
      // trun flags: data-offset absent on trun 2 (cursor continues);
      // first-sample-flags(0x4) + duration(0x100) + size(0x200) +
      // cto(0x800)
      def trun(group: Seq[Array[Byte]], withOffset: Option[Long]) = {
        // fsf(0x4) + per-duration(0x100) + per-size(0x200) + cto(0x800)
        val fl = 0x000b04 | (if (withOffset.isDefined) 1 else 0)
        fullBox("trun", fl,
          be32(group.length.toLong) ++
            withOffset.map(be32).getOrElse(Array.emptyByteArray) ++
            be32(0) ++ // first_sample_flags
            group.flatMap(g => be32(1L) ++ be32(g.length.toLong) ++
              be32(0L)).toArray) // duration, size, cto
      }
      val t1 = trun(frames.take(2), Some(0L)) // data_offset 0 from base
      val t2 = trun(frames.drop(2), None) // cursor continues
      box("moof", fullBox("mfhd", 0, be32(1)) ++
        box("traf", tfhd ++ tfdt ++ t1 ++ t2))
    }
    val moofLenA = buildA(0).length
    val mdatA = box("mdat", frames.toArray.flatten)
    // explicit base = absolute offset of the mdat PAYLOAD
    val fileA = prefix ++ buildA(prefix.length + moofLenA + 8L) ++ mdatA

    val dec = new Mp4FrameDecoder(fallback = new SyntheticFrameDecoder())
    val want = dec.decode("p.mp4", progressive, 250).toSeq
    val gotA = dec.decode("a.mp4", fileA, 250).toSeq
    assert(gotA.map(_.timestampMs) === want.map(_.timestampMs))
    gotA.zip(want).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }

    // -- variant B: NO size anywhere in tfhd/trun — falls through to
    //    the trex default (requires equal-size samples) ------------------
    val one = jpeg(0.4f)
    val eq = Seq(one, one, one)
    // template's trex default_sample_size is 0, so build a moov whose
    // trex carries the real size: patch the template's trex in place
    // (trex payload: version/flags, track_id, desc_idx, duration, SIZE,
    // flags — size is the 5th u32 after the box header)
    val tpl2 = Mp4FrameDecoder.writeFragmented(4, 4, 2, 1, eq)
    val trexAt = {
      val pat = "trex".getBytes("US-ASCII")
      (0 until tpl2.length - 4).find(i => pat.indices.forall(j =>
        tpl2(i + j) == pat(j))).get
    }
    val patched = tpl2.clone()
    be32(one.length.toLong).zipWithIndex.foreach { case (b, j) =>
      patched(trexAt + 4 + 16 + j) = b // +4cc, +v/f+id+desc+dur
    }
    val moofAt2 = {
      val pat = "moof".getBytes("US-ASCII")
      (0 until patched.length - 4).find(i => pat.indices.forall(j =>
        patched(i + j) == pat(j))).get - 4
    }
    val prefix2 = patched.take(moofAt2)
    def buildB: Array[Byte] = {
      val tfhd = fullBox("tfhd", 0x020000, be32(1)) // base-is-moof
      val tfdt = fullBox("tfdt", 0, be32(0))
      // duration-only trun (0x100) + data-offset(1): size from trex
      val trun = fullBox("trun", 0x000101,
        be32(eq.length.toLong) ++ be32(0L) ++ // offset patched below
          eq.flatMap(_ => be32(1L)).toArray)
      box("moof", fullBox("mfhd", 0, be32(1)) ++
        box("traf", tfhd ++ tfdt ++ trun))
    }
    val moofB = buildB
    // patch the trun data_offset (= moof size + mdat header) in place:
    // it is the u32 right after trun's sample_count
    val trunAt = {
      val pat = "trun".getBytes("US-ASCII")
      (0 until moofB.length - 4).find(i => pat.indices.forall(j =>
        moofB(i + j) == pat(j))).get
    }
    be32(moofB.length + 8L).zipWithIndex.foreach { case (b, j) =>
      moofB(trunAt + 4 + 4 + 4 + j) = b // +4cc, +v/f, +count
    }
    val fileB = prefix2 ++ moofB ++ box("mdat", eq.toArray.flatten)
    val gotB = dec.decode("b.mp4", fileB, 500).toSeq
    val wantB = dec.decode("pb.mp4",
      Mp4FrameDecoder.write(4, 4, 2, 1, eq), 500).toSeq
    assert(gotB.map(_.timestampMs) === wantB.map(_.timestampMs))
    gotB.zip(wantB).foreach { case (g, w) =>
      assert(g.image.toSeq === w.image.toSeq)
    }
  }

  test("hostile fragment boxes fail TYPED: truncated tfhd/tfdt, a non-" +
      "first traf with implicit previous-traf-end addressing, and a " +
      "tfdt that rewinds the clock between fragments") {
    val frames = Seq(jpeg(0.2f), jpeg(0.5f), jpeg(0.8f))
    val template = Mp4FrameDecoder.writeFragmented(4, 4, 2, 1, frames,
      framesPerFragment = 2)
    val moofAt = {
      val pat = "moof".getBytes("US-ASCII")
      (0 until template.length - 4).find(i => pat.indices.forall(j =>
        template(i + j) == pat(j))).get - 4
    }
    val prefix = template.take(moofAt)
    val dec = new Mp4FrameDecoder(fallback = new SyntheticFrameDecoder())

    // (a) tfhd whose flags claim a base-data-offset the payload lacks:
    // must be the typed flag/payload mismatch, never a raw AIOOBE
    val shortTfhd = fullBox("tfhd", 0x000001, be32(1)) // no u64 base
    val moofShort = box("moof", fullBox("mfhd", 0, be32(1)) ++
      box("traf", shortTfhd ++ fullBox("tfdt", 0, be32(0)) ++
        fullBox("trun", 0x000201, be32(1) ++ be32(0) ++ be32(64))))
    val eA = intercept[IllegalArgumentException](
      dec.decode("short.mp4", prefix ++ moofShort, 500).toSeq)
    assert(eA.getMessage.contains("optional bytes"))

    // (b) v1 tfdt with a v0-sized payload
    val shortTfdt = box("tfdt", Array[Byte](1, 0, 0, 0) ++ be32(0))
    val moofTfdt = box("moof", fullBox("mfhd", 0, be32(1)) ++
      box("traf", fullBox("tfhd", 0x020000, be32(1)) ++ shortTfdt ++
        fullBox("trun", 0x000201, be32(1) ++ be32(0) ++ be32(64))))
    val eB = intercept[IllegalArgumentException](
      dec.decode("tfdt.mp4", prefix ++ moofTfdt, 500).toSeq)
    assert(eB.getMessage.contains("tfdt"))

    // (c) second traf in one moof with NEITHER base-data-offset nor
    // default-base-is-moof: per 14496-12 §8.8.7 its implicit base is
    // the previous traf's data end — unsupported, so it must fail
    // typed, not silently anchor at the moof and decode wrong bytes
    def traf(flags: Int) = box("traf",
      fullBox("tfhd", flags, be32(1)) ++ fullBox("tfdt", 0, be32(0)) ++
        fullBox("trun", 0x000201,
          be32(1) ++ be32(0) ++ be32(frames.head.length.toLong)))
    val moofTwo = box("moof", fullBox("mfhd", 0, be32(1)) ++
      traf(0x020000) ++ traf(0))
    val eC = intercept[IllegalArgumentException](
      dec.decode("two.mp4", prefix ++ moofTwo ++
        box("mdat", frames.head), 500).toSeq)
    assert(eC.getMessage.contains("non-first traf"))

    // (d) a tfdt rewinding the clock between fragments: the sample
    // selector's binary search needs monotone starts, so the parse
    // must reject it rather than silently return wrong frames
    val rewound = template.clone()
    val pat = "tfdt".getBytes("US-ASCII")
    val tfdtIdx = (0 until rewound.length - 4).filter(i =>
      pat.indices.forall(j => rewound(i + j) == pat(j)))
    assert(tfdtIdx.length === 2)
    // second fragment's decode time (payload u32 after 4cc + v/f) → 0,
    // which is BEFORE fragment 1's last sample start
    for (j <- 0 until 4) rewound(tfdtIdx(1) + 8 + j) = 0
    val eD = intercept[IllegalArgumentException](
      dec.decode("rewind.mp4", rewound, 500).toSeq)
    assert(eD.getMessage.contains("rewind"))
  }
}
