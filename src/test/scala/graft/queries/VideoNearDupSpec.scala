package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** mm_video_neardup invariants on planted corpora, driven through the
  * exact production lineage ([[MultimodalQ.videoNearDup]] /
  * [[MultimodalQ.videoFrames]] take the documents frame explicitly for
  * this):
  *
  *  - planted-twin recall: every trimmed re-upload with enough frames is
  *    found at offset +1 with exactly the expected aligned-frame count
  *    and full containment — the case whole-asset fingerprints cannot
  *    catch by construction;
  *  - hot-slate economics: a shared intro slate (one frame hash across
  *    half the corpus) is DF-capped out of the inverted index — no pair
  *    forms on slate evidence alone, twins still recover via their
  *    remaining frames;
  *  - exact parity with a brute-force alignment over the same frame
  *    hashes — the bucketed candidate generation + packed-max tie-break
  *    is an optimization, never a semantics change. (The frame hash
  *    itself is pinned to a driver-side recompute by MmDhashSpec.)
  */
class VideoNearDupSpec extends SparkSpec {

  private val S = MultimodalQ.SceneStride // 48
  private val MaxF = MultimodalQ.SceneMaxFrames // 8

  /** Deterministic per-doc text: `len` pseudo-random lowercase chars,
    * unique per doc (seeded by doc id), optionally behind a shared
    * slate prefix. Mixing matters: dHash fingerprints the ORDER pattern
    * of adjacent sampled chars, so a low-entropy arithmetic progression
    * here collides across docs (measured first — a `doc*31 + i*17` form
    * produced genuine cross-doc fingerprint matches).
    */
  private def text(doc: Long, len: Int, slate: String = ""): String =
    slate + (0 until (len - slate.length)).map { i =>
      var x = doc * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
      x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 27)
      ('a' + java.lang.Math.floorMod(x, 26L).toInt).toChar
    }.mkString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(docs: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    MultimodalQ.videoNearDup(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

  /** Brute-force reference: alignment votes over the engine's OWN frame
    * hashes, DF cap and packed-max tie-break replicated independently.
    */
  private def brute(docs: DataFrame): Set[(Long, Long, Long, Long, Long)] = {
    val fr = MultimodalQ.videoFrames(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val dfByHash = fr.groupBy(_._4).map { case (h, rows) =>
      h -> rows.map(_._1).distinct.size
    }
    val kept = fr.filter(r => dfByHash(r._4) <= MultimodalQ.VideoDfCap)
    val nf = fr.groupBy(_._1).map { case (r, rows) => r -> rows.head._2 }
    val byRec = kept.groupBy(_._1)
    val recs = byRec.keys.toSeq.sorted
    (for {
      i <- recs.indices.iterator
      j <- (i + 1) until recs.length
      a = recs(i); b = recs(j)
      votes = (for {
        (_, _, fa, ha) <- byRec(a)
        (_, _, fb, hb) <- byRec(b)
        if ha == hb
      } yield fa - fb).groupBy(identity).map { case (d, v) => (d, v.size.toLong) }
      if votes.nonEmpty
      pack = votes.map { case (d, n) => n * 1024 + (512 - d) }.max
      n = pack / 1024
      if n >= MultimodalQ.VideoMinAlign
    } yield (a, b, n, 512 - pack % 1024,
      n * 1000 / math.min(nf(a), nf(b)))).toSet
  }

  test("planted trimmed twins recover at offset +1 with exact alignment counts") {
    // lengths spanning 4..9+ strides: twins have 3..8 frames
    val docs = docsDf((0L until 40L).map(d => d -> text(d, 200 + 40 * d.toInt % 300)))
    val got = run(docs)
    import spark.implicits._
    val nf = MultimodalQ.videoFrames(spark, docs)
      .select("rec_id", "nf").distinct().as[(Long, Long)].collect().toMap
    val expected = (0L until 40L).flatMap { d =>
      val (o, t) = (2 * d, 2 * d + 1)
      for {
        nfO <- nf.get(o); nfT <- nf.get(t)
        aligned = math.min(nfT, nfO - 1)
        if aligned >= MultimodalQ.VideoMinAlign
      } yield (o, t, aligned, 1L, aligned * 1000 / math.min(nfO, nfT))
    }.toSet
    assert(expected.nonEmpty, "fixture produced no twin with enough frames")
    assert(expected.subsetOf(got),
      s"missing twins: ${(expected -- got).take(5)}")
    // unique random texts: nothing BUT the planted twins should match
    assert(got === expected, s"extra pairs: ${(got -- expected).take(5)}")
    // every twin aligns at offset +1; a twin that kept all its frames is
    // fully contained, while a MaxFrames-saturated pair (both capped at
    // 8 frames — the twin's 8th has no counterpart) reads 7/8
    got.filter { case (a, b, _, _, _) => b == a + 1 }.foreach {
      case (o, t, n, d, cm) =>
        assert(d === 1L)
        val (nfO, nfT) = (nf(o), nf(t))
        if (nfT < nfO) assert(cm === 1000L,
          s"shorter twin $t must be fully contained")
        else assert(cm === n * 1000 / nfT, s"saturated pair ($o,$t)")
    }
  }

  test("a shared intro slate is DF-capped: no slate-only pairs, twins still found") {
    // 30 docs share a 2-stride slate (covers frame 0 of every original
    // completely) + unique tails: frame-0's hash has df = 30 originals
    // > VideoDfCap and must leave the index. 200-char younger docs keep
    // 4 frames → twins recover on frames 1..3 alone.
    val slate = "the-same-intro-slate-every-upload-carries-x!".padTo(2 * S, '_')
    val docs = docsDf((0L until 30L).map(d => d -> text(d, 260, slate)))
    val fr = MultimodalQ.videoFrames(spark, docs)
    // the slate hash is genuinely hot and genuinely capped
    val hot = fr.filter(col("frame") === 0 && col("rec_id") % 2 === 0)
      .groupBy(col("h")).count().orderBy(desc("count")).head()
    assert(hot.getLong(1) === 30L, "slate frame hash must be shared by all")
    val got = run(docs)
    // no pair between two DIFFERENT docs: their only common frame is the
    // capped slate (tails are unique) — an uncapped index would emit
    // 30·29/2 candidate pairs here
    val crossDoc = got.filter { case (a, b, _, _, _) => a / 2 != b / 2 }
    assert(crossDoc.isEmpty, s"slate-only pairs leaked: ${crossDoc.take(5)}")
    // every planted twin still recovers via its non-slate frames
    val twins = got.filter { case (a, b, _, _, _) => b == a + 1 && a % 2 == 0 }
    assert(twins.size === 30, s"twins lost to the cap: ${twins.size}/30")
    assert(twins.forall(_._4 == 1L)) // all at offset +1
  }

  test("cluster ledger summarizes exactly the pair graph (sf0.001 fixture)") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    def q(name: String) = MultimodalQ.qs.find(_.name == name).get.fn(spark, sfDir)
    val pairs = q("mm_video_neardup")
      .select("rec_a", "rec_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val clusters = q("mm_video_clusters")
      .select("cluster_id", "n_members", "keep_id", "n_removed")
      .as[(Long, Long, Long, Long)].collect()
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    // every paired recording lands in exactly one set; keep-newest picks
    // are unique members of their own graph; removals = members − 1
    assert(clusters.map(_._2).sum === inPairs.size.toLong)
    assert(clusters.forall(c => c._4 === c._2 - 1))
    assert(clusters.forall(c => inPairs.contains(c._3)))
    assert(clusters.map(_._3).toSet.size === clusters.length)
  }

  test("bucketed alignment equals brute force exactly (cap + tie-break included)") {
    // a denser corpus with REPEATED content: pairs of docs share text
    // (offset-0 duplicates), some docs are others' extensions — richer
    // offset structure than the twin fixture
    val docs = docsDf(
      (0L until 12L).map(d => d -> text(d, 150 + 30 * d.toInt)) ++
        (12L until 18L).map(d => d -> text(d - 12, 150 + 30 * (d.toInt - 12))) ++ // exact dups
        (18L until 24L).map(d => d -> (text(d - 18, 150 + 30 * (d.toInt - 18)) + text(d, 120))) // extensions
    )
    val got = run(docs)
    val want = brute(docs)
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }
}
