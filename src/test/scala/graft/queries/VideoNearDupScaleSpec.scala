package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke for the frame-alignment near-dup: 50k
  * synthetic "videos" (100k recordings, ~800k frame fingerprints) —
  * generated DISTRIBUTED, no driver-side data — through the exact
  * `mm_video_neardup` lineage.
  *
  * Corpus: md5-derived 416-char payloads (8 original frames, 7 after the
  * planted trim), doc-unique; docs with doc_id ≡ 7 (mod 1000) — 50 of
  * them — share a 96-char INTRO SLATE (their whole first frame), the
  * domain's natural hot key.
  *
  * Asserts:
  *  1. recall at scale: every planted trimmed twin is found, perfectly
  *     aligned (offset 1, 7 frames, full containment) — 50,000 pairs;
  *  2. precision at scale: no cross-document pair survives the ≥3-
  *     frames-one-offset gate (random frame-hash collisions cannot vote
  *     coherently);
  *  3. hot-key economics: the slate hash is genuinely hot (df = 50 > the
  *     16 cap) and is the ONLY capped key, so candidate generation stays
  *     bounded by cap×frames per bucket — the property that makes this
  *     shape survive 1000× (planted-dup buckets grow with the true
  *     duplicate rate, everything else stays hash-uniform).
  */
class VideoNearDupScaleSpec extends SparkSpec {

  private val nDocs = 50000

  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    when(col("id") % 1000 === 7,
      concat(
        concat_ws("", transform(sequence(lit(1), lit(3)), i =>
          md5(concat(lit("slate|"), i.cast("string"))))),
        concat_ws("", transform(sequence(lit(4), lit(13)), i =>
          md5(concat(col("id").cast("string"), lit("|"),
            i.cast("string")))))))
      .otherwise(
        concat_ws("", transform(sequence(lit(1), lit(13)), i =>
          md5(concat(col("id").cast("string"), lit("|"),
            i.cast("string"))))))
      .as("text"))

  test("100k recordings: full planted recall, zero false pairs, one hot key") {
    val pairs = MultimodalQ.videoNearDup(spark, corpus).localCheckpoint()
    // recall: every doc's trimmed twin, perfectly aligned
    val twins = pairs.filter(col("rec_b") === col("rec_a") + 1 &&
      col("rec_a") % 2 === 0 &&
      col("best_offset") === 1 && col("n_aligned") === 7 &&
      col("containment_milli") === 1000).count()
    assert(twins === nDocs.toLong, s"planted twins recovered: $twins/$nDocs")
    // precision: nothing across documents
    val crossDoc = pairs.filter(expr("rec_a div 2 != rec_b div 2")).count()
    assert(crossDoc === 0L, s"$crossDoc cross-document pairs leaked")
    assert(pairs.count() === nDocs.toLong)
    // economics: exactly one hot key (the slate frame, df = 50 > cap 16);
    // the random mass stays hash-uniform far under the cap
    val dfs = MultimodalQ.videoFrames(spark, corpus)
      .groupBy(col("h")).agg(countDistinct(col("rec_id")).as("df"))
      .localCheckpoint()
    val hot = dfs.filter(col("df") > MultimodalQ.VideoDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hot.length === 1, s"unexpected hot keys: ${hot.take(5).toSeq}")
    assert(hot.head._2 === 50L) // the 50 slate originals
    val maxCold = dfs.filter(col("df") <= MultimodalQ.VideoDfCap)
      .agg(max(col("df"))).head().getLong(0)
    // every non-planted bucket is tiny: the planted twin pair (df = 2)
    // dominates random collisions
    assert(maxCold <= 4L, s"cold buckets not hash-uniform: max df $maxCold")
  }
}
