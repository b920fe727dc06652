package graft.streaming

import graft.functions.BloomSketch
import graft.queries.Dedup
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online form of the exact-substring (Lee et al.) duplication check: a
  * STREAM of incoming documents tested per-row against a STATIC Bloom
  * filter of the reference corpus' duplicated gram hashes — the gram-level
  * sibling of [[StreamingBloom]]'s key-level decontamination and
  * [[StreamingIndexDedup]]'s doc-level LSH guard.
  *
  * Statelessness is the design point, as everywhere in this streaming
  * surface: the filter is a fixed `bits`-bit literal (built once, batch
  * side, from `dd_substring`'s duplicated-hash set via the combinable
  * [[BloomSketch]] aggregate — one bitset crosses the build shuffle
  * regardless of corpus size), and the probe is pure per-row column
  * arithmetic (tokenize → positional gram hashes → k md5-derived bit
  * tests per gram). No join, no watermark, no state store at any stream
  * length; at 100 TB/day of incoming docs the probe cost is a narrow map.
  *
  * Bloom semantics carry over verbatim: NO false negatives (a doc sharing
  * a ≥ n-token verbatim run with the reference corpus' duplicated spans is
  * always flagged), false positives at the classic (1-e^(-kn/m))^k rate —
  * the right trade for a streaming GATE, where flagged docs fall through
  * to the exact batch join ([[graft.queries.Dedup.substringSpans]]) and
  * unflagged docs skip it entirely.
  */
object StreamingSubstringGuard {

  /** Batch BUILD: fold the reference corpus' duplicated gram hashes
    * (document frequency ≥ 2, exactly dd_substring's localization
    * candidates) into one Bloom bitset. Driver result is the fixed
    * `bits/64` longs — model-sized by construction, same discipline as
    * the dd_bloom_decontam filter.
    */
  def buildGramBloom(docsDf: DataFrame, n: Int, k: Int,
      bits: Int): Array[Long] = {
    val bl = udaf(new BloomSketch(bits / 64))
    // the exact pass now carries 128-bit (h1, h2) keys; the Bloom folds
    // h1 only — the probe side hashes with the single-seed
    // posGramHashes64, whose h is bit-identical to h1, and a 64-bit
    // collision here is just one more false positive inside the
    // filter's own FP budget (flagged docs re-check exactly)
    Dedup.substringDupHashes(docsDf, n)
      .select(BloomSketch.positions(col("h1"), k, bits).as("pos"))
      .agg(bl(col("pos")).as("bloom"))
      .collect()(0).getSeq[Long](0).toArray
  }

  /** Stateless probe transform, identical for a stream or a batch frame
    * (batch ≡ streaming by construction — asserted in
    * StreamingSubstringGuardSpec): per document, count the width-n grams
    * whose hash hits the static filter. Returns (doc_id, n_grams,
    * n_flagged, might_dup); `might_dup` false is definitive (no false
    * negatives), true routes the doc to the exact batch check.
    */
  def flagged(docs: DataFrame, bloom: Array[Long], n: Int, k: Int,
      bits: Int): DataFrame = {
    val filterLit = typedLit(bloom.toSeq)
    docs
      .select(col("doc_id"),
        TextOps.posGramHashes64(TextOps.tokens(col("text")), n).as("gs"))
      .select(col("doc_id"),
        size(col("gs")).cast("long").as("n_grams"),
        size(filter(col("gs"), g =>
          BloomSketch.mightContain(filterLit, g.getField("h"), k, bits)))
          .cast("long").as("n_flagged"))
      .withColumn("might_dup", col("n_flagged") > 0)
  }
}
