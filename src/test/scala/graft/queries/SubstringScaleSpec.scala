package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke + fixed-point property for the exact-substring
  * dedup family (Lee et al. 2022) — the newest heavy path: gram volume ≈
  * token volume at stride 1, so 20k docs × 80 tokens ≈ 620k positional
  * gram hashes through the real production lineage
  * ([[Dedup.substringSpans]] / [[Dedup.substringCutSpans]], the exact
  * functions behind dd_substring / dd_substring_clean).
  *
  * Corpus: 20k docs of 80 md5-derived tokens, generated distributed (no
  * driver-side data). Docs with doc_id ≡ 7 (mod 100) — 200 of them —
  * carry a PLANTED shared 60-token block at token positions 11..70; all
  * other token streams are (doc, pos)-unique, so the planted block is the
  * complete ground truth.
  *
  * Asserts, at gram width 50 (the production SubstringGramN):
  *  1. span RECALL: localization finds exactly one span per planted doc,
  *     at exactly (start 11, len 60, 11 grams) — nothing else;
  *  2. LEDGER conservation: the keeper doc (min doc_id = 7) cuts zero
  *     tokens, every other planted doc cuts exactly its 60-token block,
  *     non-planted docs cut nothing, and corpus-wide
  *     tokens_kept + tokens_cut = total tokens;
  *  3. IDEMPOTENCE (the Lee et al. fixed point): re-running localization
  *     on the cut survivors finds ZERO cross-doc spans — the strongest
  *     correctness statement the removal ledger can make.
  */
class SubstringScaleSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 20000
  private val tokensPerDoc = 80
  private val blockStart = 11 // 1-indexed, inclusive
  private val blockLen = 60
  private val n = Dedup.substringGramN // 50
  private val plantedDocs = nDocs / 100 // doc_id ≡ 7 (mod 100)

  // token (doc, pos) = 8-hex md5 slice (NOT 4: at 1.6M tokens a 16-bit
  // token space yields ~0.6 expected cross-doc collisions at the
  // block-adjacent positions, which extend a planted span by one token
  // and break the exact ground truth; 32 bits puts that at ~1e-5);
  // planted docs swap positions 11..70 for the shared block (tokens
  // derived from "shared|pos", verbatim-identical across planted docs)
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(1), lit(tokensPerDoc)), p =>
      substring(md5(concat(
        when(col("id") % 100 === 7 &&
            p.between(blockStart, blockStart + blockLen - 1), lit("shared"))
          .otherwise(col("id").cast("string")),
        lit("|"), p.cast("string")).cast("binary")), 1, 8))).as("text"))

  test("localization recalls exactly the planted 60-token block " +
      "in all 200 planted docs at 20k-doc scale") {
    val spans = Dedup.substringSpans(corpus, n)
      .select(col("doc_id"), col("span_start"), col("span_len"),
        col("n_grams")).cache()
    assert(spans.count() === plantedDocs.toLong) // one span per planted doc
    assert(spans.filter(col("doc_id") % 100 =!= 7).count() === 0)
    // every span is exactly the planted block: starts at 11, covers 60
    // tokens, merged from the 11 duplicated gram starts (11..21)
    assert(spans.filter(col("span_start") =!= blockStart ||
      col("span_len") =!= blockLen ||
      col("n_grams") =!= (blockLen - n + 1)).count() === 0)
    spans.unpersist()
  }

  test("removal ledger: keeper doc intact, every clone cuts its block, " +
      "tokens conserved corpus-wide") {
    val cut = Dedup.substringCutSpans(corpus, n).cache()
    // keeper = lexicographically-first (doc_id, start) = doc 7: cut nothing
    assert(cut.filter(col("doc_id") === 7).count() === 0)
    // every other planted doc cuts exactly one span — its whole block
    assert(cut.count() === (plantedDocs - 1).toLong)
    assert(cut.filter(col("span_start") =!= blockStart ||
      col("span_len") =!= blockLen).count() === 0)
    assert(cut.filter(col("doc_id") % 100 =!= 7).count() === 0)
    // conservation: tokens_cut sums to (clones × block), so
    // tokens_kept + tokens_cut = n_tokens corpus-wide
    val tokensCut = cut.agg(sum(col("span_len"))).head.getLong(0)
    assert(tokensCut === (plantedDocs - 1).toLong * blockLen)
    val totalTokens = nDocs.toLong * tokensPerDoc
    assert((totalTokens - tokensCut) + tokensCut === totalTokens)
    cut.unpersist()
  }

  test("idempotence: localization on the cut survivors finds zero " +
      "cross-doc spans (fixed point)") {
    val toks = corpus
      .select(col("doc_id"),
        posexplode(graft.text.TextOps.tokens(col("text"))).as(Seq("p", "tok")))
      .withColumn("pos", col("p") + 1) // 1-indexed, as posGramHashes
    val cut = Dedup.substringCutSpans(corpus, n)
      .select(col("doc_id").as("c_doc"), col("span_start"), col("span_len"))
    // survivors = tokens outside every cut span, rebuilt in position order
    val kept = toks.join(cut,
      toks("doc_id") === cut("c_doc") &&
        col("pos") >= col("span_start") &&
        col("pos") < col("span_start") + col("span_len"),
      "left_anti")
    val cleaned = kept.groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("text"))
    assert(cleaned.count() === nDocs.toLong) // no doc fully cut here
    assert(Dedup.substringSpans(cleaned, n).count() === 0)
  }
}
