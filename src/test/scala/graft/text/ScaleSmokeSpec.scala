package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke: the LSH dedup path over a synthetic corpus
  * 4× the sf0.1 fixture (20k docs), generated distributed (range +
  * md5-derived tokens, no driver-side data). Verifies the shape
  * invariants that make the path survive growth: one signature row per
  * doc, bucket sizes bounded on a non-duplicated corpus (no quadratic
  * pair blowup), and exact dedup finding precisely the planted dups.
  */
class ScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val nDocs = 20000

  // ~40 tokens per doc, token = 4-hex-char word derived from (doc, pos);
  // every 100th doc duplicates doc-1's text exactly (planted exact dups)
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
      substring(md5(concat(
        when(col("id") % 100 === 0, lit(1)).otherwise(col("id")).cast("string"),
        lit("|"), j.cast("string")).cast("binary")), 1, 4))).as("text"))

  test("LSH signatures and buckets stay shape-sane at 4x bench scale") {
    val sigs = TextOps.minhashSignatures(corpus, n = 3, k = 12)
    assert(sigs.count() === nDocs) // one signature row per doc

    val cand = TextOps.lshCandidates(corpus, n = 3, k = 12, rowsPerBand = 3)
      .cache()
    val nCand = cand.count()
    // planted dups: docs {0, 100, 200, ...} all share doc 1's text → they
    // and doc 1 form one clique; uniform non-dup docs add ~no candidates
    val clique = nDocs / 100 + 1
    val expectedMin = clique.toLong * (clique - 1) / 2
    assert(nCand >= expectedMin)
    assert(nCand <= expectedMin + nDocs / 20,
      s"uniform corpus should not explode candidates, got $nCand")
    cand.unpersist()
  }

  test("incremental delta-vs-index join stays delta-bounded at 4x scale") {
    // dd_incremental_lsh's shape at 4× bench scale, with clones planted
    // IN THE DELTA: docs ≡ 8 (mod 100) share doc 1's text, so every
    // clone lands on the delta side (last digit 8) and its source doc 1
    // on the index side. Contract: each planted clone surfaces against
    // doc 1 with FULL band agreement (identical text ⇒ identical
    // signature), and the 20k-doc uniform remainder adds ~nothing —
    // refresh work tracks the delta, not the corpus.
    val deltaCorpus = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(39)), j =>
        substring(md5(concat(
          when(col("id") % 100 === 8, lit(1)).otherwise(col("id"))
            .cast("string"),
          lit("|"), j.cast("string")).cast("binary")), 1, 4))).as("text"))
    val banded = TextOps.bandedRows(
      TextOps.minhashSignatures(deltaCorpus, n = 3, k = 12), k = 12,
      rowsPerBand = 3).localCheckpoint()
    val idx = banded.filter(col("doc_id") % 10 < 8)
    val delta = banded.filter(col("doc_id") % 10 >= 8)
      .select(col("band"), col("bh"), col("doc_id").as("new_id"))
    val pairs = idx.join(delta, Seq("band", "bh"))
      .select(col("new_id"), col("doc_id").as("indexed_id"), col("band"))
      .groupBy(col("new_id"), col("indexed_id"))
      // plain count, NOT countDistinct: bandedRows emits one row per
      // (doc, band), so the join yields each band at most once — this is
      // the exact aggregation dd_incremental_lsh ships, mirrored here
      .agg(count(col("band")).as("n_bands"))
      .cache()
    // every planted clone found against doc 1, all 4 bands agreeing
    val planted = pairs.filter(col("indexed_id") === 1 &&
      col("new_id") % 100 === 8)
    assert(planted.count() === nDocs / 100)
    assert(planted.filter(col("n_bands") =!= 4).count() === 0)
    // the uniform remainder must not explode the candidate set
    assert(pairs.count() <= nDocs / 100 + nDocs / 20,
      s"uniform delta should add ~no pairs, got ${pairs.count()}")
    pairs.unpersist()
  }

  test("substring dedup stays span-bounded at 4x scale with planted spans") {
    // dd_substring's shape at 4× bench scale: 20k docs × 120 tokens, a
    // 60-token span planted mid-doc in every 100th doc, all other tokens
    // unique per doc. Contracts that make the path survive growth: the
    // duplicated-gram table is SPAN-sized (60−50+1 = 11 distinct gram
    // hashes regardless of corpus size — the doc-frequency aggregate
    // collapses the 200 planted copies), and span localization recovers
    // exactly the planted (start, length) in every planted doc with
    // zero false spans in the 19.8k unique docs.
    val gramN = 50
    // 8-hex (32-bit) tokens, unlike the 16-bit tokens of the LSH corpus
    // above: a boundary gram differs from a planted one in as little as
    // ONE token, so 16-bit tokens yield ~0.6 expected accidental extra
    // shared grams across the 19 900 planted-doc pairs; 32-bit makes the
    // exact-count assertions stable (expected ≈ 1e-5)
    def uniq(cnt: Int, salt: String) =
      transform(sequence(lit(0), lit(cnt - 1)), j =>
        substring(md5(concat(col("id").cast("string"), lit("|" + salt + "|"),
          j.cast("string")).cast("binary")), 1, 8))
    val span = transform(sequence(lit(0), lit(59)), j =>
      substring(md5(concat(lit("span|"), j.cast("string")).cast("binary")),
        1, 8))
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", concat(uniq(30, "a"),
        when(col("id") % 100 === 0, span).otherwise(uniq(60, "b")),
        uniq(30, "c"))).as("text"))
    val grams = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(TextOps.posGramHashes128(col("toks"), gramN)).as("g"))
      .select(col("doc_id"), col("g.start").as("start"),
        col("g.h1").as("h1"), col("g.h2").as("h2"))
      .localCheckpoint()
    val dup = grams.groupBy(col("h1"), col("h2"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
      .cache()
    assert(dup.count() === (60 - gramN + 1).toLong) // span-sized, not corpus-sized
    val spans = grams.join(dup.select(col("h1"), col("h2")), Seq("h1", "h2"))
      .groupBy(col("doc_id"))
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + lit(gramN.toLong) - min(col("start")))
          .as("span_len"))
      .cache()
    assert(spans.count() === (nDocs / 100).toLong) // planted docs only
    assert(spans.filter(col("span_start") =!= 31 ||
      col("span_len") =!= 60).count() === 0)
    dup.unpersist(); spans.unpersist()
  }

  test("URL canonicalization collapses crawl variants pairwise at 400k rows") {
    // dd_url_dedup's exact lineage (shared synthesis + canonicalization)
    // at 100× the sf0.01 fixture: 100k pages × 4 crawl variants must
    // yield exactly 2 canonical groups per page, each holding exactly
    // 2 docs under 2 distinct raw forms — any rule misfiring at scale
    // (regex mis-anchor, param-sort instability) breaks the invariant.
    val n = 400000L
    val ok = spark.range(n)
      .select(col("id").as("doc_id"),
        graft.queries.Dedup.crawlUrl(col("id")).as("url"))
      .withColumn("c", UrlOps.canonicalUrl(col("url")))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("nd"), countDistinct(col("url")).as("nr"))
      .agg(count(lit(1)).as("groups"),
        sum(when(col("nd") === 2 && col("nr") === 2, 1L).otherwise(0L))
          .as("pairwise"))
      .as[(Long, Long)].head()
    assert(ok === ((n / 2, n / 2)))
  }

  test("exact dedup finds exactly the planted duplicate group") {
    val groups = corpus
      .select(col("doc_id"),
        md5(concat_ws(" ", TextOps.tokens(col("text"))).cast("binary"))
          .as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .as[(String, Long)].collect()
    assert(groups.length === 1)
    assert(groups.head._2 === nDocs / 100 + 1)
  }
}
