package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 additions — properties the DuckDB
  * hash compare can't express: the filter funnel must be monotone, the
  * snapshot delta must account for every doc on both sides, IVF-PQ must
  * stay inside each probe's inverted list, and OOV rates must be valid
  * fractions against a vocabulary of the declared size.
  */
class Round5OpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("txt_filter_funnel: one row, monotone non-increasing stages") {
    val rows = run("txt_filter_funnel").collect()
    assert(rows.length === 1)
    val r = rows(0)
    val stages = Seq("n_input", "n_after_length", "n_after_distinct",
      "n_after_stopword", "n_after_tokenlen")
      .map(c => r.getLong(r.fieldIndex(c)))
    assert(stages.zip(stages.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: $stages")
    assert(stages.head > 0)
  }

  test("dd_delta: statuses partition both snapshots exactly") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val nOld = d.filter(col("doc_id") % 10 < 8).count()
    val nNew = d.filter(col("doc_id") % 10 >= 2).count()
    val byStatus = run("dd_delta").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(s: String) = byStatus.getOrElse(s, 0L)
    // old = removed + changed + unchanged; new = added + changed + unchanged
    assert(n("removed") + n("changed") + n("unchanged") === nOld)
    assert(n("added") + n("changed") + n("unchanged") === nNew)
    // the %7 revision inside the overlap must surface as 'changed'
    val nChanged = d.filter(col("doc_id") % 10 >= 2 &&
      col("doc_id") % 10 < 8 && col("doc_id") % 7 === 0).count()
    assert(n("changed") === nChanged)
  }

  test("sim_ivfpq: neighbors come from the probe's inverted list only") {
    val emb = graft.Tables.sharded(spark, sfDir, "embeddings")
    val assigned = graft.similarity.VectorOps
      .assignIvf(emb, Similarity.CentroidModulo)
      .select(col("vec_id"), col("centroid_id"))
    val res = run("sim_ivfpq")
    // per (probe, neighbor): both must share the centroid
    val joined = res
      .join(assigned.withColumnRenamed("vec_id", "probe_id")
        .withColumnRenamed("centroid_id", "probe_cent"), "probe_id")
      .join(assigned.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("centroid_id", "neighbor_cent"), "neighbor_id")
    assert(joined.filter(col("probe_cent") =!= col("neighbor_cent"))
      .count() === 0)
    // ranks are 1..k contiguous per probe and a probe never self-matches
    assert(res.filter(col("probe_id") === col("neighbor_id")).count() === 0)
    val badRanks = res.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        min(col("rank")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badRanks.count() === 0)
  }

  test("txt_oov_rate: rates are valid fractions; some doc hits the vocab") {
    val res = run("txt_oov_rate").cache()
    assert(res.filter(col("n_oov") > col("n_tokens") ||
      col("n_oov") < 0).count() === 0)
    assert(res.filter(col("oov_milli") > 1000 ||
      col("oov_milli") < 0).count() === 0)
    // a 200-token vocab over the fixture must cover something somewhere
    assert(res.filter(col("n_oov") < col("n_tokens")).count() > 0)
  }

  test("txt_sentences: totals agree with the flat tokenizer") {
    val res = run("txt_sentences")
    // sentence-wise token sum can never exceed the doc's flat token count
    // (sentence split only removes [.!?] which the tokenizer also drops,
    // so it must be EQUAL)
    val flat = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long")
          .as("n_flat"))
    val j = res.join(flat, "doc_id")
    assert(j.filter(col("n_tokens") =!= col("n_flat")).count() === 0)
    assert(res.filter(col("max_sent_tokens") > col("n_tokens")).count() === 0)
  }

  test("sim_filtered_knn: every neighbor satisfies the probe's predicate") {
    val res = run("sim_filtered_knn").cache()
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"))
    // pre-filtered semantics: neighbor label == probe label, always
    val j = res.join(labels, "probe_id")
    assert(j.filter(col("label") =!= col("probe_label")).count() === 0)
    assert(res.filter(col("probe_id") === col("neighbor_id")).count() === 0)
    // filtered results are a subset of the unfiltered bucket search at
    // the same k ONLY when labels agree — spot-check rank sanity instead:
    // ranks contiguous from 1 per probe
    val bad = res.groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .filter(col("mx") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("sim_ivf_stats: loads sum to ~1000 per bucket on average") {
    val res = run("sim_ivf_stats").cache()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // every vector is assigned exactly once
    assert(res.agg(sum(col("n_members"))).head.getLong(0) === emb.count())
    assert(res.filter(col("n_members") <= 0).count() === 0)
    // integer-floor load factors: mean load must bracket 1000
    val loads = res.select(col("load_milli")).collect().map(_.getLong(0))
    val mean = loads.sum.toDouble / loads.length
    assert(mean > 500 && mean < 1500, s"implausible mean load $mean")
  }

  test("txt_bpe_encode: merges only shrink; corpus-wide compression > 0") {
    val res = run("txt_bpe_encode").cache()
    // a merge replaces 2 symbols with 1 — encoded length never grows
    assert(res.filter(col("enc_symbols") > col("raw_chars")).count() === 0)
    assert(res.filter(col("saved_milli") < 0 ||
      col("saved_milli") >= 1000).count() === 0)
    // the 3 trained merges must actually fire somewhere in the corpus
    val saved = res.agg(sum(col("raw_chars") - col("enc_symbols"))).head
    assert(saved.getLong(0) > 0, "trained merges never applied")
    // every doc that has tokens is present
    val withToks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    assert(res.count() === withToks.count())
  }

  test("sim_recall_pq: one row per probe, recall = n_hit/k within [0,1]") {
    val res = run("sim_recall_pq").collect()
    assert(res.length === Similarity.PqProbeN)
    res.foreach { r =>
      val k = r.getLong(r.fieldIndex("k"))
      val nHit = r.getLong(r.fieldIndex("n_hit"))
      val recall = r.getDouble(r.fieldIndex("recall"))
      assert(k === 5L)
      assert(nHit >= 0L && nHit <= k)
      assert(recall === nHit.toDouble / k)
    }
  }

  test("dd_incremental_lsh: pairs cross the delta/index boundary only") {
    val res = run("dd_incremental_lsh").cache()
    // sides are disjoint by construction — assert it holds in the output
    assert(res.filter(col("new_id") % 10 < 8).count() === 0)
    assert(res.filter(col("indexed_id") % 10 >= 8).count() === 0)
    // band agreement is bounded by the band count (K / RowsPerBand = 4)
    assert(res.filter(col("n_bands") < 1 || col("n_bands") > 4).count() === 0)
    // every cross-boundary pair from the FULL-corpus candidate generator
    // must be found by the incremental join (no recall loss vs full LSH)
    val full = run("dd_minhash_lsh")
    val crossFull = full.filter(
      (col("doc_a") % 10 >= 8) =!= (col("doc_b") % 10 >= 8))
    val missing = crossFull.join(res,
      (col("doc_a") === col("indexed_id") && col("doc_b") === col("new_id")) ||
        (col("doc_a") === col("new_id") && col("doc_b") === col("indexed_id")),
      "left_anti")
    assert(missing.count() === 0)
  }

  test("q24_selfjoin_estimate: CM estimate bounds the exact F2 above") {
    val rows = run("q24_selfjoin_estimate").collect()
    assert(rows.length === 1)
    val r = rows(0)
    val est = r.getLong(r.fieldIndex("est_selfjoin"))
    val exact = r.getLong(r.fieldIndex("exact_selfjoin"))
    val n = r.getLong(r.fieldIndex("n_rows"))
    // counters only add — the inner-product estimate NEVER undershoots
    // (the deterministic half of the CM guarantee; the N²/width error
    // side is an EXPECTATION bound, so it is not asserted — an unlucky
    // hash draw may legally exceed it)
    assert(est >= exact)
    // sanity ceiling: the estimate cannot exceed N² (everything in one
    // bucket in every depth row)
    assert(est <= n * n)
    // F2 is at least N (all keys distinct) and at most N² (one key)
    assert(exact >= n && exact <= n * n)
  }

  test("dd_report: the card agrees with the detail views it summarizes") {
    val r = run("dd_report").collect()(0)
    def g(c: String) = r.getLong(r.fieldIndex(c))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(g("n_docs") === docs.count())
    // exact-dup count = Σ(group−1) over dd_exact's groups
    val fromDetail = run("dd_exact")
      .agg(sum(col("n_docs") - 1)).head.getLong(0)
    assert(g("n_exact_dup_docs") === fromDetail)
    // pair count = dd_minhash_lsh's row count
    assert(g("n_lsh_pairs") === run("dd_minhash_lsh").count())
    // contaminated = dd_contamination rows with ≥3 shared shingles
    assert(g("n_contaminated_eval") ===
      run("dd_contamination").filter(col("n_shared_shingles") >= 3).count())
  }

  test("ev_window_topk: at most 3 per window, counts dominate the cut") {
    val res = run("ev_window_topk").cache()
    val perWindow = res.groupBy(col("window_start"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
    assert(perWindow.filter(col("n") > 3 || col("mx") > 3).count() === 0)
    // rank order must agree with count order inside each window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start")).orderBy(col("rank"))
    val nonMonotone = res.withColumn("next_n", lead(col("n"), 1).over(w))
      .filter(col("next_n").isNotNull && col("next_n") > col("n"))
    assert(nonMonotone.count() === 0)
  }
}
