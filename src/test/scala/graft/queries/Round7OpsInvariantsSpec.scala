package graft.queries

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 additions — properties the DuckDB
  * hash compare can't express: the substring removal ledger must account
  * for every doc and never cut more than it localized, the df-cap trade
  * must be monotone in the cap, the LSH sweep must be monotone down the
  * nested band factorizations, the refine stage must never score below
  * plain ADC ranking, and the cross-modal fusion must reconstruct its
  * synthesized asset arithmetic exactly.
  */
class Round7OpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("dd_substring_clean: full ledger, cuts bounded by localization") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val clean = run("dd_substring_clean").cache()
    assert(clean.count() === nDocs) // zero-cut docs included
    assert(clean.filter(col("tokens_cut") < 0 ||
      col("tokens_cut") > col("n_tokens")).count() === 0)
    assert(clean.filter((col("spans_cut") === 0) =!=
      (col("tokens_cut") === 0)).count() === 0)
    val locTotal = run("dd_substring")
      .agg(sum(col("span_len"))).collect()(0).getLong(0)
    val cutTotal = clean.agg(sum(col("tokens_cut"))).collect()(0).getLong(0)
    // cut spans are a strict subset of localized spans: every duplicated
    // gram keeps one occurrence, so strictly fewer tokens are cut than
    // were localized as duplicated
    assert(cutTotal > 0 && cutTotal < locTotal,
      s"cut=$cutTotal localized=$locTotal")
    clean.unpersist()
  }

  test("dd_shingle_cap: every column monotone non-decreasing in the cap") {
    val rows = run("dd_shingle_cap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length === 3)
    rows.zip(rows.tail).foreach { case ((_, s1, g1, p1), (_, s2, g2, p2)) =>
      assert(s1 <= s2 && g1 <= g2 && p1 <= p2,
        s"df-cap trade not monotone: $rows")
    }
    val (_, _, gUncapped, pUncapped) = rows.last
    assert(pUncapped > 0) // the fixture plants duplicates
    assert(gUncapped >= pUncapped) // generation cost counts pair multiplicity
  }

  test("dd_lsh_sweep: monotone down genuinely nested factorizations") {
    // Set containment holds only where every band of the coarser config
    // is a union of full bands of the finer one: a (b, r) collision then
    // implies a collision in each contained band. That nests
    // (12,1) ⊇ (6,2) ⊇ (4,3) ⊇ (2,6) ⊇ (1,12) and (6,2) ⊇ (3,4) ⊇ (2,6)
    // — but NOT (4,3) vs (3,4): the r=4 band [mh4..mh7] contains no
    // aligned r=3 triple, so those two are incomparable and a blanket
    // sort-by-rows chain would assert an invariant the math doesn't give
    val byCfg = run("dd_lsh_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(byCfg.size === 6)
    assert(byCfg.values.map(_._2).toSeq.distinct.length === 1) // one truth
    val chains = Seq(
      Seq((12L, 1L), (6L, 2L), (4L, 3L), (2L, 6L), (1L, 12L)),
      Seq((6L, 2L), (3L, 4L), (2L, 6L)))
    chains.foreach(chain => chain.zip(chain.tail).foreach {
      case (wide, narrow) =>
        val (c1, _, f1, rec1) = byCfg(wide)
        val (c2, _, f2, rec2) = byCfg(narrow)
        assert(c1 >= c2 && f1 >= f2 && rec1 >= rec2,
          s"sweep not monotone between $wide and $narrow")
    })
    byCfg.values.foreach { case (c, t, f, rec) =>
      assert(f <= math.min(c, t) && rec >= 0.0 && rec <= 1.0)
    }
  }

  test("dd_lsh_bucket_cap: monotone in the cap; loose cap equals the " +
      "uncapped candidate set") {
    val rows = run("dd_lsh_bucket_cap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.length === 3)
    assert(rows.map(_._4).distinct.length === 1) // one ground truth
    rows.zip(rows.tail).foreach {
      case ((_, o1, c1, _, f1, r1), (_, o2, c2, _, f2, r2)) =>
        // a looser cap truncates fewer buckets and keeps more pairs
        assert(o1 >= o2 && c1 <= c2 && f1 <= f2 && r1 <= r2,
          s"bucket-cap trade not monotone: ${rows.toSeq}")
    }
    rows.foreach { case (_, _, c, t, f, rec) =>
      assert(f <= math.min(c, t) && rec >= 0.0 && rec <= 1.0)
    }
    // the loosest cap truncates nothing at fixture scale, so its
    // candidate set IS lshCandidatesFromSigs over the same 4×3 config —
    // the "lossless above the duplicate-group size" claim the card
    // stakes (and an oracle-symmetric truncation bug, where both Spark
    // and SQL drift the same way, cannot fake this cross-check)
    val (_, over64, cand64, _, _, _) = rows.last
    assert(over64 === 0L, s"cap=64 should not truncate at sf0.001: $over64")
    val sh = graft.text.TextOps.explodedShingles(
      graft.Tables.sharded(spark, sfDir, "documents"), 3).distinct()
    val uncapped = graft.text.TextOps.lshCandidatesFromSigs(
      graft.text.TextOps.minhashFromShingles(sh, 12), 12, 3).count()
    assert(cand64 === uncapped,
      s"cap=64 candidates $cand64 != uncapped $uncapped")
  }

  test("sim_ivfpq_refine: exact-cosine top-5 never scores below plain ADC") {
    import graft.similarity.VectorOps
    val emb = graft.Tables.sharded(spark, sfDir, "embeddings")
    val d = VectorOps.dotFn(emb)
    val q = VectorOps.quantized(emb).localCheckpoint()
    def exactSum(res: org.apache.spark.sql.DataFrame) = res
      .join(q.select(col("vec_id").as("probe_id"), col("q").as("pq"),
        col("n2").as("pn2")), "probe_id")
      .join(q.select(col("vec_id").as("neighbor_id"), col("q").as("cq"),
        col("n2").as("cn2")), "neighbor_id")
      .withColumn("cos", VectorOps.cosine(d(col("pq"), col("cq")),
        col("pn2"), col("cn2")))
      .groupBy(col("probe_id")).agg(sum(col("cos")).as("s"),
        count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val adc = exactSum(run("sim_ivfpq"))
    val ref = exactSum(run("sim_ivfpq_refine"))
    assert(ref.keySet === adc.keySet)
    ref.foreach { case (probe, (refSum, refK)) =>
      val (adcSum, adcK) = adc(probe)
      assert(refK === adcK) // both return exactly k rows per probe
      // refine picks the best k by exact cosine from an ADC shortlist
      // that contains plain IVFPQ's k — it can only improve the sum
      assert(refSum >= adcSum - 1e-9,
        s"refine degraded probe $probe: $refSum < $adcSum")
    }
  }

  test("mm_crossmodal: fused features reconstruct the asset arithmetic") {
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val res = run("mm_crossmodal").cache()
    assert(res.count() === nDocs)
    // two synthesized assets per doc: the full payload + an 80-char thumb
    assert(res.filter(col("n_assets") =!= 2).count() === 0)
    assert(res.filter(col("n_kinds") < 1 || col("n_kinds") > 2)
      .count() === 0)
    assert(res.filter(col("total_bytes") =!=
      col("n_chars") + least(col("n_chars"), lit(80L))).count() === 0)
    assert(res.filter(col("milli_bytes_per_token") < 0).count() === 0)
    res.unpersist()
  }
}
