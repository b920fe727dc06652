package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.similarity.VectorOps
import org.apache.spark.sql.functions._

/** Semantic invariants of the late-round-9 additions — properties the
  * DuckDB hash compare can't express: the profiling row must agree with
  * independently-computed per-column facts, the lateness table must be
  * bounded by the synthesized jitter and keyed off a genuinely bounded
  * watermark table, and radius search must be exactly the ≥τ slice of the
  * unbounded IVF ranking (same buckets, no survivor below τ, no
  * qualifying candidate missed).
  */
class Round9bOpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q25_profile: one row per column, facts match direct recomputation") {
    val prof = run("q25_profile").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(prof.size === 6)
    val li = Tables(spark, sfDir, "lineitem")
    val n = li.count()
    prof.values.foreach(r => assert(r.getAs[Long]("n_rows") === n))
    // direct single-column recomputation for a numeric, a string, and the
    // temporal column — three different profiling paths
    val qty = li.agg(countDistinct(col("l_quantity")),
      min(col("l_quantity")), max(col("l_quantity"))).head
    assert(prof("l_quantity").getAs[Long]("n_distinct") === qty.getLong(0))
    assert(prof("l_quantity").getAs[Double]("min_num") === qty.getDouble(1))
    assert(prof("l_quantity").getAs[Double]("max_num") === qty.getDouble(2))
    val rf = prof("l_returnflag")
    assert(rf.getAs[Long]("n_distinct") === 3) // A/N/R
    assert(rf.isNullAt(rf.fieldIndex("min_num")) &&
      rf.isNullAt(rf.fieldIndex("max_num"))) // strings have no numeric bounds
    val sd = prof("l_shipdate")
    val bounds = li.agg(
      min(unix_millis(col("l_shipdate").cast("timestamp"))),
      max(unix_millis(col("l_shipdate").cast("timestamp")))).head
    assert(sd.getAs[Double]("min_num") === bounds.getLong(0).toDouble)
    assert(sd.getAs[Double]("max_num") === bounds.getLong(1).toDouble)
    prof.values.foreach { r =>
      assert(r.getAs[Long]("n_nulls") === 0L) // fixture has no nulls
      assert(r.getAs[Long]("n_distinct") <= n)
    }
  }

  test("ev_lateness: lateness bounded by jitter, totals conserved") {
    val rows = run("ev_lateness").collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    rows.foreach { r =>
      val (nLate, max) = (r.getAs[Long]("n_late"), r.getAs[Long]("max_ms"))
      // an event can only trail the watermark by less than the max
      // synthesized transport delay (jitter < 30 min): the watermark is
      // the max event time ARRIVED in a strictly earlier minute bucket,
      // and that event arrived at most 30 min after its own event time
      assert(max < 1800000L, s"lateness $max exceeds the jitter bound")
      assert(nLate <= r.getAs[Long]("n_events"))
      // quartiles ordered, max dominates
      val (p25, p50, p75) = (r.getAs[Double]("p25_ms"),
        r.getAs[Double]("p50_ms"), r.getAs[Double]("p75_ms"))
      assert(p25 <= p50 && p50 <= p75 && p75 <= max.toDouble)
    }
    // the synthesized disorder must be non-trivial, else the table tests
    // nothing (guards the jitter/bucket constants against a future edit
    // that silently re-sorts the stream)
    assert(rows.map(_.getAs[Long]("n_late")).sum > 0)
  }

  test("dd_containment: verdicts cohere with dd_contamination's overlap") {
    val cont = run("dd_containment").collect()
      .map(r => r.getAs[Long]("eval_doc") -> r).toMap
    // per-mille and flag are pure functions of the counts
    cont.values.foreach { r =>
      val (n, shared) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"))
      assert(shared >= 0 && shared <= n)
      assert(r.getAs[Long]("containment_permille") === 1000 * shared / n)
      assert(r.getAs[Boolean]("contaminated") ===
        (r.getAs[Long]("containment_permille") >= 800))
    }
    // the planted cross-source duplicates must be flagged, and clean rows
    // must still be present (the audit-trail contract)
    assert(cont.values.count(_.getAs[Boolean]("contaminated")) > 0)
    assert(cont.values.count(!_.getAs[Boolean]("contaminated")) > 0)
    // shared-shingle counts must agree with dd_contamination wherever
    // overlap exists (that query omits zero-overlap docs)
    val overlap = run("dd_contamination").collect()
      .map(r => r.getAs[Long]("eval_doc") ->
        r.getAs[Long]("n_shared_shingles")).toMap
    overlap.foreach { case (doc, nsh) =>
      assert(cont(doc).getAs[Long]("n_shared") === nsh, s"doc $doc")
    }
    cont.foreach { case (doc, r) =>
      if (!overlap.contains(doc)) assert(r.getAs[Long]("n_shared") === 0L)
    }
  }

  test("mm_hybrid_neardup ≡ union of its two parent detectors") {
    import graft.similarity.VectorOps
    import graft.queries.{MultimodalQ => M, Similarity => S}
    val rows = run("mm_hybrid_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3))).toMap
    // a row exists only because SOME detector fired
    assert(rows.nonEmpty)
    rows.values.foreach { case (dh, cos) => assert(dh || cos) }
    // dhash slice ≡ the perceptual parent's pair set
    val dhashPairs = run("mm_dhash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.filter(_._2._1).keySet === dhashPairs)
    // cosine slice ≡ an independent recomputation of the semantic edges
    val assigned = VectorOps.assignIvf(
      Tables(spark, sfDir, "embeddings"), S.CentroidModulo)
      .select(col("centroid_id"), col("vec_id"), col("q"), col("n2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray,
        r.getLong(3)))
    val semExpected = (for {
      (ca, ia, qa, na) <- assigned; (cb, ib, qb, nb) <- assigned
      if ca == cb && ia < ib
      dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      if dot / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble) >=
        M.HybridTau
    } yield (ia, ib)).toSet
    assert(rows.filter(_._2._2).keySet === semExpected)
  }

  test("sim_range_search ≡ the ≥τ slice of the unbounded IVF ranking") {
    import graft.queries.{Similarity => S}
    val corpus = Tables(spark, sfDir, "embeddings")
    val got = run("sim_range_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // unbounded-k IVF search over the same probes = the full bucket
    // ranking; its ≥τ slice must be exactly the radius result
    val all = VectorOps.knnIvf(corpus, col("vec_id") < S.ProbeLimit,
        S.CentroidModulo, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine")))
    val expected = all.filter(_._3 >= S.RangeTau)
      .map(t => (t._1, t._2, t._3)).toSet
    assert(got === expected)
    assert(got.nonEmpty) // τ chosen so the fixture yields matches
    assert(got.forall(_._3 >= S.RangeTau))
  }
}
