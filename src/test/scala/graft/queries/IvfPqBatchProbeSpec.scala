package graft.queries

import graft.SparkSpec
import graft.similarity.VectorOps
import org.apache.spark.sql.functions._

/** The broadcast-probe ADC path (Similarity.ivfPqAdc / ivfPqRefine) must
  * hold for probe batches far beyond the query default: the whole point of
  * replacing the literal probe-struct explode with a broadcast join is
  * that the PLAN no longer grows with |probes|. Drive 10× PqProbeN probes
  * through the production lineage and check it against an independent
  * recomputation of the ADC distances (per-row map lookups recomputed
  * driver-side from the collected candidates), plus the plan shape.
  */
class IvfPqBatchProbeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val BatchN = Similarity.PqProbeN * 10

  test("ivfPqAdc at 10x PqProbeN: ADC distances match a per-pair recompute") {
    val (adc, probeRel) = Similarity.ivfPqAdc(spark, sfDir, BatchN,
      keepVec = false)
    val got = adc.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty, "no ADC candidates at 10x probes")
    assert(got.keys.map(_._1).toSet.size == BatchN,
      "every probe should find same-list candidates on this fixture")

    // independent truth: re-derive each candidate's codes and each probe's
    // distance maps from first principles (quantized fixture vectors +
    // the same md5 codebook seeding), then compare pairwise sums
    val q = VectorOps.quantized(graft.Tables(spark, sfDir, "embeddings"))
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val probeCent = probeRel.select("probe_id", "pcent").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dts = probeRel.select("probe_id", "dts").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Map[Long, Long]](1).map(_.toSeq.toMap).toArray).toMap
    val cents = VectorOps.assignIvf(
        graft.Tables(spark, sfDir, "embeddings"), Similarity.CentroidModulo)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val subDim = 8
    val codebook = dts(probeCent.keys.head) // any probe's maps share key set
      .head.keys.toSeq.sorted
    def encode(v: Array[Long], m: Int): Long = {
      // argmin over codebook subvectors, ties to smallest cid — mirror of
      // pqEncoded's (dist, cid) struct minimum
      codebook.map { cid =>
        val c = q(cid).slice(m * subDim, (m + 1) * subDim)
        val s = v.slice(m * subDim, (m + 1) * subDim)
        (s.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }.min
    }._2
    got.foreach { case ((pid, vid), dist) =>
      assert(cents(vid) == probeCent(pid),
        s"candidate $vid not in probe $pid's inverted list")
      val expect = (0 until q(vid).length / subDim).map { m =>
        dts(pid)(m)(encode(q(vid), m))
      }.sum
      assert(dist == expect, s"ADC mismatch for probe $pid vec $vid")
    }
  }

  test("ivfPqRefine at 10x PqProbeN: shortlist reranked by exact cosine") {
    val out = Similarity.ivfPqRefine(spark, sfDir, BatchN)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.keys.size == BatchN)
    byProbe.values.foreach { rs =>
      assert(rs.length <= 5)
      val ranked = rs.sortBy(_.getInt(4))
      // rank order must agree with (cosine desc, vec_id asc)
      val resorted = rs.sortBy(r => (-r.getDouble(3), r.getLong(1)))
      assert(ranked.map(_.getLong(1)).toSeq == resorted.map(_.getLong(1)).toSeq)
    }
  }

  test("the ADC probe join is a BroadcastHashJoin, not a literal chain") {
    val (adc, _) = Similarity.ivfPqAdc(spark, sfDir, BatchN, keepVec = false)
    val plan = adc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast probe join in:\n$plan")
    // the old shape exploded |probes| literal structs; a 40-probe batch
    // through THAT path would blow the plan up — assert the explode is gone
    assert(!plan.contains("Generate explode"),
      s"probe fan-out should be a join, not an explode:\n$plan")
  }

  test("default-probe queries keep their oracle-checked output shape") {
    val ivfpq = Similarity.qs.find(_.name == "sim_ivfpq").get
      .fn(spark, sfDir)
    assert(ivfpq.columns.toSeq ==
      Seq("probe_id", "neighbor_id", "adc_dist", "rank"))
    val refine = Similarity.qs.find(_.name == "sim_ivfpq_refine").get
      .fn(spark, sfDir)
    assert(refine.columns.toSeq ==
      Seq("probe_id", "neighbor_id", "adc_dist", "cosine", "rank"))
  }
}
