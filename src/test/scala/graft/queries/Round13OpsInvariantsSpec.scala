package graft.queries

import graft.SparkSpec
import graft.pipeline.PngCodec
import org.apache.spark.sql.functions._

/** Round-13 operator invariants on the sf0.001 fixture. */
class Round13OpsInvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("mm_image_neardup: every brightness twin recovered at hamming 0, nothing else") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id").as[Long].collect().toSet
    val pairs = run("mm_image_neardup")
      .select("rec_a", "rec_b", "hamming")
      .as[(Long, Long, Long)].collect()
    // recall: the +10-brightness re-upload of every document, whose PNG
    // bytes (and DEFLATE stream) differ completely, fingerprints
    // identically — dHash sees gradients, not levels
    docs.foreach { d =>
      assert(pairs.exists(p => p._1 == d * 2 && p._2 == d * 2 + 1 &&
        p._3 == 0L), s"planted brightness twin of doc $d missing")
    }
    // precision: md5-mixed base pixels leave no residue-class cliques
    // (the first cut's modular formula emitted 280k pairs at sf0.1)
    assert(pairs.length === docs.size, s"${pairs.length} pairs for ${docs.size} docs")
  }

  test("the planted twin's container bytes really differ (the dedup is not byte equality)") {
    val base = Array.tabulate(72)(i => (((i * 37) % 200) * 65793))
    val shifted = base.map(_ + 10 * 65793)
    val (b0, b1) = (PngCodec.encode(9, 8, base), PngCodec.encode(9, 8, shifted))
    assert(!b0.sameElements(b1))
    // and the decoded pixels differ too — the match is fingerprint-level
    assert(PngCodec.decode(b0)._3.toSeq !== PngCodec.decode(b1)._3.toSeq)
  }

  test("sim_mrl_curve: recall is monotone in prefix dim; full dim is exact") {
    val rows = run("sim_mrl_curve")
      .select("dim", "n_truth", "n_hit", "recall_pm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Similarity.MrlDims.map(_.toLong))
    // a longer prefix can only see MORE of the true geometry
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._4, s"recall dropped ${lo._1}→${hi._1}")
    }
    // the full-dimension row IS the ground truth: recall exactly 1
    assert(rows.last._4 === 1000L)
    assert(rows.last._2 === rows.last._3)
  }

  test("sim_rank_eval: metric bounds and internal consistency") {
    val rows = run("sim_rank_eval")
      .select("probe_id", "n_rel_corpus", "n_rel_found", "first_rel_rank",
        "mrr_micro", "dcg_micro", "idcg_micro", "ndcg_pm")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, relC, relF, fr, mrr, dcg, idcg, ndcg) =>
      assert(relF <= relC, s"probe $p found more relevant than exist")
      assert(ndcg >= 0L && ndcg <= 1000L, s"probe $p ndcg $ndcg")
      assert(mrr >= 0L && mrr <= 1000000L, s"probe $p mrr $mrr")
      assert(dcg <= idcg, s"probe $p dcg $dcg > idcg $idcg")
      if (relF == 0L) {
        assert(fr === 0L && mrr === 0L && dcg === 0L && ndcg === 0L)
      } else {
        assert(fr >= 1L && mrr === 1000000L / fr)
      }
    }
  }

  test("mm_image_features: decoded-pixel features match a driver-side recompute") {
    val rows = run("mm_image_features")
      .select("doc_id", "sum_r", "sum_g", "sum_b", "max_luma_pm",
        "edge_energy")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // recompute one doc's card from the generator formula, container-free
    val (docId, sr, sg, sb, ml, ee) = rows.minBy(_._1)
    val px = Array.tabulate(96) { i =>
      val r = (docId * 37 + i.toLong * i * 11 + 3) % 256
      val g = (docId * (i * 13 + 7)) % 256
      val b = (docId * 101 + i * 29) % 256
      (r, g, b)
    }
    assert(sr === px.map(_._1).sum)
    assert(sg === px.map(_._2).sum)
    assert(sb === px.map(_._3).sum)
    assert(ml === px.map(p => 299 * p._1 + 587 * p._2 + 114 * p._3).max)
    val edges = (1 until 96).map(i =>
      if (i % 12 == 0) 0L else math.abs(px(i)._1 - px(i - 1)._1)).sum
    assert(ee === edges)
  }
}
