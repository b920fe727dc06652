package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 operator invariants on the sf0.001 fixture. */
class Round14OpsInvariantsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  test("dd_clusters_converged: every 16-chain fully merges to its min, " +
      "and the convergence gate really gated") {
    val labels = run("dd_clusters_converged")
      .as[(Long, Long)].collect().toMap
    val n = graft.Tables(spark, sfDir, "documents").count()
    // every doc participates (no isolated docs at this fixture size)
    assert(labels.size.toLong === n)
    // closed form: cluster = chain start
    labels.foreach { case (d, c) =>
      assert(c === (d / 16) * 16, s"doc $d labeled $c")
    }
    // the diameter really exceeds dd_clusters' fixed 4 rounds — the
    // variant exists because the bounded form WOULD split these chains
    val bounded = graft.ops.Components.labelUntilConverged(
      graft.Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 1).as("doc_b"))
        .filter(col("doc_a") % 16 =!= 15 && col("doc_b") < n),
      maxRounds = 2)
    assert(!bounded.converged, "2 rounds cannot close a 16-chain; if " +
      "this converged the planted corpus stopped testing anything")
  }

  test("txt_bpe_batch: corpus stats match txt_bpe_encode; compression " +
      "is real and bounded") {
    val batch = run("txt_bpe_batch")
      .select("doc_id", "n_tokens", "raw_chars", "enc_symbols",
        "saved_milli")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val enc = run("txt_bpe_encode")
      .select("doc_id", "n_tokens", "raw_chars")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // the pre-merge corpus view is IDENTICAL (same tokenizer, same
    // docs) — only the merge schedule differs
    assert(batch.map(t => (t._1, t._2, t._3)).toSeq === enc.toSeq)
    batch.foreach { case (d, _, raw, encLen, saved) =>
      assert(encLen >= 1 && encLen <= raw, s"doc $d: $encLen vs $raw")
      assert(saved >= 0 && saved < 1000, s"doc $d: saved_milli $saved")
    }
    // 12 merges must actually bite somewhere: corpus-level savings > 0
    assert(batch.map(t => t._3 - t._4).sum > 0, "no merge ever applied")
  }

  test("er_report_capped vs er_report: cap only removes work, never " +
      "invents it") {
    val capped = run("er_report_capped").collect().head
    val full = run("er_report").collect().head
    for (c <- Seq("n_candidates", "n_matches", "n_entities_multi",
        "n_linked_records", "largest_entity"))
      assert(capped.getAs[Long](c) <= full.getAs[Long](c), c)
    assert(capped.getAs[Long]("n_singletons") >=
      full.getAs[Long]("n_singletons"))
  }

  test("dq_skew: conservation, bounds, and the fixture's known shape") {
    val rows = run("dq_skew")
      .select("relation", "n_rows", "n_keys", "top1_n", "top1_pm",
        "skew_x_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size === 7)
    // conservation: n_rows is the table's row count
    for ((t, rel) <- Seq("orders" -> "orders.o_custkey",
        "lineitem" -> "lineitem.l_orderkey",
        "events" -> "events.user_id",
        "documents" -> "documents.source"))
      assert(rows(rel)._2 === graft.Tables(spark, sfDir, t).count(), rel)
    rows.values.foreach { r =>
      assert(r._3 >= 1 && r._4 >= 1 && r._4 <= r._2, r._1)
      assert(r._5 >= 1 && r._5 <= 1000, s"${r._1} top1_pm ${r._5}")
      // skew multiple is >= ~1x by construction (top >= mean)
      assert(r._6 >= 999, s"${r._1} skew_x_milli ${r._6}")
    }
    // known fixture shape: event_type has few, roughly-balanced
    // categories (each key owns a big share but the skew MULTIPLE is
    // near 1 — the card distinguishes "few keys" from "hot key"),
    // l_orderkey is near-unique (cold by design)
    assert(rows("events.event_type")._3 < 20)
    assert(rows("events.event_type")._5 > 100) // big per-key share
    assert(rows("lineitem.l_orderkey")._5 < 50)
  }

  test("labelUntilConverged scale smoke: 1000 planted 100-hop chains " +
      "(100k nodes) close in O(log d) rounds with exact labels") {
    val edges = spark.range(0, 100000)
      .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      .filter(col("doc_a") % 100 =!= 99)
    val res = graft.ops.Components.labelUntilConverged(edges,
      maxRounds = 14)
    assert(res.converged, s"no fixpoint in ${res.rounds} rounds")
    // diameter 99; pointer doubling must close far under it
    assert(res.rounds <= 11, s"${res.rounds} rounds for diameter 99")
    val bad = res.labels
      .filter(col("cluster_id") =!= (col("doc_id") / 100).cast("long")
        * 100)
      .count()
    assert(bad === 0L, s"$bad mislabeled nodes")
    assert(res.labels.count() === 100000L)
  }
}
