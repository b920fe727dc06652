package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9d additions (skyline, MAD anomaly
  * detection, session co-occurrence, the data-quality gate, bitext
  * mining) — properties the DuckDB hash compare can't express: the
  * skyline must equal its quadratic definition, MAD flags must match an
  * independent recomputation, the DQ gate must actually fail on doctored
  * data, and mined bitext pairs must form a mutual one-to-one matching.
  */
class Round9dOpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q26_skyline equals the quadratic NOT-EXISTS definition") {
    val parts = Tables(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(x: (Long, Double, Int)) = parts.exists { o =>
      o._2 <= x._2 && o._3 >= x._3 && (o._2 < x._2 || o._3 > x._3)
    }
    val expect = parts.filterNot(dominated).map(_._1).toSet
    val got = run("q26_skyline").collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("ev_anomaly_mad flags match driver-side median/MAD recomputation") {
    val rows = run("ev_anomaly_mad").collect()
    val e = Tables.events(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n")).sum === e.count())
    val daily = e.groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === daily.length)
    // interpolated median, the percentile/quantile_cont definition
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    daily.groupBy(_._1).foreach { case (tpe, ds) =>
      val med2 = median(ds.map(d => 2.0 * d._3))
      val devs = ds.map(d => math.abs(2.0 * d._3 - med2))
      val mad4 = 2 * median(devs)
      ds.foreach { case (_, day, n) =>
        val r = rows.find(x => x.getAs[String]("event_type") == tpe &&
          x.getAs[Long]("day") == day).get
        assert(r.getAs[Double]("med2") === med2)
        assert(r.getAs[Double]("mad4") === mad4)
        val expectFlag =
          math.round(2 * math.abs(2.0 * n - med2)) > 3 * math.round(mad4)
        assert(r.getAs[Boolean]("is_anomaly") === expectFlag)
      }
    }
  }

  test("ev_cooccurrence: pair counts bounded, lift formula exact") {
    val rows = run("ev_cooccurrence").collect()
    assert(rows.nonEmpty)
    val nSessions = rows.head.getAs[Long]("n_sessions")
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab >= 1 && nab <= math.min(na, nb))
      assert(na <= nSessions && nb <= nSessions)
      assert(r.getAs[Long]("n_sessions") === nSessions)
      assert(r.getAs[Long]("lift_milli") ===
        (1000L * nab * nSessions) / (na * nb))
    }
    // session universe agrees with ev_sessionize's session count
    assert(nSessions ===
      SparkEntry.queries("ev_sessionize")(spark, sfDir).count())
  }

  test("dq_expectations passes on the fixture and fails on doctored data") {
    val clean = run("dq_expectations").collect()
    assert(clean.length === 1)
    val c = clean.head
    Seq("n_null_quantity", "n_range_quantity", "n_range_discount",
      "n_range_shipdate", "n_bad_returnflag", "n_dup_keys", "n_orphans")
      .foreach(f => assert(c.getAs[Long](f) === 0L, f))
    assert(c.getAs[Boolean]("passed"))

    // doctored lake: duplicate one order key, orphan one lineitem, break
    // one range — the gate must count each violation class
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    val li = Tables(spark, sfDir, "lineitem")
    val bad = li.limit(1)
      .withColumn("l_orderkey", lit(-999L)) // orphan key
      .withColumn("l_quantity", lit(999.0)) // out of range
    li.unionByName(bad).write.parquet(s"$dir/lineitem.parquet")
    val ord = Tables(spark, sfDir, "orders")
    ord.unionByName(ord.limit(1)) // duplicate PK
      .write.parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("dq_expectations")(spark, dir).collect().head
    assert(!r.getAs[Boolean]("passed"))
    assert(r.getAs[Long]("n_dup_keys") === 1L)
    assert(r.getAs[Long]("n_orphans") === 1L)
    assert(r.getAs[Long]("n_range_quantity") === 1L)
  }

  test("ev_markov2 composes ev_transitions' 1-step milli-probabilities") {
    val p1 = SparkEntry.queries("ev_transitions")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("prev"), r.getAs[String]("next")) ->
        r.getAs[Long]("p_milli")).toMap
    val rows = run("ev_markov2").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, c) = (r.getAs[String]("prev"), r.getAs[String]("next"))
      val expect = p1.keys.map(_._1).toSet.toSeq.flatMap { mid: String =>
        for (pa <- p1.get((a, mid)); pb <- p1.get((mid, c))) yield pa * pb
      }.sum
      assert(r.getAs[Long]("p2_micro") === expect, s"$a->$c")
    }
    // one predicted destination per origin; row mass ≤ 1 (floor only loses)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (prev, g) =>
      assert(g.count(_.getAs[Boolean]("is_top")) === 1, prev)
      assert(g.map(_.getAs[Long]("p2_micro")).sum <= 1000000L, prev)
    }
  }

  test("sim_mmr: k contiguous steps per probe, step1 is the relevance argmax") {
    val rows = run("sim_mmr").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, g) =>
      val steps = g.map(_.getAs[Long]("step")).sorted
      assert(steps === (1L to steps.length).toSeq, s"probe $p")
      val ids = g.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, s"probe $p")
      val byStep = g.map(r => r.getAs[Long]("step") -> r).toMap
      val s1 = byStep(1L)
      assert(s1.getAs[Long]("mmr_fx") ===
        graft.queries.Similarity.MmrLambdaMilli * s1.getAs[Long]("rel_fx"))
      // step1 is the pure-relevance argmax of everything ever selected
      g.foreach(r =>
        assert(r.getAs[Long]("rel_fx") <= s1.getAs[Long]("rel_fx")))
      // later steps pay a redundancy penalty: mmr ≤ λ·rel
      g.filter(_.getAs[Long]("step") > 1L).foreach(r =>
        assert(r.getAs[Long]("mmr_fx") <=
          graft.queries.Similarity.MmrLambdaMilli * r.getAs[Long]("rel_fx")))
    }
  }

  test("operating curves: cumulative sums exact, production cut consistent") {
    val mm = run("mm_hamming_curve").collect()
      .map(r => (r.getAs[Long]("hamming"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"))).sortBy(_._1)
    assert(mm.nonEmpty)
    var acc = 0L
    mm.foreach { case (h, np, cp) =>
      acc += np
      assert(cp === acc, s"hamming $h")
      assert(h >= 0 && h <= 60)
    }
    // the curve at the production threshold equals the near-dup query
    val cut = mm.filter(_._1 <= MultimodalQ.DhashMaxHamming).map(_._2).sum
    assert(cut === run("mm_dhash_neardup").count())

    val st = run("sim_tau_curve").collect()
      .map(r => (r.getAs[Long]("band"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"))).sortBy(-_._1)
    assert(st.nonEmpty)
    var acc2 = 0L
    st.foreach { case (b, np, cp) =>
      acc2 += np
      assert(cp === acc2, s"band $b")
      assert(b >= -10 && b <= 10)
    }

    val jc = run("dd_jaccard_curve").collect()
      .map(r => (r.getAs[Long]("band"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"))).sortBy(-_._1)
    assert(jc.nonEmpty)
    var acc3 = 0L
    jc.foreach { case (b, np, cp) =>
      acc3 += np
      assert(cp === acc3, s"band $b")
      assert(b >= 0 && b <= 10)
    }
    // the curve's total equals the parent rerank's pair count
    assert(acc3 === run("dd_jaccard").count())
  }

  test("txt_zipf: integer sums self-consistent, slope in the natural range") {
    val r = run("txt_zipf").collect().head
    val distinctTerms = Tables(spark, sfDir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
      .select(col("t")).distinct().count()
    assert(r.getAs[Long]("n") ===
      math.min(graft.queries.Text.ZipfTopN.toLong, distinctTerms))
    val slope = r.getAs[Double]("slope_e6")
    // natural-language Zipf slope is around −1; the synthetic sf0.001
    // corpus (31 distinct terms) is much flatter, but the fit must
    // still be decreasing and sane
    assert(slope < -0.05 && slope > -3.0, s"slope $slope")
    // denominator positive (ranks are distinct)
    assert(r.getAs[Long]("n") * r.getAs[Long]("sxx") >
      r.getAs[Long]("sx") * r.getAs[Long]("sx"))
  }

  test("ev_target_encode: out-of-fold means exclude the fold, counts add up") {
    val rows = run("ev_target_encode").collect()
    val e = Tables.events(spark, sfDir)
    // fold partition is exhaustive: per-type n_f sums to the type's count
    val typeCounts = e.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, g) =>
      assert(g.map(_.getAs[Long]("n_f")).sum === typeCounts(t), t)
      g.foreach(r => assert(r.getAs[Long]("n_f") + r.getAs[Long]("n_oof") ===
        typeCounts(t)))
    }
    // leakage check, recomputed independently for one cell: the oof mean
    // of (type, fold) must equal the mean over all OTHER folds' rows
    val probe = rows.head
    val (t0, f0) = (probe.getAs[String]("event_type"),
      probe.getAs[Long]("fold"))
    val others = e
      .withColumn("fold", pmod(conv(substring(md5(concat(lit("fold|"),
        col("user_id").cast("string")).cast("binary")), 1, 15), 16, 10)
        .cast("long"), lit(5L)))
      .filter(col("event_type") === t0 && col("fold") =!= f0)
      .agg(sum(round(col("value") * 1000000).cast("long")).as("s"),
        count(lit(1)).as("n")).head
    val expect = others.getLong(0).toDouble / others.getLong(1) / 1000000.0
    assert(probe.getAs[Double]("oof_mean") === expect)
  }

  test("sim_negatives: outside the probe's bucket, hard-cut ordering holds") {
    val rows = run("sim_negatives").collect()
    val asg = graft.similarity.VectorOps.assignIvf(
      Tables(spark, sfDir, "embeddings"), 25)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, g) =>
      // never a positive candidate: negatives live in OTHER buckets
      g.foreach(r =>
        assert(asg(r.getAs[Long]("neg_id")) !== asg(p), s"probe $p"))
      // contiguous ranks, cosine non-increasing along them
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ===
        (1 to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Double]("cosine") >=
          b.getAs[Double]("cosine"))
        case _ => ()
      }
      assert(g.length === graft.queries.Similarity.NegK)
    }
  }

  test("ev_rfm: every user scored 1-4 per axis, labels consistent") {
    val rows = run("ev_rfm").collect()
    val e = Tables.events(spark, sfDir)
    assert(rows.length === e.select(col("user_id")).distinct().count())
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { f =>
        val v = r.getAs[Long](f)
        assert(v >= 1 && v <= 4, s"$f=$v")
      }
      val (rs, fs) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"))
      val want =
        if (rs >= 3 && fs >= 3) "champion"
        else if (rs >= 3) "recent"
        else if (fs >= 3) "loyal_lapsed"
        else "hibernating"
      assert(r.getAs[String]("segment") === want)
    }
    // quartile thresholds split roughly evenly: every score value occurs
    assert(rows.map(_.getAs[Long]("r_score")).distinct.length >= 2)
  }

  test("txt_readability: per-lang bounds bracket the mean") {
    val rows = run("txt_readability").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Double]("min_flesch"),
        r.getAs[Double]("mean_flesch"), r.getAs[Double]("max_flesch"))
      assert(mn <= mean + 1e-6 && mean <= mx + 1e-6, s"$mn $mean $mx")
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("txt_token_budget: allocation conserves the budget, epochs exact") {
    val rows = run("txt_token_budget").collect()
    assert(rows.nonEmpty)
    val weights = rows.map(_.getAs[Double]("weight"))
    assert(math.abs(weights.sum - 1.0) < 1e-9)
    val alloc = rows.map(_.getAs[Long]("allocated_tokens"))
    // floor per source: never over budget, within |sources| of it
    assert(alloc.sum <= graft.queries.Text.TokenBudget)
    assert(alloc.sum > graft.queries.Text.TokenBudget - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("epochs_milli") ===
        1000L * r.getAs[Long]("allocated_tokens") /
          r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_tokens") > 0)
    }
  }

  test("mm_dhash_robustness: one-char retouch flips at most two bits") {
    val r = run("mm_dhash_robustness").collect().head
    // exactly one sampled thumb position (index 10 = position i=6 on the
    // 96/60 grid) changes, so only its two neighboring compare-bits can
    // flip — a closed-form ceiling on the drift
    assert(r.getAs[Long]("max_hamming") <= 2L)
    assert(r.getAs[Long]("recall_milli") === 1000L)
    assert(r.getAs[Long]("n_assets") > 0)
    assert(r.getAs[Long]("n_within_tau") === r.getAs[Long]("n_assets"))
  }

  test("txt_keyphrase: no stopword inside a phrase, scores positive") {
    val rows = run("txt_keyphrase").collect()
    assert(rows.nonEmpty && rows.length <= graft.queries.Text.KeyphraseTopN)
    val stop = graft.queries.Text.KeyphraseStop.toSet
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.nonEmpty && words.forall(w => !stop(w)),
        r.getAs[String]("phrase"))
      assert(r.getAs[Long]("score_milli") > 0)
      assert(r.getAs[Long]("n_occur") >= 1)
    }
    // ranking is by score desc then phrase asc
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Long]("score_milli"), b.getAs[Long]("score_milli"))
        assert(sa > sb || (sa == sb &&
          a.getAs[String]("phrase") < b.getAs[String]("phrase")))
      case _ => ()
    }
  }

  test("sim_bitext: mined pairs are a mutual one-to-one cross-side matching") {
    val rows = run("sim_bitext").collect()
    assert(rows.nonEmpty)
    val srcs = rows.map(_.getAs[Long]("src_id"))
    val tgts = rows.map(_.getAs[Long]("tgt_id"))
    // mutual argmax ⇒ each vector appears in at most one mined pair
    assert(srcs.distinct.length === srcs.length)
    assert(tgts.distinct.length === tgts.length)
    val labels = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("src_id")) < 5)
      assert(labels(r.getAs[Long]("tgt_id")) >= 5)
      assert(r.getAs[Long]("cos_fx") > 0)
      assert(r.getAs[Long]("margin_milli") > 0)
    }
  }
}
