package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9e time-series operators — the laws
  * behind the numbers the DuckDB hash gate only value-checks: the CUSUM
  * window identity must equal Page's sequential recursion, stickiness
  * must equal the naive sliding count-distinct it replaces, and the
  * backtest metrics must satisfy MAE ≥ |bias|.
  */
class Round9eOpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("ev_cusum: window closed form ≡ Page's sequential recursion, cusum ≥ 0") {
    val out = run("ev_cusum")
      .select("event_type", "day", "n", "mean_milli", "cusum")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._5 >= 0L))
    // sequential reference: S_t = max(0, S_{t-1} + (1000·n_t − mean))
    out.groupBy(_._1).foreach { case (_, rows) =>
      var s = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, mean, cusum) =>
        s = math.max(0L, s + (n * 1000L - mean))
        assert(s === cusum)
      }
    }
  }

  test("ev_stickiness: dau ≤ wau, and wau ≡ the naive sliding distinct") {
    val out = run("ev_stickiness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    assert(out.forall { case (_, dau, wau) => dau <= wau })
    val du = Tables.events(spark, sfDir)
      .select(expr("ems div 86400000").as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    out.foreach { case (day, dau, wau) =>
      val naiveWau = du.filter(p => p._1 >= day - 6 && p._1 <= day)
        .map(_._2).distinct.size.toLong
      val naiveDau = du.count(_._1 == day).toLong
      assert(dau === naiveDau)
      assert(wau === naiveWau)
    }
  }

  test("ev_forecast: MAE ≥ |bias|, days scored = days with a lag-7 base") {
    val out = run("ev_forecast").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mae = r.getAs[Long]("mae_milli")
      val bias = r.getAs[Double]("bias_milli")
      // triangle inequality over the same day set (milli rounding slack)
      assert(mae + 1 >= math.abs(bias))
    }
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val scorable = daily.groupBy(_._1).map { case (t, rows) =>
      val days = rows.map(_._2).toSet
      t -> days.count(d => days.contains(d - 7)).toLong
    }
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") ===
        scorable(r.getAs[String]("event_type")))
    }
  }

  test("winnowing: a shared run of k+w-1 tokens GUARANTEES a shared fingerprint") {
    import spark.implicits._
    // k+w-1 = 7 shared tokens embedded in otherwise-disjoint docs
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven twelve"),
      (3L, "totally disjoint content with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = Text.winnowedFps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val f3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((f1 & f2).nonEmpty) // the pigeonhole guarantee
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
    // identical docs select identical fingerprint sets
    val clone = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val cf = Text.winnowedFps(clone).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cf.filter(_._1 == 1L).map(_._2).toSet ===
      cf.filter(_._1 == 2L).map(_._2).toSet)
  }

  test("txt_winnowing / dd_winnowing_pairs: density and pair-count coherence") {
    val rep = run("txt_winnowing").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("n_fp"))).toMap
    assert(rep.nonEmpty)
    rep.values.foreach { case (nw, nfp) =>
      assert(nfp <= math.max(nw, 0L)) // can't select more mins than windows
      assert((nw == 0L) == (nfp == 0L) || nfp > 0L)
    }
    // a pair can't share more fingerprints than either member selected
    run("dd_winnowing_pairs").collect().foreach { r =>
      val n = r.getAs[Long]("n_shared")
      assert(n <= rep(r.getAs[Long]("doc_a"))._2)
      assert(n <= rep(r.getAs[Long]("doc_b"))._2)
    }
  }

  test("txt_langid_eval: confusion cells partition the corpus") {
    val out = run("txt_langid_eval").collect()
    assert(out.nonEmpty)
    val total = Tables.apply(spark, sfDir, "documents").count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val nLang = rows.head.getAs[Long]("n_lang")
      assert(rows.map(_.getAs[Long]("n")).sum === nLang)
      rows.foreach(r => assert(r.getAs[Long]("cell_pm") <= 1000L))
    }
  }

  test("txt_stopword_discovery: top-20 by df, bounded by the doc count") {
    val out = run("txt_stopword_discovery").collect()
    assert(out.length === 20)
    val nDocs = Tables.apply(spark, sfDir, "documents").count()
    out.foreach { r =>
      assert(r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
      assert(r.getAs[Long]("df_pm") <= 1000L)
    }
    // the discovered list must rediscover curated glue words (the
    // corpus is English-ish across langs, so 'the'/'of'-class terms
    // dominate df)
    val curated = Set("the", "a", "and", "of", "is", "to", "in",
      "der", "die", "und", "el", "la", "le", "les", "es", "et", "un",
      "das", "ein", "los", "y", "des")
    // (≥2: the sf0.001 fixture's ~31-token vocabulary crowds the top-20
    // with content words, but the glue words still surface)
    assert(out.map(_.getAs[String]("token")).count(curated) >= 2)
  }

  test("q27_bloom_join: the Bloom filter actually prunes the fact scan") {
    import graft.functions.BloomSketch
    val k = 4; val bits = 1 << 16
    val qual = Tables.apply(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
    val bl = udaf(new BloomSketch(bits / 64))
    val bloom = qual.select(BloomSketch.fastPositions(
        col("o_orderkey"), k, bits).as("pos"))
      .agg(bl(col("pos")).as("bloom"))
    val li = Tables.apply(spark, sfDir, "lineitem")
    val total = li.count()
    val kept = li.select(col("l_orderkey")).crossJoin(broadcast(bloom))
      .filter(BloomSketch.fastMightContain(col("bloom"),
        col("l_orderkey"), k, bits)).count()
    // one quarter of six years qualifies — the filter must cut the scan
    // to a small fraction (fp rate at this fill is well under 1%)
    assert(kept < total / 4)
    // and no false negatives: every truly-matching row survives
    val trueKeys = qual.select(col("o_orderkey")).distinct()
    val trueMatches = li.join(trueKeys,
      col("l_orderkey") === col("o_orderkey")).count()
    assert(kept >= trueMatches)
    // the query itself returns rows
    assert(run("q27_bloom_join").count() > 0)
  }

  test("dd_sentence_dedup: every doc reports, dup counts bounded, coherent with txt_sentences") {
    val out = run("dd_sentence_dedup").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sentences"), r.getAs[Long]("n_dup"),
         r.getAs[Long]("dup_pm"))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (n, d, pm) =>
      assert(d <= n)
      assert(pm === d * 1000 / n)
    }
    // sentence counts agree with txt_sentences' ledger (same split)
    run("txt_sentences").collect().foreach { r =>
      assert(out(r.getAs[Long]("doc_id"))._1 ===
        r.getAs[Long]("n_sentences"))
    }
  }

  test("ev_growth_accounting: dau = new + retained + resurrected; churn balances") {
    val out = run("ev_growth_accounting").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
        r.getAs[Long]("dau"), r.getAs[Long]("churned_from_prev")))
      .sortBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (_, nw, rt, rs, dau, _) =>
      assert(nw + rt + rs === dau) // the conservation law
    }
    // churn(d) = dau(d-1) − retained(d) whenever d-1 exists
    val dauBy = out.map(r => r._1 -> r._5).toMap
    out.foreach { case (d, _, rt, _, _, ch) =>
      assert(ch === dauBy.getOrElse(d - 1, 0L) - rt)
    }
    // total new across all days = distinct users
    assert(out.map(_._2).sum ===
      Tables.events(spark, sfDir).select("user_id").distinct().count())
  }

  test("ev_attribution_ushape: per-conversion credit ≤ 1000, totals account") {
    val out = run("ev_attribution_ushape").collect()
    assert(out.nonEmpty)
    // total credit ≤ 1000 per conversion (floor rounding only loses)
    val nConv = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val totalCredit = out.map(_.getAs[Long]("credit_milli")).sum
    assert(totalCredit <= nConv * 1000)
    assert(totalCredit > nConv * 900) // floors lose < 10% at journey sizes here
    assert(out.forall(_.getAs[Long]("n_touches") > 0L))
  }

  test("ev_dispersion: Fano ≥ 0 and matches the power-sum recompute") {
    val out = run("ev_dispersion").collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ems div 86400000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    out.foreach { r =>
      val f = r.getAs[Long]("fano_milli")
      assert(f >= 0L)
      val xs = daily.filter(_._1 == r.getAs[String]("event_type")).map(_._2)
      val n = xs.length.toLong; val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      assert(f === (n * sxx - sx * sx) * 1000 / (n * sx))
    }
  }

  test("dd_cluster_sizes: histogram docs sum to the corpus") {
    val out = run("dd_cluster_sizes").collect()
    assert(out.nonEmpty)
    val corpus = Tables.apply(spark, sfDir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === corpus)
    out.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 1L)
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
    // non-singleton mass agrees with dd_clusters' labeled doc count
    val labeled = run("dd_clusters").count()
    assert(out.filter(_.getAs[Long]("cluster_size") >= 2L)
      .map(_.getAs[Long]("n_docs")).sum === labeled)
  }

  test("sim_embedding_drift: cosine bounded, halves partition the corpus") {
    val out = run("sim_embedding_drift").collect()
    assert(out.nonEmpty)
    val corpus = Tables.apply(spark, sfDir, "embeddings").count()
    assert(out.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum
      === corpus)
    out.foreach { r =>
      val c = r.getAs[Double]("drift_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("sim_outliers: the rank threshold is a decile, n_below < k ≤ n") {
    val out = run("sim_outliers").collect()
    assert(out.nonEmpty)
    val corpus = Tables.apply(spark, sfDir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n")).sum === corpus)
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
      val below = r.getAs[Long]("n_below")
      assert(k === (n + 9) / 10)
      assert(below < k)   // strictly-below can't reach the rank-k member
      assert(r.getAs[Double]("tau") <= 1.0 + 1e-9)
    }
  }

  test("mm_scene_cuts: frame accounting and hamming bounds hold per asset") {
    val out = run("mm_scene_cuts").collect()
    assert(out.nonEmpty)
    val withFrames = Tables.apply(spark, sfDir, "documents")
      .filter(length(col("text")) >= 2 * 48).count()
    assert(out.length === withFrames.toInt) // every ≥2-frame asset reports
    out.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val cuts = r.getAs[Long]("n_cuts")
      val maxH = r.getAs[Long]("max_hamming")
      assert(nf >= 2L && nf <= 8L)
      assert(cuts <= nf - 1)                 // a cut sits between frames
      assert(maxH >= 0L && maxH <= 60L)      // 60-bit hash bound
      assert(r.getAs[Long]("mean_ham_milli") <= maxH * 1000)
    }
  }

  test("txt_heaps: the growth exponent is a sane sublinear fit") {
    val r = run("txt_heaps").collect().head
    assert(r.getAs[Long]("n_points") >= 5L)
    val beta = r.getAs[Double]("beta_e6")
    // vocabulary can't grow faster than tokens (β ≤ 1); the sf0.001
    // fixture's ~31-token vocabulary saturates at the first checkpoint,
    // so β = 0 exactly there — the flat-growth verdict IS the signal a
    // curator reads off a templated corpus (the txt_zipf −0.18 quirk)
    assert(beta >= 0.0 && beta <= 1.0 + 1e-6)
  }

  test("txt_bigram_lm: surprisal positive, bounded by the smoothed worst case") {
    val out = run("txt_bigram_lm").collect()
    assert(out.nonEmpty)
    val vocab = Tables.apply(spark, sfDir, "documents")
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
      .distinct().count()
    val totTok = Tables.apply(spark, sfDir, "documents")
      .agg(sum(size(graft.text.TextOps.tokens(col("text")))))
      .collect().head.getLong(0).toDouble
    val worst = math.log(totTok + vocab) * 1e6 + 1 // c2=0 never joins ⇒ c2≥1
    out.foreach { r =>
      val sp = r.getAs[Long]("surprisal_micro")
      assert(sp >= 0L)
      assert(sp <= worst.toLong)
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }

  test("ev_gini: histogram decomposition ≡ the sorted-rank definition") {
    val r = run("ev_gini").collect().head
    val gini = r.getAs[Long]("gini_milli")
    val top = r.getAs[Long]("top10_share_milli")
    assert(gini >= 0L && gini < 1000L)
    // naive driver-side recompute from the textbook sorted-rank formula
    val xs = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = xs.length.toLong
    val t = xs.sum
    val w = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    assert(gini === (2 * w - (n + 1) * t) * 1000 / (n * t))
    val k = (n / 10).toInt
    val eTop = xs.reverse.take(k).sum
    assert(top === eTop * 1000 / t)
    assert(r.getAs[Long]("n_users") === n)
    assert(r.getAs[Long]("total_events") === t)
  }

  test("ev_survival: KM laws — risk set shrinks, log-survival never rises") {
    val out = run("ev_survival").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d"), r.getAs[Long]("c"),
        r.getAs[Long]("log_s_micro")))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val users = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(out.head._2 === users)          // everyone at risk at first t
    assert(out.map(r => r._3 + r._4).sum === users) // exits partition users
    out.sliding(2).filter(_.length == 2).foreach { w =>
      val (_, n1, d1, c1, l1) = w(0)
      val (_, n2, _, _, l2) = w(1)
      assert(n2 === n1 - d1 - c1)          // the risk-set recurrence
      assert(l2 <= l1)                     // survival is nonincreasing
    }
    assert(out.forall(_._5 <= 0L))
  }

  test("txt_drift_psi: PSI ≥ 0 and the halves partition the corpus") {
    val r = run("txt_drift_psi").collect().head
    val psi = r.getAs[Double]("psi_micro")
    assert(psi >= -1.0) // each term (p−q)·ln(p/q) ≥ 0 up to quantization
    val total = Tables.apply(spark, sfDir, "documents").count()
    assert(r.getAs[Long]("n_old") + r.getAs[Long]("n_new") === total)
    // parity halves of one corpus must NOT alarm
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("ev_user_entropy: 0 for single-type users, ≤ ln(n_types), exact recompute") {
    val out = run("ev_user_entropy").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val h = r.getAs[Long]("entropy_micro")
      val k = r.getAs[Long]("n_types")
      assert(h >= 0L)
      if (k == 1L) assert(h === 0L)
      // H ≤ ln k (micro units, quantization slack)
      assert(h <= math.round(math.log(k.toDouble) * 1e6) + k)
    }
    // independent driver-side recompute of one user's entropy
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_t")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val uid = counts.groupBy(_._1).maxBy(_._2.length)._1
    val ns = counts.filter(_._1 == uid).map(_._2)
    val n = ns.sum
    val qn = math.round(math.log(n.toDouble) * 1e6)
    val s = ns.map(nt => nt * (qn - math.round(math.log(nt.toDouble) * 1e6))).sum
    val expect = s / n
    assert(out.find(_.getAs[Long]("user_id") == uid).get
      .getAs[Long]("entropy_micro") === expect)
  }

  test("sim_kmeans_elbow: nested seed prefixes make inertia monotone in k") {
    val out = run("sim_kmeans_elbow").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("inertia"), r.getAs[Long]("n_vectors")))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(2L, 4L, 8L, 16L))
    // a larger prefix can only lower every vector's min distance
    out.sliding(2).foreach { case Array((_, (i1, _)), (_, (i2, _))) =>
      assert(i2 <= i1)
    }
    assert(out.map(_._2._2).distinct.length === 1) // same corpus per row
    assert(out.forall(_._2._1 > 0L))
  }

  test("sim_purity: buckets partition the corpus and purity is a valid share") {
    val out = run("sim_purity").collect()
    assert(out.nonEmpty)
    val corpus = Tables.apply(spark, sfDir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n")).sum === corpus)
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val top = r.getAs[Long]("n_top")
      val p = r.getAs[Long]("purity_milli")
      assert(top >= 1L && top <= n)
      assert(p === top * 1000 / n)
      assert(p <= 1000L)
    }
  }

  test("txt_js_divergence: bounded by [0, ln 2] and defined for every lang pair") {
    val out = run("txt_js_divergence").collect()
    assert(out.length === 10) // C(5 langs, 2) ordered pairs
    out.foreach { r =>
      val js = r.getAs[Double]("js_micro")
      assert(js >= -1.0)           // micro-quantization slack below 0
      assert(js <= 693148.0)       // ln 2 in micro units (+1 slack)
      assert(r.getAs[Long]("ma") <= r.getAs[Long]("ta"))
      assert(r.getAs[Long]("mb") <= r.getAs[Long]("tb"))
    }
  }
}
