package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-9c additions (KMV set algebra, the
  * moments-sketch quantiles, RAG chunking, inverted-index build) —
  * properties the DuckDB hash compare can't express: sketch estimates
  * must track their exact counterparts within the sketch's accuracy
  * class, chunk geometry must tile the token stream, and the index's
  * statistics must agree with independent recomputation.
  */
class Round9cOpsInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("txt_kmv_setops: set identities hold, estimates track exact truth") {
    val rows = run("txt_kmv_setops").collect()
    assert(rows.length === 10) // C(5 langs, 2)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val inter = r.getAs[Long]("n_inter_exact")
      val union = r.getAs[Long]("n_union_exact")
      assert(inter >= 0 && inter <= math.min(na, nb))
      assert(union === na + nb - inter) // inclusion–exclusion
      assert(union >= math.max(na, nb))
      val j = r.getAs[Double]("est_jaccard")
      assert(j >= 0.0 && j <= 1.0)
      // KMV with k=64 has ~1/sqrt(64) relative error; 3 sigma bound
      val eu = r.getAs[Double]("est_union")
      assert(math.abs(eu - union) / union < 0.4,
        s"union estimate $eu too far from exact $union")
      val ei = r.getAs[Double]("est_inter")
      assert(ei >= 0.0)
      assert(ei === j * eu)
    }
  }

  test("ev_moments_quantile: moments match direct stats, estimates bracket") {
    val rows = run("ev_moments_quantile").collect()
    val e = Tables.events(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n")).sum === e.count())
    // direct mean/std for one group, independent of the fixed-point path
    val direct = e.filter(col("event_type") === "click")
      .agg(avg(col("value")), stddev_pop(col("value"))).head
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(math.abs(click.getAs[Double]("mean") - direct.getDouble(0)) < 1e-5)
    assert(math.abs(click.getAs[Double]("std") - direct.getDouble(1)) < 1e-4)
    rows.foreach { r =>
      val (q50x, q95x) = (r.getAs[Double]("q50_exact"),
        r.getAs[Double]("q95_exact"))
      assert(q50x <= q95x)
      // CF expansion over 4 moments is an approximation — hold it to the
      // sketch's accuracy class (a few percent of the value range), not
      // to exactness; the oracle hash already pins bit-identity.
      val range = 500.0
      assert(math.abs(r.getAs[Double]("q50_est") - q50x) / range < 0.15)
      assert(math.abs(r.getAs[Double]("q95_est") - q95x) / range < 0.15)
    }
  }

  test("txt_chunks: geometry tiles every document's token stream") {
    val (c, st) = (Retrieval.ChunkTokens, Retrieval.ChunkStride)
    val toks = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = run("txt_chunks").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === toks.keySet)
    chunks.foreach { case (doc, rows) =>
      val n = toks(doc)
      val expected = if (n <= c) 1 else 1 + ((n - c) + st - 1) / st
      assert(rows.length === expected, s"doc $doc chunk count")
      val byId = rows.sortBy(_.getAs[Long]("chunk_id"))
      byId.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_id") === i.toLong)
        val start = r.getAs[Long]("start_tok")
        assert(start === i.toLong * st + 1)
        val len = r.getAs[Long]("chunk_len")
        assert(len === math.min(c.toLong, math.max(0L, n - start + 1)))
        // the text really holds chunk_len tokens
        val txt = r.getAs[String]("chunk_text")
        assert((if (txt.isEmpty) 0 else txt.split(" ").length).toLong === len)
      }
      // the last chunk reaches the end of the stream: full coverage
      val last = byId.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("chunk_len") - 1
        === n.toLong)
    }
  }

  test("txt_collocations: lift matches first-principles recompute, PMI order") {
    val rows = run("txt_collocations").collect()
    assert(rows.length <= 20)
    // integer recompute from raw token streams
    val toks = Tables(spark, sfDir, "documents")
      .select(TextOps.tokens(col("text")).as("t")).collect()
      .map(_.getSeq[String](0))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val bis = toks.flatMap(t => t.zip(t.drop(1)).map(p => s"${p._1} ${p._2}"))
    val biC = bis.groupBy(identity).view.mapValues(_.size.toLong)
    val t = bis.length.toLong
    val lifts = rows.map(_.getAs[Long]("lift_milli"))
    assert(lifts.sorted.reverse.toSeq === lifts.toSeq) // ranked desc
    rows.foreach { r =>
      val bg = r.getAs[String]("bigram")
      val Array(a, b) = bg.split(" ")
      assert(r.getAs[Long]("c_ab") === biC(bg))
      assert(r.getAs[Long]("c_ab") >= 5)
      assert(r.getAs[Long]("c_a") === uni(a))
      assert(r.getAs[Long]("c_b") === uni(b))
      assert(r.getAs[Long]("lift_milli") ===
        (biC(bg) * t * 1000) / (uni(a) * uni(b)))
    }
  }

  test("ev_temporal_split: no future leaks into train, 20% holdout") {
    val rows = run("ev_temporal_split").collect()
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ems"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_.getAs[Long]("n_events")).sum === e.length.toLong)
    // recompute the split per user; the boundary law must hold exactly
    val byUser = e.groupBy(_._1)
    var evalTotal = 0L
    byUser.foreach { case (_, evs) =>
      val ordered = evs.sortBy(x => (x._2, x._3))
      val n = ordered.length.toLong
      val nTrain = n * 4 / 5
      val (train, eval) = ordered.splitAt(nTrain.toInt)
      evalTotal += eval.length
      if (train.nonEmpty && eval.nonEmpty)
        assert(train.map(_._2).max <= eval.map(_._2).min) // leakage-free
      assert(eval.length.toLong === n - nTrain) // ≈20%, ceil side
    }
    assert(rows.filter(_.getAs[String]("dataset") == "eval")
      .map(_.getAs[Long]("n_events")).sum === evalTotal)
  }

  test("ev_funnel_latency: cohorts conserve conversions, estimates bracket") {
    val rows = run("ev_funnel_latency").collect()
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ems")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val su = e.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min)
    val pu = e.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.map(_._3).min)
    val lat = su.keySet.intersect(pu.keySet).toSeq
      .map(u => (su(u), pu(u))).filter { case (s, p) => p >= s }
    assert(rows.map(_.getAs[Long]("n")).sum === lat.length.toLong)
    rows.foreach { r =>
      val (q50x, q95x) = (r.getAs[Double]("q50_exact"),
        r.getAs[Double]("q95_exact"))
      assert(q50x <= q95x)
      assert(q50x >= 0.0) // p_ems >= s_ems by the filter
      // degenerate (n = 1) cohorts: every statistic collapses to the value
      if (r.getAs[Long]("n") == 1L) {
        assert(r.getAs[Double]("std") === 0.0)
        assert(r.getAs[Double]("q50_est") === r.getAs[Double]("mean"))
        assert(r.getAs[Double]("q95_est") === r.getAs[Double]("mean"))
      }
    }
  }

  test("ev_ab_test: Welch statistic matches a direct Scala recompute") {
    val r = run("ev_ab_test").collect() match { case Array(x) => x }
    val vals = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    def side(t: String) = {
      val v = vals.filter(_._1 == t).map(_._2)
      val n = v.length.toLong
      val s1 = v.map(x => math.round(x * 1e6)).sum / 1e6
      val s2 = v.map(x => math.round(x * x * 1e6)).sum / 1e6
      val m = s1 / n
      (n, m, ((s2 / n) - (m * m)) * (n.toDouble / (n - 1).toDouble))
    }
    val (na, ma, va) = side("click")
    val (nb, mb, vb) = side("view")
    assert(r.getAs[Long]("n_a") === na && r.getAs[Long]("n_b") === nb)
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_a") - va) < 1e-6)
    val z = (ma - mb) / math.sqrt((va / na) + (vb / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-9)
    assert(r.getAs[Boolean]("significant") === (math.abs(z) > 1.96))
  }

  test("ev_seasonality: chi-square matches a direct integer recompute") {
    val rows = run("ev_seasonality").collect()
    val hours = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("(ems div 3600000) % 24").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val obs = hours.filter(_._1 == et).groupBy(_._2).view
        .mapValues(_.size.toLong).toMap
      val n = obs.values.sum
      assert(r.getAs[Long]("n") === n)
      val chi2num = (0L until 24L).map { h =>
        val o = obs.getOrElse(h, 0L); (o * 24 - n) * (o * 24 - n)
      }.sum
      assert(r.getAs[Long]("chi2_milli") === chi2num * 1000 / (24 * n))
      val mx = obs.values.max
      assert(r.getAs[Long]("peak_obs") === mx)
      assert(r.getAs[Long]("peak_hour") ===
        obs.filter(_._2 == mx).keys.min)
      assert(r.getAs[Boolean]("nonuniform") ===
        (chi2num * 1000 / (24 * n) > 49728L))
    }
  }

  test("txt_bm25: scores match a first-principles Scala recompute") {
    val (k1, b) = (1.2, 0.75)
    val terms = Set("the", "of", "and")
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val df = terms.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    def idf(t: String) =
      math.round(math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * 1e6) / 1e6
    val expected = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val hits = toks.filter(terms)
      if (hits.isEmpty) None
      else Some(id -> hits.groupBy(identity).map { case (t, o) =>
        val tf = o.length.toDouble
        idf(t) * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * (dl / avgdl)))
      }.sum)
    }.toMap
    val got = run("txt_bm25").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-6, s"doc $id") }
  }

  test("txt_rrf_fusion: fused scores are pure functions of the two ranks") {
    val rows = run("txt_rrf_fusion").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      def rank(c: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
      val (lx, sm) = (rank("lex_rank"), rank("sem_rank"))
      assert(lx.nonEmpty || sm.nonEmpty)
      lx.foreach(v => assert(v >= 1 && v <= 50))
      sm.foreach(v => assert(v >= 1 && v <= 50))
      val want = lx.map(v => 1000000L / (60 + v)).getOrElse(0L) +
        sm.map(v => 1000000L / (60 + v)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") === want)
    }
    // ranked output is ordered desc (ties broken by doc_id upstream)
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.sorted.reverse.toSeq === scores.toSeq)
    // a doc in BOTH shortlists must outrank one in a single tail slot
    assert(scores.head >= scores.last)
  }

  test("txt_index_delta: incremental merge equals the from-scratch index") {
    def rows(name: String) = run(name).collect().map(r =>
      (r.getAs[String]("token"), r.getAs[Long]("df"),
        r.getAs[Long]("cf"), r.getAs[String]("postings"))).toSet
    val merged = rows("txt_index_delta")
    assert(merged.nonEmpty)
    assert(merged === rows("txt_inverted_index"))
  }

  test("txt_inverted_index: stats agree with direct recomputation") {
    val p = Retrieval.PostingsCap
    val idx = run("txt_inverted_index").collect()
      .map(r => r.getAs[String]("token") -> r).toMap
    val tok = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    // global conservation: Σcf = token count, Σdf = |(term, doc) pairs|
    assert(idx.values.map(_.getAs[Long]("cf")).sum === tok.count())
    assert(idx.values.map(_.getAs[Long]("df")).sum ===
      tok.distinct().count())
    // spot-check one term end-to-end against a direct pass
    val term = idx.keys.min
    val docsWith = tok.filter(col("token") === term)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val r = idx(term)
    assert(r.getAs[Long]("df") === docsWith.length.toLong)
    val postings = r.getAs[String]("postings")
    val ids = if (postings.isEmpty) Array.empty[Long]
      else postings.split(",").map(_.toLong)
    assert(ids.toSeq === docsWith.take(p).toSeq) // P smallest, sorted
    idx.values.foreach { r =>
      val np = if (r.getAs[String]("postings").isEmpty) 0
        else r.getAs[String]("postings").split(",").length
      assert(np.toLong === math.min(r.getAs[Long]("df"), p.toLong))
    }
  }
}
