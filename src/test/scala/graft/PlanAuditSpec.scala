package graft

/** PLAN_AUDIT.md as an enforced invariant: every registered query's
  * physical plan at sf0.001 is checked for scale-hostile nodes.
  *
  * - `CartesianProduct` is forbidden everywhere.
  * - `BroadcastNestedLoopJoin` only in the three vector queries whose
  *   bounded broadcast × scan IS the intended shape (probe set / centroid
  *   assignment — see PLAN_AUDIT.md).
  * - Every scan reads parquet with a pruned schema (no `ReadSchema` that
  *   drags the full `documents.text` into queries that don't use it —
  *   spot-checked on the narrowest query).
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // sim_recall composes knnBrute + knnIvf, so it inherits both bounded
  // broadcast × scan shapes; dd_bloom_decontam probes a 1-row broadcast
  // bitset (128 KB sketch × scan — the intended shape); txt_surprisal
  // crosses the vocab with the broadcast 1-row corpus total (the same
  // 1-row probe shape, replacing a vocab-wide global window)
  private val bnljAllowed =
    Set("sim_knn_brute", "sim_knn_ivf", "dd_embed_cos", "sim_recall",
      "dd_bloom_decontam", "sim_ivfpq", "sim_filtered_knn", "sim_ivf_stats",
      "sim_recall_pq", "txt_surprisal", "sim_range_search",
      // inherits dd_embed_cos's bounded corpus × broadcast-centroid BNLJ
      "mm_hybrid_neardup",
      // the (cohort-week ≥ active-week) grid join over two bitmap
      // aggregate tables — time-span-sized sides, never data-sized
      "ev_bitmap_retention",
      // the pairwise (lang_a < lang_b) join over the per-segment KMV
      // sketch table — |segments| rows a side (sketches are ≤ k longs),
      // never data-sized; the corpus-sized work ends at the combinable
      // sketch aggregate
      "txt_kmv_setops",
      // txt_surprisal's 1-row broadcast corpus-total shape: the bigram
      // total crosses the bigram-count table as a single-row broadcast
      // (txt_collocations) / the 1-row probe vector crosses the
      // embedding table (txt_rrf_fusion's semantic shortlist)
      "txt_collocations", "txt_rrf_fusion",
      // the 1-row broadcast session-total crossing the pair-count table
      // (txt_collocations' corpus-total shape on the events domain)
      "ev_cooccurrence",
      // three 1-row aggregate verdict sides crossing into one report row
      "dq_expectations",
      // the 1-row TP/FP/FN aggregate crossing the 1-row true-pair total
      // into the single evaluation-card row (the dq_expectations shape)
      "er_match",
      // the 1-row broadcast corpus-count total crossing the records
      // frame to size the scaled blocking key's digit count (the
      // txt_surprisal corpus-total shape) — the DEFAULT family lineage
      // since r16, so every scoredPairs consumer carries it (er_blocking
      // moved to the same key so its economics describe the default)
      "er_pairs", "er_entities", "er_golden", "er_blocking",
      // three 1-row aggregate sides (blocking, pairs, entities) crossing
      // into the one-row linkage data card (same shape; the fixed-key
      // demo card keeps the old report's aggregate-cross shape)
      "er_report", "er_report_fixedkey_demo",
      // the same card over the capped lineage: four 1-row sides
      // (blocking, kept-count, pairs, entities) crossing into one row
      "er_report_capped",
      // the 1-row digit-total broadcast crossing the ≤9-row digit table
      // (the txt_collocations corpus-total shape)
      "dq_benford",
      // two 1-row broadcast training-constant sides (per-lang token
      // totals + vocab, per-lang doc priors) crossing the scored-doc
      // table — the txt_surprisal corpus-total shape, twice
      "txt_nb_langid",
      // knnBrute's bounded corpus × broadcast-probe BNLJ, once per
      // prefix dimension (the sim_recall shape, ×4)
      "sim_mrl_curve",
      // four 1-row aggregate pairs crossing into four card rows — the
      // dq_expectations verdict-card shape, once per modality
      "mm_dedup_report",
      // inherits assignIvf's bounded corpus × broadcast-centroid BNLJ
      // (the sim_knn_ivf shape) under the label joins
      "sim_rank_eval",
      // the 1-row broadcast corpus-frontier timestamp crossing the
      // |event-types|-row freshness table (the ev_rfm threshold shape)
      "dq_freshness",
      // the 1-row true-pair total crossing the 3-row threshold curve
      // (er_match's evaluation-cross shape)
      "er_threshold_curve",
      // 1-row now-timestamp and quartile-threshold sides broadcast-cross
      // the per-user metric table (the q14 broadcast-back shape)
      "ev_rfm",
      // inherit assignIvf's bounded corpus × broadcast-centroid BNLJ
      // (sim_negatives adds the knnBrute probe-broadcast × corpus shape)
      "sim_bitext", "sim_mmr", "sim_tau_curve", "sim_negatives",
      // inherits assignIvf's bounded corpus × broadcast-centroid BNLJ
      // (the purity eval adds only aggregates over the assignment)
      "sim_purity",
      // the 1-row broadcast horizon timestamp crossing the per-user
      // lifetime table (the ev_rfm now-threshold shape)
      "ev_survival",
      // inherits assignIvfScored's bounded corpus × broadcast-centroid
      // BNLJ (the sim_purity shape; the outlier pass adds only windows
      // and keyed joins over the assignment)
      "sim_outliers",
      // 1-row broadcast max-doc-id threshold / vocab-size crosses over
      // the token or bigram stream (txt_collocations' corpus-total
      // shape), plus txt_heaps' final 1×1 point-row cross
      "txt_heaps", "txt_bigram_lm",
      // the 1-row broadcast Bloom bitset crossing the fact scan — the
      // runtime-filter shape (dd_bloom_decontam's precedent); the
      // bitset prunes BEFORE the join exchange, which is the point
      "q27_bloom_join",
      // the 1-row broadcast doc-count total crossing the vocab-sized
      // token aggregate (txt_collocations' corpus-total shape)
      "txt_stopword_discovery",
      // the 1-row broadcast event total crossing the ≤168-cell weekly
      // load profile (the dq_freshness corpus-frontier shape)
      "ev_seasonality_week",
      // the 1-row broadcast URL total crossing the ≤|hosts| frontier
      // card (same shape)
      "web_host_frontier")

  test("no query plans a CartesianProduct; BNLJ only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !bnljAllowed.contains(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("mm_crossmodal prunes binary payloads before any exchange") {
    // the cross-modal contract: content bytes are consumed in the scan
    // projection (length + hash); every exchange and the doc_id join
    // move only feature rows. A `binary` type anywhere downstream of an
    // Exchange means payload bytes are shuffling — the 100 TB killer.
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect);
    // plan once without it — the exchange OUTPUTS are identical either way
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    val exec =
      try {
        spark.conf.set(aqeKey, "false")
        SparkEntry.queries("mm_crossmodal")(spark, sfDir)
          .queryExecution.executedPlan
      } finally spark.conf.set(aqeKey, aqeWas)
    val exchanges = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.nonEmpty) // the agg + join do shuffle...
    exchanges.foreach(e => assert(!e.output.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType),
      "binary column crosses an exchange"))
  }

  test("global windows and global sorts only over model-sized inputs") {
    // A WindowExec with no partitionSpec moves its whole input to ONE
    // partition — fatal when the input is corpus-sized (the txt_surprisal
    // bug class: a window over the vocabulary); a global SortExec totals-
    // orders its whole input for no consumer (none of the queries needs a
    // corpus-wide order; currently ZERO queries plan one, so any new
    // global sort fails here by default). Allowed only where the
    // window input is a model-sized aggregate: txt_source_mix (|sources|
    // rows), sim_ivf_stats (|centroids| rows), and ev_lateness (the
    // running watermark over |time-span|/1min micro-batch buckets — grows
    // with wall-clock span, never with row count).
    // txt_rrf_fusion: rank windows run AFTER TakeOrderedAndProject cut
    // both shortlists to ≤50 rows — model-sized by construction
    val allowed = Set("txt_source_mix", "sim_ivf_stats", "ev_lateness",
      "txt_rrf_fusion",
      // the cross-bucket carry runs over |price-domain / 10| per-bucket
      // maxima — bounded by the value domain, never by row count
      "q26_skyline",
      // cumulative operating curves over ≤61-bin / ≤21-bin / ≤11-bin
      // histograms (value-domain-bounded), and the Zipf rank window over
      // the ZipfTopN TakeOrderedAndProject shortlist
      "mm_hamming_curve", "sim_tau_curve", "dd_jaccard_curve", "txt_zipf",
      // txt_source_mix's |sources|-row normalizing window on token counts
      "txt_token_budget",
      // KM survival: descending/ascending cumulative windows over the
      // |lifetime-days| table — time-span-sized, never user-sized
      "ev_survival",
      // PSI: totals window over the |length-buckets| table — bounded by
      // the value domain (n_chars/100), never by document count
      "txt_drift_psi",
      // Gini: windows over the |distinct count values| histogram — the
      // whole point of the block decomposition is that the global sort
      // never touches user-sized data
      "ev_gini",
      // AUC: the cumulative-negative prefix sum runs over the ≤1001-row
      // milli-quantized score histogram — value-domain-bounded like
      // ev_gini, never document-sized
      "txt_classifier_auc")
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    val offenders =
      try {
        spark.conf.set(aqeKey, "false")
        SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
          val globals =
            globalNodes(fn(spark, sfDir).queryExecution.executedPlan)
          if (globals.nonEmpty && !allowed(name))
            Some(s"$name (${globals.mkString(",")})")
          else None
        }
      } finally spark.conf.set(aqeKey, aqeWas)
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  /** The single-partition funnels the global-window/sort gate hunts:
    * a WindowExec with no partitionSpec and a SortExec with global=true
    * both move their WHOLE input through one task (empty-partition
    * windows via an Exchange SinglePartition; global sorts via a range
    * exchange whose value is only defensible on model-sized inputs —
    * none of the 195 queries needs a corpus-wide total order, the
    * oracle compare sorts on its own side). TakeOrderedAndProject is
    * exempt by construction: it holds only top-k rows per partition.
    */
  private def globalNodes(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
    plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => "global-window"
      case s: org.apache.spark.sql.execution.SortExec if s.global =>
        "global-sort"
    }

  test("the global-window/sort detector fires on deliberate violations") {
    // canary: the gate above is only as good as its detector — prove it
    // would flag a new query that sneaks in a corpus-sized global window
    // or a global orderBy, instead of silently blessing it
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect) —
    // plan without it, exactly as the gate test itself does
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val li = Tables(spark, sfDir, "lineitem")
      val badWindow = li.withColumn("rk",
        row_number().over(Window.orderBy(col("l_orderkey"))))
      assert(globalNodes(badWindow.queryExecution.executedPlan)
        .contains("global-window"))
      val badSort = li.orderBy(col("l_extendedprice"))
      assert(globalNodes(badSort.queryExecution.executedPlan)
        .contains("global-sort"))
      // and the exemption holds: top-k plans TakeOrderedAndProject, not a
      // global sort — bounded per partition, no funnel
      val topk = li.orderBy(col("l_extendedprice").desc).limit(5)
      assert(globalNodes(topk.queryExecution.executedPlan).isEmpty)
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("hot narrow kernels run inside WholeStageCodegen spans") {
    // the brief's "codegen-friendly" rule as an invariant: the custom
    // expressions (dhash60, fixedpoint_dot) and the big narrow
    // projections they live in must sit INSIDE WholeStageCodegen — a
    // kernel that falls out of codegen (e.g. by becoming a non-codegen
    // Expression or an opaque lambda) silently costs an interpreter
    // round-trip per row. Checked on one representative per family.
    val hot = Seq("mm_dhash_neardup", "sim_lsh_sig", "txt_fingerprint")
    // AQE wraps the tree in AdaptiveSparkPlanExec, whose codegen stages
    // only materialize at execution — plan without it (sibling-test
    // pattern); codegen eligibility is identical either way
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      hot.foreach { name =>
      val exec = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan
      val spans = exec.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(spans.nonEmpty, s"$name: no WholeStageCodegen span at all")
      // a span's CODEGEN REGION stops at InputAdapter — that is exactly
      // where generated code ends and child stages begin; a naive
      // subtree `collect` would see straight through the boundary and
      // bless interpreted nodes below it (vacuous guard)
      def region(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case _: org.apache.spark.sql.execution.InputAdapter => Nil
        case other => other +: other.children.flatMap(region)
      }
      val inRegion = spans.flatMap(s => region(s.child))
      // every ProjectExec must be inside some span's region
      val bareProjects = exec.collect {
        case pr: org.apache.spark.sql.execution.ProjectExec
            if !inRegion.exists(_ eq pr) => pr
      }
      assert(bareProjects.isEmpty,
        s"$name: ${bareProjects.size} ProjectExec outside codegen:\n" +
          bareProjects.map(_.simpleStringWithNodeId()).mkString("\n"))
      }
    } finally spark.conf.set(aqeKey, aqeWas)
  }

  test("column pruning reaches the scan (q5 reads 3 customer columns)") {
    val plan = SparkEntry.queries("q5_distinct_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("c_mktsegment") && read.contains("c_nationkey")
      && read.contains("c_acctbal"))
    assert(!read.contains("c_name") && !read.contains("c_address"))
  }
}
