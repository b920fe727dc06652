package graft.ops

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("label: chains, cliques, and singletons resolve to min member") {
    // components: {1,2,3,4} (a chain), {10,11} (a pair), {20,21,22} (clique)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)).toDF("doc_a", "doc_b")
    val labels = Components.label(pairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("bounded rounds: a path longer than the reach splits (documented)") {
    // a 10-node path has diameter 9; with 2 rounds the far end can't see
    // node 0 — the explicit bounded-cost contract
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val two = Components.label(pairs, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(two(9L) !== 0L)
    // enough rounds converge (reach grows superlinearly via relabeled
    // neighbors: 4 rounds cover diameter 9 here)
    val four = Components.label(pairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    if (four.values.toSet.size == 1) assert(four.values.forall(_ == 0L))
  }

  // ---- labelUntilConverged (round-14: convergence-gated variant) -----------

  test("convergence gate: a 40-hop path fully merges in O(log d) rounds") {
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val res = Components.labelUntilConverged(pairs, maxRounds = 12)
    assert(res.converged, s"did not converge in ${res.rounds} rounds")
    // pointer doubling: diameter 40 must close in well under 40 rounds
    assert(res.rounds <= 9, s"took ${res.rounds} rounds — doubling broken?")
    val labels = res.labels.as[(Long, Long)].collect().toMap
    assert(labels.size === 41)
    assert(labels.values.forall(_ == 0L), "under-merged labels")
  }

  test("cap binding is SURFACED, never silent") {
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val res = Components.labelUntilConverged(pairs, maxRounds = 2)
    assert(!res.converged)
    assert(res.rounds === 2)
    // the truncated labels exist (caller decides what to do) but the
    // flag is the contract: requiring it throws, as dd_clusters_converged does
    val labels = res.labels.as[(Long, Long)].collect().toMap
    assert(labels.values.toSet.size > 1, "2 rounds cannot merge a 40-path")
  }

  test("labels are STABLE at termination: an extra round changes nothing") {
    // mixed shapes: chain + clique + pair
    val pairs = ((0L until 12L).map(i => (i, i + 1)) ++
      Seq((50L, 51L), (50L, 52L), (51L, 52L), (70L, 71L)))
      .toDF("doc_a", "doc_b")
    val res = Components.labelUntilConverged(pairs, maxRounds = 10)
    assert(res.converged)
    val at = res.labels.as[(Long, Long)].collect().toMap
    // one more full propagation round over the CONVERGED labels must be
    // a fixpoint — re-running with a higher cap lands on the same map
    val again = Components.labelUntilConverged(pairs, maxRounds = 20)
    assert(again.converged && again.rounds <= res.rounds + 1)
    assert(again.labels.as[(Long, Long)].collect().toMap === at)
    assert(at.count(_._2 == 0L) === 13)
    assert(at(52L) === 50L && at(71L) === 70L)
  }
}
