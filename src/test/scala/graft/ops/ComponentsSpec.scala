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
}
