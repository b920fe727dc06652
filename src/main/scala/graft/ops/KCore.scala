package graft.ops

import graft.ops.Materialize._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling over an edge list — the graph-density rung
  * the components/PageRank/triangles trio is missing: the k-core is the
  * maximal subgraph where every node keeps ≥ k neighbors INSIDE the
  * subgraph, the standard spam-farm / boilerplate-ring signal on a
  * near-dup graph (a k-clique of templated pages survives any peel; a
  * chain of coincidental pairs does not).
  *
  * Same contract as [[Components.label]]: deliberately BOUNDED rounds,
  * fixed at plan time — each round is two key-only semi-joins + one
  * combinable degree aggregate, so cost is rounds × |edges| regardless
  * of data, and the operator stays exactly mirrorable in oracle SQL.
  * Each round peels EVERY node currently under-degree (not one node at
  * a time), which converges in O(diameter)-ish rounds on dedup graphs
  * (LSH clusters are near-cliques: one round usually suffices; the spec
  * pins round-`rounds` ≡ round-`rounds+1` on the fixture). Per-round
  * materialization truncates the doubling lineage (the Components
  * lesson: without it, planning time explodes combinatorially).
  */
object KCore {

  /** pairs(doc_a, doc_b) → (node, deg) for every node still in the
    * k-core after `rounds` peels; `deg` is the node's degree INDUCED by
    * the final survivor set (≥ k by construction).
    */
  def survivors(pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val p = pairs.materialize() // referenced twice by the symmetrize
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .materialize() // every peel round re-reads the edge list
    // round 0 "survivors" = all endpoint nodes
    var nodes = edges.select(col("src").as("node")).distinct()
    var out: DataFrame = null
    for (_ <- 1 to rounds) {
      out = edges
        .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"), col("deg"))
        .materialize()
      nodes = out.select(col("node"))
    }
    out
  }

  /** DuckDB mirror of [[survivors]] over a `cand` CTE with
    * (doc_a, doc_b) columns: the same `rounds` peels unrolled. Emits
    * the CTE chain `edges, n1 … n<rounds>`; select from
    * `n<rounds>(node, deg)`.
    */
  def survivorsSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("""
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM cand
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM cand)""")
    for (r <- 1 to rounds) {
      val prev =
        if (r == 1) "" // round 1 peels the full endpoint set
        else s"""
          WHERE src IN (SELECT node FROM n${r - 1})
            AND dst IN (SELECT node FROM n${r - 1})"""
      sb.append(s""",
        n$r AS (
          SELECT src AS node, count(*) AS deg FROM edges$prev
          GROUP BY 1 HAVING count(*) >= $k)""")
    }
    sb.toString
  }
}
