package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KCore.survivors: planted peel/survive structure (cliques and cycles
  * survive a 2-core, chains/stars/pendants peel — including the star
  * hub, whose high raw degree evaporates once its spokes go), bounded-
  * round convergence on the real fixture graph, and a 100k-edge scale
  * smoke with an exactly known survivor set.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def survivorMap(pairs: Seq[(Long, Long)], k: Int, rounds: Int)
      : Map[Long, Long] =
    KCore.survivors(pairs.toDF("doc_a", "doc_b"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("planted structure: cliques and cycles survive, trees peel") {
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val cycle = (10L to 14L).map(i => (i, if (i == 14L) 10L else i + 1))
    val chain = Seq((20L, 21L), (21L, 22L), (22L, 23L))
    val star = (31L to 36L).map(i => (30L, i))
    val pendant = Seq((0L, 40L)) // hangs off the clique
    val got = survivorMap(clique ++ cycle ++ chain ++ star ++ pendant,
      k = 2, rounds = 3)
    // 4-clique: induced degree 3 each; the pendant edge adds nothing
    // back because node 40 peeled in round 1
    assert(got.filter(_._1 <= 3L) ===
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // 5-cycle: exactly degree 2 each — the minimal 2-core
    assert((10L to 14L).forall(got.get(_).contains(2L)))
    // chain, star (hub AND spokes), pendant: all gone
    assert(got.keySet.intersect((20L to 40L).toSet) === Set.empty)
  }

  test("bounded rounds converge on the fixture near-dup graph") {
    val pairs = graft.text.TextOps.lshCandidates(
      graft.Tables(spark, "/root/testdata/sf0.001", "documents"),
      4, 12, 2)
    import graft.ops.Materialize._
    val p = pairs.materialize()
    val r3 = KCore.survivors(p, 2, 3).as[(Long, Long)].collect().toMap
    val r4 = KCore.survivors(p, 2, 4).as[(Long, Long)].collect().toMap
    assert(r3 === r4, "3 peel rounds must be a fixpoint on this graph")
  }

  test("scale smoke: 100k edges, survivor set exactly known") {
    // 50k-node ring (a 2-core: survives, deg 2 each) + 25k-spoke star
    // (hub AND spokes peel: spokes round 1, the hub — raw degree 25k —
    // round 2) + a 6-clique (survives, deg 5) + a 25001-node PATH,
    // which pins the documented bounded-rounds semantic exactly: a
    // path peels ONE LAYER PER ROUND from each end (the worst case the
    // scaladoc warns about — near-clique dedup graphs never look like
    // this), so after 3 rounds exactly 3 nodes are gone per end and
    // the interior remains with induced degree 2.
    val n = 50000L
    val ring = spark.range(n).select(col("id").as("doc_a"),
      ((col("id") + 1) % n).as("doc_b"))
    val star = spark.range(25000).select(lit(100000L).as("doc_a"),
      (col("id") + 100001L).as("doc_b"))
    val chain = spark.range(25000).select(
      (col("id") + 200000L).as("doc_a"), (col("id") + 200001L).as("doc_b"))
    val clique = (for (a <- 0 to 5; b <- (a + 1) to 5)
      yield (300000L + a, 300000L + b)).toDF("doc_a", "doc_b")
    val got = KCore.survivors(
      ring.union(star).union(chain).union(clique), 2, 3)
      .as[(Long, Long)].collect()
    val m = got.toMap
    assert((0L until n).forall(m.get(_).contains(2L)))
    assert((300000L to 300005L).forall(m.get(_).contains(5L)))
    // path nodes 200000..225000: 3 peeled from each end, interior stays
    val pathSurvivors = got.map(_._1).filter(id =>
      id >= 200000L && id <= 225000L)
    assert(pathSurvivors.min === 200003L)
    assert(pathSurvivors.max === 224997L)
    assert(pathSurvivors.length === 224997 - 200003 + 1)
    assert(got.length === (n + 6 + pathSurvivors.length).toInt)
    // nothing from the star survives
    assert(got.map(_._1).forall(id => id < 100000L || id > 125000L))
  }
}
