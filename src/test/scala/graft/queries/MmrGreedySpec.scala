package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Focused kernel test for the r18 sim_mmr rewrite (the MmrK-round
  * collect-and-broadcast unroll became one per-probe cogroup pass).
  * The DuckDB oracle proves end-to-end equivalence on the fixture; this
  * spec pins the extracted kernel against hand-computed selections so a
  * future edit to the greedy arithmetic fails HERE with a readable
  * diff, not as an opaque oracle hash mismatch.
  */
class MmrGreedySpec extends AnyFunSuite {

  private def run(cands: Seq[(Long, Long)],
      sims: Seq[((Long, Long), Long)], lam: Long = 700L, k: Int = 5) =
    Similarity.mmrGreedy(1L, cands.iterator, sims.iterator, lam, k).toList

  private def symSims(xs: ((Long, Long), Long)*): Seq[((Long, Long), Long)] =
    xs.flatMap { case ((a, b), v) => Seq(((a, b), v), ((b, a), v)) }

  test("diversity flips the pick: step 2 rejects the near-duplicate") {
    // c10 rel=900, c20 rel=890, c30 rel=500; c10~c20 are near-identical
    // (sim 0.95), c30 is orthogonal. Pure relevance would pick
    // (10, 20); MMR must pick (10, 30):
    //   step2 c20: 700·890 − 300·950000 = 623000 − 285000000 < 0
    //   step2 c30: 700·500 − 300·10000  = 350000 − 3000000 = −2650000
    val out = run(
      cands = Seq((10L, 900L), (20L, 890L), (30L, 500L)),
      sims = symSims(((10L, 20L), 950000L), ((10L, 30L), 10000L),
        ((20L, 30L), 12000L)))
    assert(out.map(_._2) === List(10L, 30L, 20L))
    // step-1 score is lam·rel, later steps subtract the clamped penalty
    assert(out.head._5 === 700L * 900L)
    assert(out(1)._5 === 700L * 500L - 300L * 10000L)
    // step 3 (c20): msim = max(sim to 10, sim to 30) = 950000
    assert(out(2)._5 === 700L * 890L - 300L * 950000L)
  }

  test("negative similarity is clamped at zero, never a bonus") {
    val out = run(
      cands = Seq((1L, 800L), (2L, 799L)),
      sims = symSims(((1L, 2L), -500000L)))
    assert(out.map(_._2) === List(1L, 2L))
    assert(out(1)._5 === 700L * 799L) // penalty max(−0.5, 0) = 0
  }

  test("ties break to the smallest cand_id at every step") {
    val out = run(
      cands = Seq((7L, 100L), (3L, 100L), (5L, 100L)),
      sims = symSims(((3L, 5L), 0L), ((3L, 7L), 0L), ((5L, 7L), 0L)))
    assert(out.map(_._2) === List(3L, 5L, 7L))
    assert(out.map(_._3) === List(1L, 2L, 3L)) // contiguous steps
  }

  test("selection stops when candidates run out; ids stay distinct") {
    val out = run(cands = Seq((4L, 10L), (9L, 20L)),
      sims = symSims(((4L, 9L), 100L)), k = 5)
    assert(out.size === 2)
    assert(out.map(_._2).distinct.size === 2)
    assert(out.map(_._3) === List(1L, 2L))
  }

  test("input order is irrelevant: sorted and shuffled cands agree") {
    val cands = Seq((10L, 900L), (20L, 890L), (30L, 500L))
    val sims = symSims(((10L, 20L), 950000L), ((10L, 30L), 10000L),
      ((20L, 30L), 12000L))
    assert(run(cands, sims) === run(cands.reverse, sims.reverse))
  }
}
