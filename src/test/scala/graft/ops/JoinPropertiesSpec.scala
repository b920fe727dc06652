package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests: the scalable join operators agree with their O(n²)
  * brute-force definitions on random inputs.
  */
class JoinPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val keyGen = Gen.choose(1L, 4L)
  private val timeGen = Gen.choose(0L, 100L)

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("asOf ≡ brute-force max-t'-at-or-before, for random inputs") {
    val leftGen = Gen.listOfN(12, Gen.zip(keyGen, timeGen))
    val rightGen = Gen.listOfN(12, Gen.zip(keyGen, timeGen))
    check(Prop.forAll(leftGen, rightGen) { (l0, r0) =>
      // contract: right unique per (key, time)
      val r = r0.distinct
      val l = l0.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val got = AsOfJoin.asOf(
          l.toDF("k", "t", "lid"),
          r.map { case (k, t) => (k, t, t * 1000 + k) }.toDF("k", "rt", "rv"),
          "k", "t", "rt")
        .select("lid", "r_rt").as[(Long, Option[Long])].collect().toMap
      val want = l.map { case (k, t, lid) =>
        lid -> r.filter(p => p._1 == k && p._2 <= t)
          .map(_._2).maxOption
      }.toMap
      got == want
    })
  }

  test("rangeJoin ≡ brute-force inequality join, for random inputs/bins") {
    val ivGen = Gen.listOfN(8,
      Gen.zip(keyGen, timeGen, Gen.choose(0L, 30L)))
    val ptGen = Gen.listOfN(15, Gen.zip(keyGen, timeGen))
    val binGen = Gen.oneOf(1L, 7L, 10L, 64L)
    check(Prop.forAll(ivGen, ptGen, binGen) { (iv0, pts, bin) =>
      val iv = iv0.zipWithIndex.map { case ((k, lo, span), i) =>
        (k, i.toLong, lo, lo + span)
      }
      val got = RangeJoin.rangeJoin(
          iv.toDF("k", "iid", "lo", "hi"),
          pts.toDF("k", "t"), "k", "lo", "hi", "t", bin)
        .select("iid", "p_t").as[(Long, Long)].collect().toSeq
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = (for {
        (k, iid, lo, hi) <- iv
        (pk, t) <- pts if pk == k && t >= lo && t <= hi
      } yield (iid, t)).groupBy(identity).view.mapValues(_.length).toMap
      got == want // multiset equality: each pair exactly once
    })
  }
}
