package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified: deterministic, per-stratum rate, stable under growth") {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 4 == 0) "big" else "sm"))
      .toDF("id", "g")
    val s1 = Sampling.stratified(df, col("g"), col("id"), 0.25)
      .as[(Long, String)].collect().toSet
    val s2 = Sampling.stratified(df, col("g"), col("id"), 0.25)
      .as[(Long, String)].collect().toSet
    assert(s1 === s2) // run-to-run determinism
    val rate = s1.size.toDouble / 2000
    assert(rate > 0.18 && rate < 0.32, s"rate $rate far from 0.25")
    // growing the input never changes existing membership
    val grown = df.union(Seq((9999L, "sm")).toDF("id", "g"))
    val s3 = Sampling.stratified(grown, col("g"), col("id"), 0.25)
      .as[(Long, String)].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("fraction edge cases: 0 keeps nothing, 1 keeps everything") {
    val df = (1 to 100).map(i => (i.toLong, "x")).toDF("id", "g")
    assert(Sampling.stratified(df, col("g"), col("id"), 0.0).count() === 0)
    assert(Sampling.stratified(df, col("g"), col("id"), 1.0).count() === 100)
  }

  test("weighted: keep rate tracks weight; zero weight keeps nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 4000L).map(i => (i, (i % 4) * 256)).toDF("k", "w")
    val kept = Sampling.weighted(df, col("k"), col("w"), log2Denom = 10)
      .groupBy("w").count().as[(Long, Long)].collect().toMap
    // p = w/1024: w=0 -> 0, w=256 -> ~25%, w=512 -> ~50%, w=768 -> ~75%
    assert(!kept.contains(0L))
    def rate(w: Long): Double = kept.getOrElse(w, 0L).toDouble / 1000.0
    assert(math.abs(rate(256) - 0.25) < 0.08)
    assert(math.abs(rate(512) - 0.50) < 0.08)
    assert(math.abs(rate(768) - 0.75) < 0.08)
    // deterministic: same call, same sample
    val again = Sampling.weighted(df, col("k"), col("w"), 10)
      .agg(sum("k")).as[Long].head()
    val first = Sampling.weighted(df, col("k"), col("w"), 10)
      .agg(sum("k")).as[Long].head()
    assert(again === first)
  }

  test("weighted: weights above the denominator keep with probability 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // weight >> 2^(log2Denom+3) used to overflow the long threshold and
    // silently DROP rows that should always be kept (ADVICE r3); clamping
    // the weight to 2^log2Denom makes any huge weight mean p = 1.
    val df = Seq(
      (1L, 1L << 20), (2L, Long.MaxValue / 2), (3L, 1L << 10),
      (4L, (1L << 10) + 1)).toDF("k", "w")
    val kept = Sampling.weighted(df, col("k"), col("w"), log2Denom = 10)
    assert(kept.count() === 4) // every weight >= 2^10 ⇒ kept, no overflow
  }
}
