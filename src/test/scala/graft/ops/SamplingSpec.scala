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
}
