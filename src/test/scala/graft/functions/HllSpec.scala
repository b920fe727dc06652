package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The integer HLL helper: register math invariants and raw-estimate
  * accuracy on a known cardinality (the oracle gate covers cross-engine
  * parity; this covers the math itself).
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val m = 64

  test("rho is 33 - bitlength of the 32 post-bucket bits, 33 at zero") {
    // craft hashes where the post-bucket remainder is exactly 2^k
    val rows = (0 to 31).map(k => (1L << k) * m) :+ 0L
    val got = rows.toDF("h")
      .select(Hll.rho(col("h"), m).as("rho"))
      .as[Long].collect()
    val expected = (0 to 31).map(k => 33L - (k + 1)) :+ 33L
    assert(got.toSeq === expected)
  }

  test("raw estimate lands within 30% of a 10k true cardinality") {
    // m=64 gives ~13% standard error; 30% is a deterministic-fixture bound
    val n = 10000
    val toks = (0 until n).map(i => s"item_$i").toDF("item")
      .select(Hll.hash(col("item")).as("h"))
    val regs = toks
      .select(Hll.bucket(col("h"), m).as("bucket"), Hll.rho(col("h"), m).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
    val est = Hll.estimate(regs.withColumn("g", lit(1)), m, col("g"))
      .select(col("est_milli")).as[Long].head() / 1000.0
    assert(est > n * 0.7 && est < n * 1.3, s"estimate $est vs true $n")
  }

  test("estimate is partitioning-invariant (combinable register max)") {
    val items = (0 until 5000).map(i => s"k$i")
    def estimateWith(parts: Int): Long = {
      val toks = items.toDF("item").repartition(parts)
        .select(Hll.hash(col("item")).as("h"))
      val regs = toks
        .select(Hll.bucket(col("h"), m).as("bucket"),
          Hll.rho(col("h"), m).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
      Hll.estimate(regs.withColumn("g", lit(1)), m, col("g"))
        .select(col("est_milli")).as[Long].head()
    }
    assert(estimateWith(1) === estimateWith(13))
  }
}
