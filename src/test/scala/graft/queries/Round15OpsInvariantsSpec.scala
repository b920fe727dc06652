package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 operator invariants: the corpus-scaled blocking key's
  * CONTRACT — selectivity grows with the corpus, recall does not
  * shrink — proven on synthetic record frames at two corpus sizes
  * (the sf1.0 exponent in BASELINE.md is the measurement; this is the
  * mechanism test that keeps it true).
  */
class Round15OpsInvariantsSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic records shaped like EntityRes.records: 3 source-system
    * variants per entity, names with the fixture's digit-padded tail,
    * variant v=1 perturbed mid-name (never in the trailing digits —
    * the property the key relies on and [[EntityRes.keyed]] documents).
    */
  private def recs(nEntities: Int) =
    spark.range(nEntities.toLong)
      .select(col("id").as("ck"),
        explode(array(lit(0), lit(1), lit(2))).as("v"))
      .select(
        (col("ck") * 3 + col("v")).as("rec_id"),
        (col("ck") % 25).cast("int").as("c_nationkey"),
        concat(lit("Customer#"),
          when(col("v") === 1, lit("x")).otherwise(lit("")),
          format_string("%09d", col("ck"))).as("name"))

  test("scaledKeyed: digit-count grows with the corpus; variants of " +
      "one entity always share a block; block sizes stay O(1)") {
    def digitsOf(df: org.apache.spark.sql.DataFrame): Int = {
      // bk = "<nation>:<suffix>" — suffix length IS the digit count
      val d = df.select(length(expr("split(bk, ':')[1]")))
        .distinct().as[Int].collect()
      assert(d.length === 1, s"mixed digit counts: ${d.toSeq}")
      d.head
    }
    //  4 000 entities = 12 000 recs → digits(12000/150 =  80) = 2
    // 40 000 entities = 120 000 recs → digits(120000/150 = 800) = 3
    val small = EntityRes.scaledKeyed(recs(4000))
    val big = EntityRes.scaledKeyed(recs(40000))
    assert(digitsOf(small) === 2)
    assert(digitsOf(big) === 3)
    // recall precondition: every entity's 3 variants land in ONE block
    // at EVERY scale (they share the full digit tail by construction)
    Seq(small, big).foreach { k =>
      val split = k.select(expr("rec_id div 3").as("e"), col("bk"))
        .groupBy(col("e")).agg(countDistinct(col("bk")).as("nbk"))
        .filter(col("nbk") > 1).count()
      assert(split === 0, s"$split entities split across blocks")
    }
    // selectivity: 10× the corpus under ONE more digit must not grow
    // the max block — the fixed-key failure mode this key exists to
    // prevent (under the 2-digit key, `big`'s blocks would be 10×
    // `small`'s). This generator's blocks are exact residue classes
    // (25 | 10^d, so nation is implied by the digit tail): ~3n/10^d
    // records per block — 120 at BOTH scales.
    def maxBlock(k: org.apache.spark.sql.DataFrame): Long =
      k.groupBy(col("bk")).count().agg(max(col("count")))
        .as[Long].head()
    val (mS, mB) = (maxBlock(small), maxBlock(big))
    assert(mB <= mS * 2,
      s"max block grew $mS → $mB under the scaled key")
  }

  test("the default er_pairs (scaled key) at sf0.001 resolves to the " +
      "fixed-key demo's 2-digit key and finds the same pairs") {
    val sfDir = "/root/testdata/sf0.001"
    val scaled = graft.SparkEntry.queries("er_pairs")(
      spark, sfDir).select("rec_a", "rec_b")
      .as[(Long, Long)].collect().toSet
    val fixed = graft.SparkEntry.queries("er_pairs_fixedkey_demo")(
      spark, sfDir)
      .select("rec_a", "rec_b").as[(Long, Long)].collect().toSet
    // at this corpus size the formula yields 2 digits — the exact
    // fixed key — so the pair sets must coincide (the "floor
    // behavior pinned by the oracle gate" claim in the scaladoc)
    assert(scaled === fixed)
    assert(scaled.nonEmpty)
  }
}
