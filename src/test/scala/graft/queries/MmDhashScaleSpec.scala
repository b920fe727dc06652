package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke for the dHash block-bucket search: 100k
  * synthetic asset payloads — generated DISTRIBUTED, no driver-side data
  * — through the same hash/banding/join lineage as `mm_dhash_neardup`.
  *
  * Corpus: payloads are md5-derived 96-char strings, (asset)-unique.
  * Assets with asset_id ≡ 3 (mod 1000) — 100 of them — instead carry one
  * of two PLANTED payload templates (split by parity), each template
  * verbatim-identical across its ~50 members, so the ground truth is the
  * two hamming-0 cliques: C(50,2) + C(50,2) = 2450 pairs (any
  * cross-template or planted×random pair within hamming 3 would be an
  * md5 accident at ~1e-9).
  *
  * Asserts:
  *  1. exactly the two planted cliques are found (count + membership);
  *  2. bucket occupancy stays hash-uniform for the random mass: the
  *     largest non-planted block bucket holds ≪ corpus-sized rows, so
  *     in-bucket pair generation is bounded — the property that makes
  *     this shape survive 1000× (planted-dup buckets grow with the TRUE
  *     duplicate rate, the thing the query exists to find).
  */
class MmDhashScaleSpec extends SparkSpec {

  private val nAssets = 100000

  private def corpus = spark.range(nAssets).select(
    col("id").as("asset_id"),
    when(col("id") % 1000 === 3,
      // two templates by parity of the planted slot index (`div`, not
      // `/`: long / long in Spark is DOUBLE division, and 1.003 % 2
      // never equals 0 — the ground truth below uses Scala integer /)
      when(expr("id div 1000") % 2 === 0,
        concat_ws("", transform(sequence(lit(1), lit(12)), i =>
          substring(md5(concat(lit("tplA|"), i.cast("string"))), 1, 8))))
        .otherwise(
          concat_ws("", transform(sequence(lit(1), lit(12)), i =>
            substring(md5(concat(lit("tplB|"), i.cast("string"))), 1, 8)))))
      .otherwise(
        concat_ws("", transform(sequence(lit(1), lit(12)), i =>
          substring(md5(concat(col("id").cast("string"), lit("|"),
            i.cast("string"))), 1, 8)))).as("payload"))

  test("100k assets: exactly the two planted cliques, bounded buckets") {
    val dh = corpus.select(col("asset_id"),
      MultimodalQ.dhash(spark, col("payload")).as("dhash")).localCheckpoint()
    val blocked = dh.select(col("asset_id"), col("dhash"),
        explode(MultimodalQ.dhashBlockStructs(col("dhash"))).as("e"))
      .select(col("asset_id"), col("dhash"),
        col("e.blk").as("blk"), col("e.bv").as("bv"))
    val lhs = blocked.select(col("blk"), col("bv"),
      col("asset_id").as("a"), col("dhash").as("ha"))
    val rhs = blocked.select(col("blk"), col("bv"),
      col("asset_id").as("b"), col("dhash").as("hb"))
    val pairs = lhs.join(rhs, Seq("blk", "bv"))
      .filter(col("a") < col("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <=
        MultimodalQ.DhashMaxHamming)
      .select(col("a"), col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val planted = (0L until nAssets).filter(_ % 1000 == 3)
    val (tplA, tplB) = planted.partition(id => (id / 1000) % 2 == 0)
    def clique(ids: Seq[Long]) = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j))).toSet
    val want = clique(tplA) ++ clique(tplB)
    assert(pairs === want,
      s"got ${pairs.size} pairs, want ${want.size} " +
        s"(missing=${(want -- pairs).take(3)} extra=${(pairs -- want).take(3)})")

    // bucket-occupancy: random-mass buckets stay tiny (hash-uniform);
    // only the planted-dup buckets are allowed to be clique-sized
    val maxRandomBucket = blocked
      .filter(col("asset_id") % 1000 =!= 3)
      .groupBy(col("blk"), col("bv")).count()
      .agg(max(col("count"))).head.getLong(0)
    // measured ~104 at 100k: the hex-alphabet payloads give mildly biased
    // bits (P(c_i > c_{i+1}) ≈ 0.469 over 16 symbols, adjacent bits share
    // a char), so buckets run a bit above the uniform ~12/bucket — still
    // 0.1% of the corpus, i.e. in-bucket pair work is ~1e-6 of all-pairs.
    // The guard fires at 1%: that's when banding is actually saturating.
    assert(maxRandomBucket < nAssets / 100,
      s"random-mass bucket of $maxRandomBucket rows — banding is saturating " +
        "and in-bucket pair generation would grow quadratically at scale")
  }
}
