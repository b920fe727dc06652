package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ER hot-block pair cap ([[EntityRes.cappedKeyed]]): on a corpus
  * with a PLANTED pathological block (2,000 records behind one blocking
  * key — the default-value-field failure mode blocking selectivity
  * cannot fix), the capped scorer's per-block candidate work is bounded
  * at Cap(Cap−1)/2, while every block at-or-under the cap scores
  * IDENTICALLY to the uncapped scorer — the recall contract that makes
  * the cap a safety valve rather than a quality knob. Plus the
  * dd_domain_cap identity proof: the salted two-phase rank equals the
  * single logical window the DuckDB mirror uses, under any input
  * partitioning.
  */
class ErCapSpec extends SparkSpec {
  import spark.implicits._

  // 600 entities × 3 variants in organically-sized blocks (the scale
  // smoke's shape) + ONE hot block: 2,000 records sharing nation 7 and
  // norm suffix "77" → all collide on bk 777 by construction
  private def cold = spark.range(600)
    .select(col("id").as("k"),
      concat(lit("Person#"), lpad(col("id").cast("string"), 9, "0"))
        .as("nm"),
      pmod(xxhash64(col("id")), lit(25)).cast("int").as("c_nationkey"),
      explode(array(lit(0), lit(1), lit(2))).as("v"))
    .select((col("k") * 3 + col("v")).as("rec_id"), col("c_nationkey"),
      when(col("v") === 0, col("nm"))
        .when(col("v") === 1, concat(substring(col("nm"), 1, 6), lit("n"),
          substring(col("nm"), 7, 100)))
        .otherwise(expr("replace(lower(nm), '#', '')")).as("name"),
      lit(null).cast("string").as("seg"))

  private def hot = spark.range(2000)
    .select((lit(1000000L) + col("id")).as("rec_id"),
      lit(7).as("c_nationkey"),
      concat(lit("HotCity#"), lpad(col("id").cast("string"), 7, "0"),
        lit("77")).as("name"),
      lit(null).cast("string").as("seg"))

  private val hotBk = 7L * 100 + 77

  private def corpus = EntityRes.keyed(cold.unionByName(hot))

  test("the planted hot block is bounded at Cap(Cap-1)/2 pairs") {
    val k = corpus.localCheckpoint()
    val hotN = k.filter(col("bk") === hotBk).count()
    assert(hotN >= 2000L, s"hot block only collected $hotN records")
    val capped = EntityRes.scoredPairsOf(EntityRes.cappedKeyed(k))
    // pairs are in-block, so rec_a's bk names the pair's block
    val hotPairs = capped
      .join(k.select(col("rec_id").as("rec_a"), col("bk")), "rec_a")
      .filter(col("bk") === hotBk).count()
    val cap = EntityRes.BlockCap.toLong
    val bound = cap * (cap - 1) / 2
    assert(hotPairs <= bound,
      s"$hotPairs pairs in the capped hot block exceeds the $bound bound" +
        s" (uncapped would be ${hotN * (hotN - 1) / 2})")
    assert(hotPairs > 0L) // the cap keeps a scored kernel, not nothing
  }

  test("blocks at-or-under the cap score identically to the uncapped scorer") {
    val k = corpus.localCheckpoint()
    val smallBk = k.groupBy(col("bk"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") <= EntityRes.BlockCap).select("bk")
    assert(smallBk.count() > 100) // the contract covers real blocks
    def onSmall(pairs: DataFrame): DataFrame = pairs
      .join(k.select(col("rec_id").as("rec_a"), col("bk")), "rec_a")
      .join(smallBk, Seq("bk"), "left_semi")
      .select("rec_a", "rec_b", "name_dist", "seg_agree", "is_match")
    val unc = onSmall(EntityRes.scoredPairsOf(k))
    val cap = onSmall(EntityRes.scoredPairsOf(EntityRes.cappedKeyed(k)))
    assert(unc.count() > 0)
    assert(unc.exceptAll(cap).count() === 0L)
    assert(cap.exceptAll(unc).count() === 0L)
  }

  test("salted two-phase rank ≡ the single logical window, any partitioning") {
    val k = corpus.localCheckpoint()
    val twoPhase = EntityRes.cappedKeyed(k)
      .select("rec_id").as[Long].collect().toSet
    // the DuckDB mirror's shape: ONE window over the whole block
    val h = expr("CAST(conv(substring(md5(concat('ercap', " +
      "CAST(rec_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bk")).orderBy(h.asc, col("rec_id").asc)
    val single = k.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= EntityRes.BlockCap)
      .select("rec_id").as[Long].collect().toSet
    assert(twoPhase === single)
    // survivor choice is a function of the DATA, not the layout
    val reparted = EntityRes.cappedKeyed(k.repartition(13))
      .select("rec_id").as[Long].collect().toSet
    assert(reparted === single)
  }
}
