package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ER family scale smoke (the one-per-family discipline): 90k generated
  * records (30k entities × 3 source variants, planted at levenshtein
  * ≤ 1 so the matcher must link ALL of them) through the SAME
  * keyed/scoredPairsOf lineage the oracle gates. Proves at volume:
  * blocking recall stays 1 (no planted pair escapes its block), match
  * recall stays 1 (every planted pair scored AND matched), and the
  * candidate budget stays ≪ all-pairs — Σ|block|² economics, the claim
  * the family makes for 100 TB.
  */
class EntityResScaleSpec extends SparkSpec {
  import spark.implicits._

  private val nBase = 30000L

  /** 3 records per entity k: clean / one doubled char / lowercased with
    * '#' dropped — the fixture synthesis shape at volume, minus the
    * deliberate distance-2 misses (this smoke measures recall, not the
    * threshold). Nation is a hash of k (NOT k mod 25: a residue-linked
    * nation would give every same-suffix key pair the same nation and
    * chain false-positive merges across the whole id range).
    */
  private def recs = spark.range(nBase)
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
      lit(null).cast("string").as("seg")) // scorer reads seg agreement

  test("90k records: blocking recall 1, match recall 1, bounded budget") {
    val k = EntityRes.keyed(recs).localCheckpoint()
    // blocking recall: all three variants of an entity share one block
    val splitEntities = k
      .groupBy(expr("rec_id div 3").as("ent"))
      .agg(countDistinct(col("bk")).as("nbk"))
      .filter(col("nbk") > 1).count()
    assert(splitEntities === 0L)
    val sp = EntityRes.scoredPairsOf(k).localCheckpoint()
    // match recall: every planted pair (3 per entity) is matched
    val planted = sp
      .filter(expr("rec_a div 3") === expr("rec_b div 3"))
      .agg(count(lit(1)).as("n"), sum(col("is_match")).as("m"))
      .as[(Long, Long)].collect().head
    assert(planted._1 === 3 * nBase)
    assert(planted._2 === 3 * nBase)
    // candidate budget: blocked pairs ≪ all-pairs (the blocking economics)
    val candidates = sp.count()
    val n = 3 * nBase
    assert(candidates < n * (n - 1) / 2 / 100,
      s"$candidates candidates is not <1% of all-pairs")
  }
}
