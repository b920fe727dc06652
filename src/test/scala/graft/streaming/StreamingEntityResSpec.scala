package graft.streaming

import graft.SparkSpec
import graft.queries.EntityRes
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The streaming growing-index linker's two contracts against the batch
  * er family on the sf0.001 fixture records (450 rows):
  * refinement under a shuffled slicing (streamed entities never glue
  * two batch clusters), and full same-customer linkage on an id-ordered
  * replay.
  */
class StreamingEntityResSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Run the linker over `slices` written as separate parquet dirs,
    * one micro-batch each; returns rec_id → streamed entity_id.
    */
  private def streamLink(slices: Seq[org.apache.spark.sql.DataFrame])
      : Map[Long, Long] = {
    val dir = Files.createTempDirectory("er_in").toString
    val out = Files.createTempDirectory("er_out").toString + "/linked"
    val ckpt = Files.createTempDirectory("er_ckpt").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      s.coalesce(1).write.parquet(s"$dir/b$i")
    }
    val recs = EntityRes.records(spark, sfDir)
    val q = StreamingEntityRes.run(
      spark.readStream.schema(recs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      out, ckpt)
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(out).select(col("rec_id"), col("entity_id"))
      .as[(Long, Long)].collect().toMap
  }

  /** rec_id → batch cluster (er_entities ∪ own-id singletons). */
  private def batchClusters: Map[Long, Long] = {
    val labeled = graft.SparkEntry.queries("er_entities")(spark, sfDir)
      .select(col("rec_id"), col("entity_id"))
      .as[(Long, Long)].collect().toMap
    val all = EntityRes.records(spark, sfDir)
      .select(col("rec_id")).as[Long].collect()
    all.map(r => r -> labeled.getOrElse(r, r)).toMap
  }

  test("shuffled slicing: streamed entities refine the batch clusters") {
    val recs = EntityRes.records(spark, sfDir)
    val got = streamLink(
      (0 to 2).map(i => recs.filter(col("rec_id") % 3 === i)))
    val batch = batchClusters
    assert(got.size === 450)
    // every pair sharing a streamed entity shares a batch cluster —
    // grouped check: each streamed entity's members map to ONE cluster
    got.groupBy(_._2).foreach { case (ent, members) =>
      val clusters = members.keys.map(batch).toSet
      assert(clusters.size === 1,
        s"streamed entity $ent spans batch clusters $clusters")
    }
  }

  test("id-ordered replay links every non-5th customer's three variants") {
    val recs = EntityRes.records(spark, sfDir)
    val got = streamLink(
      (0 to 2).map(i => recs.filter(expr("rec_id div 150") === i)))
    val nCust = 150
    (0 until nCust).filter(_ % 5 != 0).foreach { k =>
      val ents = (0 to 2).map(v => got(k * 3L + v)).toSet
      assert(ents.size === 1, s"customer $k split into $ents")
    }
    // the every-5th customers' distance-2 web variant stays its own
    // entity (the threshold miss the batch family measures as FN)
    val fnSingles = (0 until nCust).filter(_ % 5 == 0)
      .count(k => got(k * 3L + 1) == k * 3L + 1)
    assert(fnSingles > 0)
  }

  test("scaled-key digit-threshold crossing (r15 task 6): streamed " +
      "assignments are stable, refinement holds vs the FIXED key, and " +
      "the batch scaled key is strictly finer past the crossing") {
    // synthetic corpus engineered around the clamp(2..6, digits of
    // n/150) formula: 7500 records → 2 digits, 15000 → 3 digits, so
    // batch 2 CROSSES the threshold. Names carry a 9-digit id suffix;
    // nation = id % 25, so (nation, last-k-digits) blocks are exact
    // residue classes.
    def recs(from: Long, until: Long) = spark.range(from, until)
      .select(col("id").as("rec_id"),
        concat(lit("customerx"), format_string("%09d", col("id")))
          .as("name"),
        (col("id") % 25).as("c_nationkey"),
        lit("SEG").as("seg"))
    val batch1 = recs(0, 7500)
    val full = recs(0, 15000)

    // the formula really crosses: 2 digits at 7500, 3 at 15000
    def digitsOf(df: org.apache.spark.sql.DataFrame): Long =
      graft.queries.EntityRes.scaledKeyed(df)
        .select(col("digits")).distinct().as[Long].collect().head
    assert(digitsOf(batch1) === 2L)
    assert(digitsOf(full) === 3L)

    // stream the two batches through the growing-index linker
    val idx1 = StreamingEntityRes.linkBatch(batch1,
      StreamingEntityRes.emptyIndex(spark)).localCheckpoint()
    val idx2 = StreamingEntityRes.linkBatch(recs(7500, 15000),
      idx1.select(col("rec_id"), col("norm"), col("bk"), col("entity_id")))
      .localCheckpoint()
    val assign1 = idx1.select(col("rec_id"), col("entity_id"))
      .as[(Long, Long)].collect().toMap
    val assign2 = idx2.select(col("rec_id"), col("entity_id"))
      .as[(Long, Long)].collect().toMap

    // (1) STABILITY: batch-1 assignments are by construction untouched
    // by later batches (append-only index) — and batch-2 rows only ever
    // adopt entities that already exist or mint their own, never force
    // a batch-1 rewrite
    assert(assign1.size === 7500 && assign2.size === 7500)
    assert(assign2.keySet.intersect(assign1.keySet).isEmpty)

    // (2) REFINEMENT vs the FIXED-key batch lineage at the full corpus:
    // every streamed entity's members sit in one fixed-key batch cluster
    val fixedPairs = graft.queries.EntityRes.scoredPairsOf(
        graft.queries.EntityRes.keyed(full))
      .filter(col("is_match") === 1)
      .select(col("rec_a").as("doc_a"), col("rec_b").as("doc_b"))
    val fixedClusters = graft.ops.Components.label(fixedPairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val streamed = assign1 ++ assign2
    streamed.groupBy(_._2).foreach { case (ent, members) =>
      val clusters = members.keys
        .map(r => fixedClusters.getOrElse(r, r)).toSet
      assert(clusters.size === 1,
        s"streamed entity $ent spans fixed-key batch clusters $clusters")
    }

    // (3) the WITNESS pair the crossing divides: ids 42 and 142 are at
    // name distance 1 and share (nation=17, last2=42) — the streamed
    // fixed key links them ...
    assert(streamed(42L) === streamed(142L),
      "fixed-key stream should link 42 and 142")
    // ... while the scaled key at the full corpus (3 digits → blocks
    // 042 vs 142) keeps them apart: the batch re-link is strictly finer
    // past the crossing, which is WHY an append-only index pins a
    // static key instead of chasing n_corpus
    val scaledPairs = graft.queries.EntityRes.scoredPairsOf(
        graft.queries.EntityRes.scaledKeyed(full))
      .filter(col("is_match") === 1)
      .select(col("rec_a").as("doc_a"), col("rec_b").as("doc_b"))
    val scaledClusters = graft.ops.Components.label(scaledPairs, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(scaledClusters.getOrElse(42L, 42L) !==
      scaledClusters.getOrElse(142L, 142L),
      "scaled-key batch clustering should separate 42 and 142 at 3 digits")
  }
}
