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
}
