package graft.streaming

import graft.SparkSpec
import graft.queries.Dedup
import graft.text.TextOps
import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The streaming substring guard: incoming docs tested per-row against a
  * static duplicated-gram Bloom built from a reference corpus. Asserts
  * the three contracts: streamed flags ≡ the same transform run in batch
  * (stateless pure column ops), zero false negatives vs the EXACT
  * duplicated-hash join truth, and offset-invariance (a copied block is
  * caught at any position in the incoming doc).
  */
class StreamingSubstringGuardSpec extends SparkSpec {
  import spark.implicits._

  private val n = 5
  private val k = 3
  private val bits = 1 << 16
  private val blockToks = 20 // duplicated block length in tokens

  // 8-hex md5 token at (tag, pos); the shared block's tokens depend only
  // on pos, so any doc embedding positions 1..blockToks of the "shared"
  // stream carries the same verbatim token run
  private def tok(tag: Column, p: Column) =
    substring(md5(concat(tag, lit("|"), p.cast("string")).cast("binary")),
      1, 8)

  // reference corpus: 200 docs × 40 tokens; docs ≡ 3 (mod 10) embed the
  // shared block at positions 6..25 → its grams have doc-freq 20 ≥ 2
  private def reference = spark.range(200).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(1), lit(40)), p =>
      tok(when(col("id") % 10 === 3 && p.between(6, 5 + blockToks),
            lit("shared"))
          .otherwise(col("id").cast("string")),
        when(col("id") % 10 === 3 && p.between(6, 5 + blockToks), p - 5)
          .otherwise(p)))).as("text"))

  // incoming stream: 50 new docs (ids 10000+); ids ≡ 0 (mod 5) embed the
  // SAME block at a DIFFERENT position (11..30) — offset invariance
  private def incoming = spark.range(10000, 10050).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(1), lit(40)), p =>
      tok(when(col("id") % 5 === 0 && p.between(11, 10 + blockToks),
            lit("shared"))
          .otherwise(col("id").cast("string")),
        when(col("id") % 5 === 0 && p.between(11, 10 + blockToks), p - 10)
          .otherwise(p)))).as("text"))

  test("streamed gram-Bloom flags ≡ batch; no false negatives vs the " +
      "exact join; copied blocks caught at any offset") {
    val bloom = StreamingSubstringGuard.buildGramBloom(reference, n, k, bits)
    assert(bloom.length === bits / 64) // model-sized literal
    assert(bloom.exists(_ != 0L)) // the 16 block grams are in the filter

    val dir = Files.createTempDirectory("ssg_in").toString
    val ckpt = Files.createTempDirectory("ssg_ckpt").toString
    incoming.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    incoming.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val flaggedStream =
      StreamingSubstringGuard.flagged(stream, bloom, n, k, bits)
    assert(!flaggedStream.queryExecution.analyzed.toString
      .contains("EventTimeWatermark")) // stateless by construction
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Boolean)]
    val q = flaggedStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= batch.select(col("doc_id"), col("n_grams"),
            col("n_flagged"), col("might_dup"))
            .as[(Long, Long, Long, Boolean)].collect()
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = sink.toSet
    val batch = StreamingSubstringGuard.flagged(incoming, bloom, n, k, bits)
      .select(col("doc_id"), col("n_grams"), col("n_flagged"),
        col("might_dup"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch) // batch ≡ streaming, bit for bit

    // exact truth: docs whose gram hashes intersect the reference's
    // duplicated-hash set. Zero false negatives is the Bloom contract.
    val truth = incoming
      .select(col("doc_id"),
        explode(TextOps.posGramHashes64(TextOps.tokens(col("text")), n))
          .as("g"))
      .join(Dedup.substringDupHashes(reference, n),
        col("g.h") === col("h1"), "left_semi")
      .select(col("doc_id")).distinct().as[Long].collect().toSet
    assert(truth === (10000L until 10050L by 5).toSet) // planted ground truth
    val flaggedIds = streamed.filter(_._4).map(_._1)
    assert(truth.subsetOf(flaggedIds)) // no false negatives
    // at 16 inserted grams over 2^16 bits the FP odds are ~4e-10, so the
    // flag set should be exactly the truth set here
    assert(flaggedIds === truth)
    // in-block gram count: a 20-token block at width 5 → 16 flagged grams
    streamed.filter(_._4).foreach { case (_, nGrams, nFlagged, _) =>
      assert(nGrams === 36L && nFlagged === 16L)
    }
  }
}
