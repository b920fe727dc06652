package graft.streaming

import graft.SparkSpec
import graft.queries.MultimodalQ
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming growing-index aligner's contracts against the batch
  * mm_video_neardup lineage:
  *
  *  - slicing-independent EQUALITY with the uncapped batch alignment —
  *    a pair is emitted exactly once, when its later recording arrives
  *    and both fingerprint sequences exist, so votes are batch votes
  *    (stronger than the ER linker's refinement: alignment evidence
  *    never depends on arrival order);
  *  - the index-side probe bound: a planted hot slate stops generating
  *    candidates once hot, twins still recover via their other frames;
  *  - replay idempotence: re-probing the same batch against the
  *    pre-batch index re-emits identical rows, and index recovery
  *    dedups frames so a replayed append cannot double votes.
  */
class StreamingVideoNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** The VideoNearDupSpec text generator (splitmix-style mixing — a
    * low-entropy progression collides dHashes across docs).
    */
  private def text(doc: Long, len: Int, slate: String = ""): String =
    slate + (0 until (len - slate.length)).map { i =>
      var x = doc * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
      x ^= (x >>> 31); x *= 0x94D049BB133111EBL; x ^= (x >>> 27)
      ('a' + java.lang.Math.floorMod(x, 26L).toInt).toChar
    }.mkString

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private type Pair = (Long, Long, Long, Long, Long)

  private def collectPairs(df: DataFrame): Set[Pair] =
    df.select("rec_a", "rec_b", "n_aligned", "best_offset",
      "containment_milli").as[Pair].collect().toSet

  /** Stream `slices` as one micro-batch each; returns the emitted pairs. */
  private def streamPairs(slices: Seq[DataFrame], maxDf: Long = 0L)
      : Set[Pair] = {
    val dir = Files.createTempDirectory("vnd_in").toString
    val out = Files.createTempDirectory("vnd_out").toString + "/pairs"
    val idx = Files.createTempDirectory("vnd_idx").toString + "/frames"
    val ckpt = Files.createTempDirectory("vnd_ckpt").toString
    slices.zipWithIndex.foreach { case (s, i) =>
      s.coalesce(1).write.parquet(s"$dir/b$i")
    }
    val q = StreamingVideoNearDup.run(
      spark.readStream
        .schema(slices.head.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      out, idx, ckpt, maxDf)
    try q.processAllAvailable() finally q.stop()
    collectPairs(spark.read.parquet(out))
  }

  test("any slicing emits exactly the uncapped batch alignment's pairs") {
    val docs = (0L until 24L).map(d => d -> text(d, 180 + 37 * d.toInt % 280))
    val batch = collectPairs(
      MultimodalQ.videoNearDup(spark, docsDf(docs), dfCap = Long.MaxValue))
    assert(batch.nonEmpty)
    // one big batch, round-robin thirds, and a shuffled 5-way slicing
    val all = docsDf(docs)
    val slicings = Seq(
      Seq(all),
      (0 to 2).map(i => all.filter(col("doc_id") % 3 === i)),
      (0 to 4).map(i => all.filter(abs(hash(col("doc_id"))) % 5 === i)))
    slicings.zipWithIndex.foreach { case (s, i) =>
      assert(streamPairs(s) === batch, s"slicing $i diverged from batch")
    }
  }

  test("probe bound: a hot slate stops generating candidates, twins survive") {
    // 30 docs share a 2-stride intro slate: frame 0 of every original is
    // one hash. Unbounded, the slate bucket alone contributes ~30·29/2
    // candidate recordings; with maxDf the probe skips it once hot.
    val slate = "same-intro-slate".padTo(2 * MultimodalQ.SceneStride, '_')
    val docs = docsDf((0L until 30L).map(d => d -> text(d, 260, slate)))
    val got = streamPairs(
      (0 to 5).map(i => docs.filter(col("doc_id") % 6 === i)),
      maxDf = MultimodalQ.VideoDfCap.toLong)
    // every planted twin recovers (its evidence is non-slate frames)
    val twins = got.filter { case (a, b, _, d, _) => b == a + 1 && d == 1L }
    assert(twins.size === 30, s"twins lost to the probe bound: ${twins.size}/30")
    // slate-only cross-doc pairs are bounded: once the slate hash is hot
    // (first ~maxDf recordings indexed), it generates nothing — far
    // below the unbounded ~30·29/2; alignment still requires ≥3 frames,
    // so with unique tails NO cross-doc pair can pass the gate at all
    val crossDoc = got.filter { case (a, b, _, _, _) => a / 2 != b / 2 }
    assert(crossDoc.isEmpty, s"slate-only pairs leaked: ${crossDoc.take(5)}")
  }

  test("replay idempotence: same batch + same pre-batch index → same rows") {
    val docs = (0L until 10L).map(d => d -> text(d, 300))
    val (first, second) = (docsDf(docs.take(5)), docsDf(docs.drop(5)))
    val f1 = MultimodalQ.videoFrames(spark, first)
      .select("rec_id", "nf", "frame", "h").localCheckpoint()
    val f2 = MultimodalQ.videoFrames(spark, second)
      .select("rec_id", "nf", "frame", "h").localCheckpoint()
    val idx = StreamingVideoNearDup.emptyIndex(spark).unionByName(f1)
    val once = collectPairs(StreamingVideoNearDup.pairsForBatch(f2, idx))
    val again = collectPairs(StreamingVideoNearDup.pairsForBatch(f2, idx))
    assert(once === again)
    assert(once.nonEmpty) // the second slice's own twins at least
    // a doubled frame append (crash between pair emit and checkpoint
    // commit) must not double votes after recovery-style dedup
    val doubled = idx.unionByName(f1).dropDuplicates("rec_id", "frame")
    assert(collectPairs(
      StreamingVideoNearDup.pairsForBatch(f2, doubled)) === once)
  }
}
