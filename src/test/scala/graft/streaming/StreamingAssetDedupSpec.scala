package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming dHash asset dedup ≡ the sequential batch fold (novel +
  * index growth per micro-batch), including rejection of a clone whose
  * original was only admitted EARLIER IN THE SAME STREAM — the property
  * a static-index twin can't show.
  */
class StreamingAssetDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed admissions equal the sequential batch fold; index grows") {
    val assets = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("asset_id"), col("text").as("payload"))
    val index0 = StreamingAssetDedup.blockedIndex(
      assets.filter(col("asset_id") % 10 < 8)).localCheckpoint()

    // a payload guaranteed-new to the fixture (letters cycle, so its
    // sampled-char profile is nothing like the word-salad docs)
    val fresh = ("abcdefghij" * 10).take(96)
    val indexedClone = assets.filter(col("asset_id") === 4) // %10<8 → indexed
      .select((col("asset_id") + 1000000).as("asset_id"), col("payload"))
    val fresh2 = ("zyxwvutsrq" * 10).take(96)
    val batch0 = assets.filter(col("asset_id") % 10 >= 8)
      .filter(col("asset_id") % 20 >= 10) // half
      .unionByName(indexedClone)
      .unionByName(Seq((3000000L, fresh)).toDF("asset_id", "payload"))
    val batch1 = assets.filter(col("asset_id") % 10 >= 8)
      .filter(col("asset_id") % 20 < 10) // other half
      .unionByName(Seq((3000001L, fresh),
        // INTRA-batch clone pair: admission must not depend on the two
        // landing in one micro-batch — lower id wins, higher rejected
        (4000000L, fresh2), (4000001L, fresh2))
        .toDF("asset_id", "payload"))

    val dir = Files.createTempDirectory("sad_in").toString
    val out = Files.createTempDirectory("sad_out").toString + "/admitted"
    val ckpt = Files.createTempDirectory("sad_ckpt").toString
    batch0.coalesce(1).write.parquet(s"$dir/b0")
    batch1.coalesce(1).write.parquet(s"$dir/b1")

    val q = StreamingAssetDedup.run(
      spark.readStream.schema(batch0.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      index0, out, ckpt)
    try q.awaitTermination() finally q.stop()

    val got = spark.read.parquet(out).select(col("asset_id"))
      .as[Long].collect().toSet

    // sequential batch fold: same novel + index growth, batch at a time
    var idx = index0
    var want = Set.empty[Long]
    Seq(batch0, batch1).foreach { b =>
      val adm = StreamingAssetDedup.novel(b, idx).localCheckpoint()
      want ++= adm.select(col("asset_id")).as[Long].collect()
      idx = idx.unionByName(StreamingAssetDedup.blockedIndex(
        adm.select(col("asset_id"), col("payload")))).localCheckpoint()
    }
    assert(got === want)

    // planted behaviors: the indexed clone is rejected; the fresh payload
    // is admitted in batch 0 and its batch-1 clone rejected ONLY because
    // the index grew mid-stream
    assert(!got.contains(1000004L), "clone of an indexed asset admitted")
    assert(got.contains(3000000L), "fresh payload should be novel")
    assert(!got.contains(3000001L),
      "clone of a stream-admitted asset must be rejected by index growth")
    assert(got.contains(4000000L) && !got.contains(4000001L),
      "intra-batch clone pair: lower id admitted, higher rejected")
  }
}
