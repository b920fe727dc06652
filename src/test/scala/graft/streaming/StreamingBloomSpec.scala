package graft.streaming

import graft.SparkSpec
import graft.functions.BloomSketch
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming Bloom accumulation ≡ batch-built filter: the same keys fed
  * through micro-batches must produce bit-identical state, and re-ORing a
  * batch (the at-least-once replay case) must change nothing.
  */
class StreamingBloomSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val bits = 1 << 14

  test("two micro-batches accumulate the exact batch-built bitset") {
    val items = (0 until 400).map(i => s"key$i")
    val dir = Files.createTempDirectory("bloom_in").toString
    val ckpt = Files.createTempDirectory("bloom_ckpt").toString
    items.take(250).toDF("item").coalesce(1).write.parquet(s"$dir/b0")
    items.drop(250).toDF("item").coalesce(1).write.parquet(s"$dir/b1")

    val sb = new StreamingBloom(k, bits)
    var updates = 0
    val q = sb.build(
      spark.readStream.schema("item STRING")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      "item", _ => updates += 1)
    try q.processAllAvailable() finally q.stop()
    assert(updates >= 2) // one per non-empty micro-batch

    val bl = udaf(new BloomSketch(bits / 64))
    val batchFilter = items.toDF("item")
      .select(BloomSketch.positions(col("item"), k, bits).as("pos"))
      .agg(bl(col("pos"))).as[Seq[Long]].head()
    assert(sb.snapshot.toSeq === batchFilter)

    // no false negatives through the streamed filter
    val hits = items.toDF("item")
      .select(BloomSketch.mightContain(typedLit(sb.snapshot),
        col("item"), k, bits).as("hit"))
      .as[Boolean].collect()
    assert(hits.forall(identity))
  }

  test("replaying a batch is a no-op (at-least-once safety)") {
    val agg = new BloomSketch(4)
    val positions = Seq(Seq(0, 100, 200), Seq(5, 100, 250))
    val once = positions.foldLeft(agg.zero)(agg.reduce)
    val twice = (positions ++ positions).foldLeft(agg.zero)(agg.reduce)
    assert(once.toSeq === twice.toSeq)
  }
}
