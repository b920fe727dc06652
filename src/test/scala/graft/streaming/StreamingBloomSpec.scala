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

  test("persisted filter survives a driver restart (checkpoint-safe)") {
    val items = (0 until 300).map(i => s"pkey$i")
    val dir = Files.createTempDirectory("bloom_p_in").toString
    val state = Files.createTempDirectory("bloom_p_state").toString + "/filter.bin"
    items.take(150).toDF("item").coalesce(1).write.parquet(s"$dir/b0")

    val sb1 = new StreamingBloom(k, bits, Some(state))
    val q1 = sb1.build(
      spark.readStream.schema("item STRING").parquet(s"$dir/*"), "item")
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = sb1.snapshot

    // "restart": a fresh instance (fresh JVM-equivalent) must reload the
    // persisted bitset, so keys the source will never replay stay member
    val sb2 = new StreamingBloom(k, bits, Some(state))
    assert(sb2.snapshot.toSeq === afterFirst.toSeq)

    // and continue accumulating on top of the reloaded state
    items.drop(150).toDF("item").coalesce(1).write.parquet(s"$dir/b1")
    val q2 = sb2.build(
      spark.readStream.schema("item STRING").parquet(s"$dir/*"), "item")
    try q2.processAllAvailable() finally q2.stop()

    val bl = udaf(new BloomSketch(bits / 64))
    val batchFilter = items.toDF("item")
      .select(BloomSketch.positions(col("item"), k, bits).as("pos"))
      .agg(bl(col("pos"))).as[Seq[Long]].head()
    assert(sb2.snapshot.toSeq === batchFilter)

    // a third instance sees the final persisted state without any query
    assert(new StreamingBloom(k, bits, Some(state)).snapshot.toSeq
      === batchFilter)
  }

  test("null keys are skipped, not a batch-killing NPE") {
    val dir = Files.createTempDirectory("bloom_n_in").toString
    Seq(Some("a"), None, Some("b"), None).toDF("item")
      .coalesce(1).write.parquet(s"$dir/b0")
    val sb = new StreamingBloom(k, bits)
    val q = sb.build(
      spark.readStream.schema("item STRING").parquet(s"$dir/*"), "item")
    try q.processAllAvailable() finally q.stop()
    val bl = udaf(new BloomSketch(bits / 64))
    val batchFilter = Seq("a", "b").toDF("item")
      .select(BloomSketch.positions(col("item"), k, bits).as("pos"))
      .agg(bl(col("pos"))).as[Seq[Long]].head()
    assert(sb.snapshot.toSeq === batchFilter)
  }

  test("replaying a batch is a no-op (at-least-once safety)") {
    val agg = new BloomSketch(4)
    val positions = Seq(Seq(0, 100, 200), Seq(5, 100, 250))
    val once = positions.foldLeft(agg.zero)(agg.reduce)
    val twice = (positions ++ positions).foldLeft(agg.zero)(agg.reduce)
    assert(once.toSeq === twice.toSeq)
  }
}
