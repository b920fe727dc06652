package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** SURVEY §5 item 5: the windowed event-time lineage re-run under
  * Structured Streaming on the `events` FIXTURE table, asserting batch ≡
  * streaming for every window the watermark has closed.
  */
class StreamingEventsSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling-window aggregate: batch ≡ streaming on the events fixture") {
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .select("ts", "ems", "event_type").cache()

    // stream input: three time-ordered parquet chunks so the watermark
    // advances batch over batch (append mode finalizes nothing otherwise)
    val inDir = Files.createTempDirectory("ev_stream").toString
    val ckpt = Files.createTempDirectory("ev_ckpt").toString
    val Array(q1, q2) = events.stat
      .approxQuantile("ems", Array(0.33, 0.66), 0.001)
    events.filter(col("ems") <= q1.toLong)
      .coalesce(1).write.parquet(s"$inDir/b0")
    events.filter(col("ems") > q1.toLong && col("ems") <= q2.toLong)
      .coalesce(1).write.parquet(s"$inDir/b1")
    events.filter(col("ems") > q2.toLong)
      .coalesce(1).write.parquet(s"$inDir/b2")

    def windowed(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "15 seconds").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.end")).as("window_end"),
          col("event_type"), col("n"))

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$inDir/*")
    val q = windowed(stream.withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("ev_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_stream")
        .as[(Long, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val batch = windowed(events)
        .as[(Long, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed.nonEmpty)
      // every emitted window agrees with batch exactly
      streamed.foreach { case (k, n) =>
        assert(batch.get(k).contains(n), s"window $k: $n vs ${batch.get(k)}")
      }
      // completeness for every window strictly clear of the final
      // watermark boundary (final-window emission depends on whether a
      // trailing no-data microbatch fires — an implementation detail)
      val maxEms = events.agg(max("ems")).head().getLong(0)
      val mustHave = batch.filter { case ((end, _), _) => end <= maxEms - 15000 }
      mustHave.foreach { case (k, n) =>
        assert(streamed.get(k).contains(n), s"missing closed window $k")
      }
      assert(mustHave.nonEmpty)
    } finally {
      q.stop()
      events.unpersist()
    }
  }
}
