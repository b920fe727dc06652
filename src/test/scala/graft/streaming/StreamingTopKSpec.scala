package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streamed per-window trending top-k ≡ the batch rank over the same
  * windows (on every window append mode actually emits).
  */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  test("streamed per-window top-3 equals batch on emitted windows") {
    val sfDir = "/root/testdata/sf0.001"
    // plant NULL event_type on a slice of rows: GROUP BY retains NULL
    // keys in both batch and streaming, and the parity check must cover
    // that group too
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")).as("event_type"),
        col("ts"))

    val dir = Files.createTempDirectory("topk_in").toString
    val ckpt = Files.createTempDirectory("topk_ckpt").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/b1")

    val streamed = StreamingTopK.windowedCounts(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"),
      "event_type", "ts", "15 seconds")
    val q = streamed.writeStream.format("memory").queryName("topk_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    val got = StreamingTopK.ranked(spark.table("topk_stream"),
        "event_type", 3)
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("rank"))
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap

    val want = StreamingTopK.ranked(
        events.groupBy(window(col("ts"), "15 seconds"), col("event_type"))
          .agg(count(lit(1)).as("n")),
        "event_type", 3)
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("rank"))
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap

    assert(want.nonEmpty && got.nonEmpty)
    // every emitted window's top-3 must match batch EXACTLY (counts,
    // membership, and rank order)
    got.foreach { case (ws, rows) =>
      assert(rows === want(ws), s"window $ws")
    }
    // the only windows allowed to be missing are those still open at the
    // final watermark (max event time − 10 s)
    val maxMs = events.agg(max(unix_millis(col("ts")))).head.getLong(0)
    (want.keySet -- got.keySet).foreach { ws =>
      assert((ws + 15L) * 1000L > maxMs - 10000L,
        s"closed window $ws was never emitted")
    }
  }
}
