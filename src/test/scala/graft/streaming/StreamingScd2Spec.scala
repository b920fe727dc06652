package graft.streaming

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Streaming SCD2 ≡ batch: the streamed CLOSED intervals over the events
  * fixture must equal ev_scd2's `is_current = false` rows exactly —
  * including n_events per interval — when the watermark has passed every
  * real event (a far-future sentinel event for a dummy user pushes it
  * there; the sentinel itself stays an open run and emits nothing).
  */
class StreamingScd2Spec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed closed intervals equal the batch is_current=false rows") {
    val real = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .localCheckpoint()
    val mid = real.agg(
      ((min(unix_millis(col("ts"))) + max(unix_millis(col("ts")))) / 2)
        .cast("long")).head.getLong(0)
    val sentinelTs = real.agg(max(unix_millis(col("ts")))).head.getLong(0) +
      86400000L
    val sentinel = Seq((-1L, new java.sql.Timestamp(sentinelTs),
      -1L, "sentinel")).toDF("user_id", "ts", "event_id", "event_type")

    val dir = Files.createTempDirectory("scd2_in").toString
    val ckpt = Files.createTempDirectory("scd2_ckpt").toString
    // time-split batches (no late data at 0s watermark delay), then the
    // sentinel batch that releases everything
    real.filter(unix_millis(col("ts")) <= mid).coalesce(1)
      .write.parquet(s"$dir/b0")
    real.filter(unix_millis(col("ts")) > mid).coalesce(1)
      .write.parquet(s"$dir/b1")
    sentinel.coalesce(1).write.parquet(s"$dir/b2")

    val streamed = StreamingScd2(
      spark.readStream.schema(real.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*"))
    val q = streamed.writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()

    val got = spark.table("scd2_stream")
      .select("user_id", "state", "valid_from", "valid_to", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val want = graft.SparkEntry.queries("ev_scd2")(spark, sfDir)
      .filter(!col("is_current"))
      .select("user_id", "state", "valid_from", "valid_to", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    assert(got.nonEmpty, "stream emitted no closed intervals")
    assert(got === want,
      s"streamed ${got.size} vs batch ${want.size}: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }
}
